package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // Hand-placed 3-d vectors: two tight bundles around orthogonal axes
  // plus one isolated direction, so cluster membership and near-dup
  // pairs are knowable by inspection.
  private val vecs = Seq(
    (0L, Array(1.0, 0.0, 0.0)),      // bundle A
    (1L, Array(0.99, 0.1, 0.0)),     // near-dup of 0 (cos ≈ 0.995)
    (2L, Array(0.0, 1.0, 0.0)),      // bundle B
    (3L, Array(0.05, 0.99, 0.0)),    // near-dup of 2
    (4L, Array(0.0, 0.0, 1.0)),      // isolated
    (5L, Array(-1.0, 0.02, 0.0))     // anti-aligned with A: cos < 0
  ).toDF("vid", "vec")

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("seedMedoids picks the k md5-first ids deterministically") {
    val s1 = SemDedup.seedMedoids(vecs, "vec", "vid", 3).map(_._1).toSeq
    val s2 = SemDedup.seedMedoids(vecs, "vec", "vid", 3).map(_._1).toSeq
    assert(s1 == s2, s"non-deterministic seeds: $s1 vs $s2")
    // replicate the rule locally: order ids by md5 of their decimal form
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): String =
      md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expect = (0L to 5L).sortBy(h).take(3)
    assert(s1 == expect, s"got $s1 expected $expect")
  }

  test("assignment is argmax cosine over the seed set") {
    val seeds = SemDedup.seedMedoids(vecs, "vec", "vid", 3)
    val got = SemDedup.assignClusters(vecs, "vec", "vid", seeds)
      .select(col("id"), col("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = vecs.collect().map { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Double](1).toArray
      // first-wins on ties = lowest seed rank, matching the expression
      val best = seeds.maxBy { case (_, sv) => cos(v, sv) }
      // maxBy returns the FIRST maximal element in scala 2.13? It
      // returns the first encountered max only when using > strictly;
      // replicate explicitly to be safe:
      var bi = 0
      var bc = cos(v, seeds(0)._2)
      for (i <- 1 until seeds.length) {
        val c = cos(v, seeds(i)._2)
        if (c > bc) { bi = i; bc = c }
      }
      assert(seeds(bi)._1 == best._1 || bc == cos(v, best._2))
      id -> seeds(bi)._1
    }.toMap
    assert(got == local, s"got $got expected $local")
  }

  test("drop rule: a row dies iff a smaller-id in-cluster neighbor is >= t") {
    val t = 0.9
    val k = 2
    val seeds = SemDedup.seedMedoids(vecs, "vec", "vid", k)
    val assigned = SemDedup.assignClusters(vecs, "vec", "vid", seeds)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray,
        r.getLong(2)))
    val survivors = SemDedup.semanticDedup(vecs, "vec", "vid", k, t)
      .collect().map(_.getLong(0)).toSet
    for ((id, v, cl) <- assigned) {
      val hasEarlierDup = assigned.exists { case (id2, v2, cl2) =>
        cl2 == cl && id2 < id && cos(v2, v) >= t
      }
      assert(survivors.contains(id) == !hasEarlierDup,
        s"row $id: survivor=${survivors.contains(id)} dupExists=$hasEarlierDup")
    }
    // sanity: the planted pair (0,1) at cos≈0.995 exercises the rule —
    // if they landed in one cluster, 1 must be gone
    val cl = assigned.map(a => a._1 -> a._3).toMap
    if (cl(0L) == cl(1L)) assert(!survivors.contains(1L))
  }

  test("cluster labels carried through are seed IDs, not ranks") {
    val seeds = SemDedup.seedMedoids(vecs, "vec", "vid", 3)
    val clusters = SemDedup.semanticDedup(vecs, "vec", "vid", 3, 0.99)
      .select(col("cluster")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(clusters.subsetOf(seeds.map(_._1).toSet),
      s"clusters $clusters not drawn from seed ids ${seeds.map(_._1).toSet}")
  }
}
