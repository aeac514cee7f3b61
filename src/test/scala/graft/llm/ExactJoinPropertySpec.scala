package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized exactness: the scale-path similarity joins claim recall
  * 1.0 BY CONSTRUCTION — so on arbitrary corpora they must agree with
  * brute force exactly, not just on the planted fixtures. Small random
  * vocabularies force heavy overlap (the adversarial case for prefix
  * and signature schemes).
  */
class ExactJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomCorpus(seed: Int, n: Int, vocab: Int,
      minLen: Int, maxLen: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val len = minLen + rnd.nextInt(maxLen - minLen + 1)
      i.toLong -> Seq.fill(len)(s"w${rnd.nextInt(vocab)}").mkString(" ")
    }
  }

  test("ppjoin == brute force on 3 random corpora and 2 thresholds") {
    for (seed <- Seq(1, 2, 3); t <- Seq(0.5, 0.8)) {
      val docs = randomCorpus(seed, n = 120, vocab = 12,
        minLen = 4, maxLen = 30).toDF("doc_id", "text")
      val sh = docs.select(col("doc_id"),
        Dedup.hashedShingles(col("text")).as("sh"))
      val brute = sh.as("a").join(sh.as("b"),
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"),
          Dedup.jaccard(col("a.sh"), col("b.sh")).as("j"))
        .filter(col("j") >= t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = Dedup.jaccardJoinExact(docs, "doc_id", "text",
          threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(exact == brute,
        s"seed=$seed t=$t missing=${(brute -- exact).take(5)} " +
          s"extra=${(exact -- brute).take(5)}")
    }
  }

  test("fastss == brute levenshtein<=1 on random short strings") {
    for (seed <- Seq(5, 6)) {
      val rnd = new scala.util.Random(seed)
      val strs = (0 until 150).map { i =>
        i.toLong -> Seq.fill(3 + rnd.nextInt(6))(('a' + rnd.nextInt(4)).toChar)
          .mkString
      }
      val df = strs.toDF("id", "s")
      val brute = (for {
        (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
        if levenshteinScala(sa, sb) <= 1
      } yield (ia, ib)).toSet
      val fast = Dedup.editDistancePairs(df, "id", "s")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast == brute,
        s"seed=$seed missing=${(brute -- fast).take(5)} " +
          s"extra=${(fast -- brute).take(5)}")
    }
  }

  test("connected components == union-find on random graphs") {
    for (seed <- Seq(21, 22, 23)) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val edges = (0 until 70).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // reference union-find
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r)
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map { v =>
        // min vertex id in the component = canonical label
        val r = find(v)
        v.toLong -> (0 until n).filter(find(_) == r).min.toLong
      }.toMap
      val got = Dedup.connectedComponents(
          (0L until n.toLong).map(Tuple1(_)).toDF("id"), "id",
          edges.toDF("a", "b"), "a", "b", maxIter = 30)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$seed: CC != union-find")
    }
  }

  private def levenshteinScala(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("ivf exact == brute on a random corpus at every nprobe") {
    val rnd = new scala.util.Random(17)
    val vecs = (0L until 150L).map(i => i -> Seq.fill(6)(rnd.nextGaussian()))
    val df = vecs.toDF("id", "vec")
    val cents = Similarity.kmeansCentroids(df, "vec", "id", k = 5, iters = 2)
    val index = Similarity.ivfIndex(df, "vec", "id", cents).cache()
    val radii = Similarity.cellRadii(index, cents)
    val q = vecs(31)._2.toArray
    val brute = Similarity.topKBrute(df, "vec", "id", q, 8)
      .collect().map(_.getLong(0)).toSeq
    (1 to 5).foreach { np =>
      val got = Similarity.topKIvfExact(index, q, cents, radii,
          k = 8, nprobe = np)
        .collect().map(_.getLong(0)).toSeq
      assert(got == brute, s"nprobe=$np diverged")
    }
    index.unpersist()
  }
  test("decontamination == brute-force string n-gram overlap on random corpora") {
    for (seed <- Seq(7, 8)) {
      val rnd = new scala.util.Random(seed)
      def doc(): String = Seq.fill(6 + rnd.nextInt(20))(
        s"w${rnd.nextInt(10)}").mkString(" ")
      val corpus = (0 until 60).map(i => (i.toLong, doc()))
      val bench = (100 until 112).map(i => (i.toLong, doc()))
      def grams(s: String, k: Int): Set[String] = {
        val toks = s.split(" ").toSeq
        if (toks.length < k) Set(toks.mkString(" "))
        else toks.sliding(k).map(_.mkString(" ")).toSet
      }
      val benchSet = bench.flatMap(d => grams(d._2, 4)).toSet
      val expected = corpus.map { case (id, t) =>
        id -> grams(t, 4).count(benchSet.contains)
      }.filter(_._2 > 0).toMap
      val got = Decontaminate.contaminationReport(
          corpus.toDF("id", "text"), bench.toDF("id", "text"),
          "id", "text", k = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      assert(got == expected, s"seed $seed: $got vs $expected")
    }
  }

}
