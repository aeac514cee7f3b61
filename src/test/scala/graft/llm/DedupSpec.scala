package graft.llm

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep green forest to hide from hunters"
  private val nearDup = base.replace("lazy", "sleepy") // one-word change
  private val unrelated = "completely different content about database " +
    "query optimization with columnar storage and vectorized execution " +
    "engines processing analytical workloads at massive scale every day"

  private def docs = Seq(
    (1L, base), (2L, nearDup), (3L, unrelated), (4L, base) // 4 = exact dup of 1
  ).toDF("doc_id", "text")

  test("exact clusters group identical normalized content") {
    val out = Dedup.exactClusters(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((1L, 2L))) // cluster 1, two copies
    assert(out(4L) == ((1L, 2L)))
    assert(out(2L) == ((2L, 1L)))
    assert(out(3L) == ((3L, 1L)))
  }

  test("minhash LSH finds planted near-dup pair, skips unrelated") {
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text",
      threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"planted near-dup not found: $pairs")
    assert(pairs.contains((1L, 4L))) // exact dups are trivially near
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated doc matched: $pairs")
  }

  test("bands from hashed shingles are bit-identical to bandHashes") {
    // nearDupPairs/nearDupAgainst derive band keys FROM the persisted
    // hashed-shingle arrays; a drift between the two derivations would
    // silently change candidate recall. Edge rows included: empty
    // text (degenerate whole-text shingle), sub-k token count, null.
    val edge = Seq((1L, base), (2L, nearDup), (3L, unrelated),
      (4L, ""), (5L, "two words"), (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val both = edge.select(col("doc_id"),
      Dedup.bandHashes(col("text")).as("direct"),
      Dedup.minhashBandsFromHashesUdf(64, 16)(
        Dedup.hashedShingles(col("text"))).as("derived"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"band mismatch for doc ${r.getLong(0)}")
    }
  }

  test("prefix-filter exact join matches brute-force all-pairs") {
    // brute-force truth over the same hashed shingles
    val sh = docs.select(col("doc_id"),
      Dedup.hashedShingles(col("text")).as("sh"))
    val brute = sh.as("a").join(sh.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        Dedup.jaccard(col("a.sh"), col("b.sh")).as("j"))
      .filter(col("j") >= 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP)))
      .toMap
    val exact = Dedup.jaccardJoinExact(docs, "doc_id", "text",
      threshold = 0.5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP)))
      .toMap
    assert(exact == brute, s"exact=$exact brute=$brute")
    assert(exact.keySet == Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("prefix-filter exact join: empty result when nothing similar") {
    val solo = Seq((1L, base), (2L, unrelated)).toDF("doc_id", "text")
    assert(Dedup.jaccardJoinExact(solo, "doc_id", "text",
      threshold = 0.5).count() == 0)
  }

  test("jaccard verification bounds: identical=1, disjoint=0") {
    val df = Seq((base, base, unrelated)).toDF("a", "b", "c")
    val r = df.select(
      Dedup.jaccard(Dedup.shingles(col("a")), Dedup.shingles(col("b"))).as("same"),
      Dedup.jaccard(Dedup.shingles(col("a")), Dedup.shingles(col("c"))).as("diff"))
      .collect().head
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) < 0.05)
  }

  test("minhash clusters: near-dups share a cluster id") {
    val out = Dedup.minhashClusters(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(2L) && out(1L) == out(4L),
      s"near-dups not clustered: $out")
    assert(out(3L) != out(1L), s"unrelated merged: $out")
  }

  test("simhash: identical text => distance 0; near-dup within 12 bits") {
    val sigs = docs.select(col("doc_id"), Dedup.simhashCol(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(4L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(2L)) <= 12)
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) > 12)
  }

  test("simhash pairs via chunk pigeonhole find exact dup and near-dup") {
    // chunks=16 → guaranteed recall up to hamming 15 ≥ the 12 asked for
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text",
      chunks = 16, maxHamming = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)), s"exact dup missed: $pairs")
    assert(pairs.contains((1L, 2L)), s"near-dup missed: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash pairs: degenerate bucket capped by maxBucket, no blowup") {
    // 1000 identical docs → one piece value per chunk holds the whole
    // corpus; the guard must drop those buckets instead of expanding
    // ~500k pairs per chunk
    val many = spark.range(1000)
      .selectExpr("id AS doc_id", "'tiny doc' AS text")
    val out = Dedup.simhashPairs(many, "doc_id", "text", maxBucket = 100)
    assert(out.count() == 0L)
  }

  test("simhash pairs: parameter validation") {
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, "doc_id", "text", chunks = 3)
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, "doc_id", "text", chunks = 4, maxHamming = 4)
    }
    // non-integral id must fail loudly up front, not at analysis time
    val strIds = docs.withColumn("sid",
      org.apache.spark.sql.functions.col("doc_id").cast("string"))
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashPairs(strIds, "sid", "text")
    }
    assert(e.getMessage.contains("integral idCol"))
  }

  test("edit-distance pairs: substitution, insertion, deletion all found") {
    val names = Seq(
      (1L, "spark"), (2L, "spork"),   // substitution
      (3L, "sparkx"),                 // insertion vs 1
      (4L, "spak"),                   // deletion vs 1
      (5L, "flink"),                  // far from everything
      (6L, "spark")                   // exact dup of 1
    ).toDF("id", "name")
    val pairs = Dedup.editDistancePairs(names, "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) == 1)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) == 1)
    assert(pairs.contains((1L, 4L)) && pairs((1L, 4L)) == 1)
    assert(pairs.contains((1L, 6L)) && pairs((1L, 6L)) == 0)
    assert(!pairs.keys.exists(p => p._1 == 5L || p._2 == 5L),
      s"unrelated matched: $pairs")
  }

  test("connected components: chains collapse, singletons survive") {
    val vertices = (1L to 7L).map(Tuple1(_)).toDF("id")
    // chain 1-2-3-4 (diameter 3), pair 5-6, singleton 7
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("a", "b")
    val got = Dedup.connectedComponents(vertices, "id", edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).forall(got(_) == 1L), s"chain not collapsed: $got")
    assert(got(5L) == 5L && got(6L) == 5L)
    assert(got(7L) == 7L)
  }

  test("connected components: non-convergence raises, not silent partial") {
    val vertices = (1L to 4L).map(Tuple1(_)).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(vertices, "id", edges, "a", "b", maxIter = 1)
        .collect()
    }
  }

  test("shingles of short text degrade to whole-text shingle") {
    val df = Seq(Tuple1("two words")).toDF("t")
    val sh = df.select(Dedup.shingles(col("t"), 3)).collect()
      .head.getSeq[String](0)
    assert(sh == Seq("two words"))
  }
  test("portable minhash signature: slot = min md5(i|shingle), dup-invariant") {
    val df = Seq(
      (1L, "a b c d"),              // shingles {a b c, b c d}
      (2L, "a b c d"),              // byte-identical twin
      (3L, "completely different words here")
    ).toDF("doc_id", "text")
    val got = Dedup.minhashSignaturePortable(df, "doc_id", "text",
        numHashes = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def md5lo(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString.substring(16)
    }
    val expected = (0 until 4).map(i =>
      Seq("a b c", "b c d").map(sh => md5lo(s"$i|$sh")).min).mkString(",")
    assert(got(1L) == expected)
    // identical text -> identical signature; different text -> different
    assert(got(1L) == got(2L))
    assert(got(1L) != got(3L))
  }

  test("nearDupAgainst pairs incoming only against history") {
    // 1 & 2 are identical INCOMING docs; 3 is their historical twin;
    // 4 is unrelated history. Expect (1,3) and (2,3) — never (1,2).
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val history = Seq((3L, base), (4L, "unrelated words entirely here now"))
      .toDF("id", "text")
    val incoming = Seq((1L, base), (2L, base)).toDF("id", "text")
    val pairs = Dedup.nearDupAgainst(history, incoming, "id", "text")
      .select("id_in", "id_hist").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L), (2L, 3L)), pairs.toString)
  }

  test("editDistancePairs fails loudly when a bucket exceeds maxBucket") {
    val dupes = (1L to 12L).map(i => (i, "identical")).toDF("id", "name")
    val e = intercept[org.apache.spark.SparkException] {
      Dedup.editDistancePairs(dupes, "id", "name", maxBucket = 10).count()
    }
    assert(e.getMessage.contains("maxBucket") ||
      Option(e.getCause).exists(_.getMessage.contains("maxBucket")))
  }

  test("exactSubstringPairs: minLen boundary is exact, raw not normalized") {
    val rnd = new java.util.Random(3)
    def noise(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val shared50 = noise(50)   // planted verbatim block, exactly minLen
    val shared49 = noise(49)   // one short of the threshold
    val docs = Seq(
      (1L, noise(80) + shared50 + noise(80)),
      (2L, noise(60) + shared50 + noise(100)),
      (3L, noise(80) + shared49 + noise(80)),
      (4L, noise(60) + shared49 + noise(100)),
      // case differs inside the block: raw-exact must NOT match
      (5L, noise(70) + shared50.toUpperCase + noise(70)),
      (6L, noise(200)),          // unrelated
      (7L, shared50)             // doc IS the block (edge: len == minLen)
    ).toDF("doc_id", "text")
    val pairs = Dedup.exactSubstringPairs(docs, "doc_id", "text",
        minLen = 50, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 7L), (2L, 7L)), pairs.toString)
  }

  test("exactSubstringPairs: shared block shorter than doc overlap region") {
    // two docs sharing a 120-char block — multiple anchors, still one pair
    val rnd = new java.util.Random(9)
    def noise(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val block = noise(120)
    val docs = Seq(
      (10L, noise(40) + block + noise(40)),
      (20L, block + noise(90)),
      (30L, noise(55))           // shorter than minLen+k, no picks used
    ).toDF("doc_id", "text")
    val pairs = Dedup.exactSubstringPairs(docs, "doc_id", "text",
        minLen = 50, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 20L)), pairs.toString)
  }

}
