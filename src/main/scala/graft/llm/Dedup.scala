package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline (north-star
  * surface). Four families:
  *
  *   - **exact**: hash-groupBy on the normalized-text fingerprint;
  *   - **MinHash + banded LSH**: shingle → minhash signature → band
  *     hashes → `groupBy(band)` — candidates meet only inside a bucket,
  *     so there is NO all-pairs join anywhere (the property that makes
  *     near-dedup feasible at 100 TB; a crossJoin would be O(n²));
  *   - **SimHash**: 64-bit signature, near-dup candidates via band
  *     rotation over bit chunks;
  *   - **n-gram Jaccard**: the exact verifier applied only to LSH
  *     candidates.
  *
  * MinHash signatures are pure Column expressions (lambda over
  * `sequence()` with `xxhash64` — codegen'd, one scan, no UDF). SimHash
  * uses one UDF (64 per-bit accumulators defeat expression form).
  */
object Dedup {

  // ------------------------------------------------------------ shingle

  /** Word k-shingles of the normalized text, distinct.
    *
    * NOTE: inlines the tokenization subtree, so `transform` re-evaluates
    * the regex split per shingle element — O(len²) per document. Fine
    * inside a one-row-at-a-time context; for corpus scans, stage the
    * token array through a projection and use [[shinglesOfTokens]].
    */
  def shingles(text: Column, k: Int = 3): Column =
    shinglesOfTokens(TextAnalysis.tokens(text), k)

  /** Same shingling over an already-materialized token-array column
    * (an attribute, not an expression subtree) — the lambda then costs
    * O(k) per element instead of re-running the split.
    */
  def shinglesOfTokens(toks: Column, k: Int = 3): Column =
    array_distinct(
      when(size(toks) < k, array(concat_ws(" ", toks)))
        .otherwise(
          transform(sequence(lit(1), size(toks) - lit(k - 1)),
            i => concat_ws(" ", slice(toks, i, lit(k))))))

  /** 64-bit-hashed shingle set, SORTED ascending: the form carried
    * through shuffles for Jaccard verification — ~8 bytes per shingle
    * instead of the string (hash collisions shift Jaccard by
    * ~2⁻⁶⁴·|set|, immaterial), and sortedness lets the native
    * [[graft.functions.JaccardSortedExpr]] verify candidates in one
    * merge pass with no intermediate arrays.
    *
    * One UDF pass (FNV-1a per shingle), tokenization in codegen
    * upstream — the same design forced on MinHash by interpreted
    * higher-order functions: the expression form
    * (`sort_array(transform(shingles(...), xxhash64))`) re-evaluates
    * the `split` and `slice` subtrees per shingle element, O(len²)
    * per document — measured ~10 s for 5 000 docs vs ~1 s for this
    * pass.
    */
  def hashedShingles(text: Column, k: Int = 3): Column =
    hashedShinglesUdf(k)(TextAnalysis.tokens(text))

  private[llm] def hashedShinglesUdf(k: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((tokensIn: Seq[String]) => {
      val tokens = if (tokensIn == null) Seq.empty[String] else tokensIn
      val it: Iterator[String] =
        if (tokens.length < k) Iterator(tokens.mkString(" "))
        else tokens.sliding(k).map(_.mkString(" "))
      val set = scala.collection.mutable.SortedSet.empty[Long]
      it.foreach(s => set += baseHash(s))
      set.toSeq
    })

  // ------------------------------------------------------------ minhash

  /** FNV-1a 64-bit base hash of a shingle — computed ONCE per shingle;
    * the MinHash family is derived from it by per-salt splitmix64
    * mixing, so an n-shingle row costs n byte-hashes + n·H mixes, not
    * n·H byte-hashes. Deterministic across JVMs.
    */
  private[llm] def baseHash(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    val bytes = s.getBytes("UTF-8")
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** splitmix64 of (base ^ salt-stretch) — the i-th hash function. */
  private[llm] def mix(base: Long, salt: Int): Long = {
    var z = base ^ (salt * 0x9e3779b97f4a7c15L)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private[llm] def saltedHash(s: String, salt: Int): Long = mix(baseHash(s), salt)

  /** One-pass MinHash band hashes as a single UDF: word k-shingles of
    * the token array → `numHashes` minhashes → `bands` band hashes.
    *
    * Deliberately a UDF, not nested higher-order-function expressions:
    * Catalyst's CollapseProject inlines an aliased signature column into
    * every band expression and lambda functions are interpreted, so the
    * expression form re-evaluates the full shingle×hash matrix once per
    * band — measured minutes per 500 rows. The UDF computes the matrix
    * exactly once per row; tokenization stays in codegen upstream.
    */
  def minhashBandsUdf(shingleK: Int, numHashes: Int, bands: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    udf((tokensIn: Seq[String]) => {
      // null text → null tokens; a dirty row must not fail the scan
      val tokens = if (tokensIn == null) Seq.empty[String] else tokensIn
      val shingleIt: Iterator[String] =
        if (tokens.length < shingleK) Iterator(tokens.mkString(" "))
        else tokens.sliding(shingleK).map(_.mkString(" "))
      val sig = Array.fill(numHashes)(Long.MaxValue)
      val seen = scala.collection.mutable.HashSet.empty[String]
      shingleIt.foreach { sh =>
        if (seen.add(sh)) {
          val base = baseHash(sh)
          var i = 0
          while (i < numHashes) {
            val h = mix(base, i)
            if (h < sig(i)) sig(i) = h
            i += 1
          }
        }
      }
      (0 until bands).map { b =>
        var h = 1125899906842597L
        var j = b * rowsPerBand
        while (j < (b + 1) * rowsPerBand) { h = h * 31 + sig(j); j += 1 }
        h ^ (b * 0x9e3779b97f4a7c15L) // band index in the key: bucket
                                      // collisions across bands don't mix
      }
    })
  }

  /** Band-hash column for a text column (tokens in codegen, one UDF). */
  def bandHashes(text: Column, shingleK: Int = 3, numHashes: Int = 64,
      bands: Int = 16): Column =
    minhashBandsUdf(shingleK, numHashes, bands)(TextAnalysis.tokens(text))

  /** [[minhashBandsUdf]] over an ALREADY-hashed distinct shingle array
    * (the [[hashedShingles]] column) — bit-identical band keys (same
    * per-shingle base hash, same splitmix mix family, same band
    * polynomial; the min-fold is insensitive to the two functions'
    * slightly different dedup carriers), for callers that materialize
    * the shingle frame anyway and must not re-tokenize the corpus to
    * band it.
    */
  private[llm] def minhashBandsFromHashesUdf(numHashes: Int, bands: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    udf((hashes: Seq[Long]) => {
      val hs = if (hashes == null) Seq.empty[Long] else hashes
      val sig = Array.fill(numHashes)(Long.MaxValue)
      hs.foreach { base =>
        var i = 0
        while (i < numHashes) {
          val h = mix(base, i)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      (0 until bands).map { b =>
        var h = 1125899906842597L
        var j = b * rowsPerBand
        while (j < (b + 1) * rowsPerBand) { h = h * 31 + sig(j); j += 1 }
        h ^ (b * 0x9e3779b97f4a7c15L)
      }
    })
  }

  /** Exact Jaccard similarity of two shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      greatest(size(array_union(a, b)), lit(1)).cast("double")

  /** Candidate near-dup pairs via banded LSH: explode band hashes,
    * self-join within (band index, band hash) buckets with `idA < idB`,
    * then verify candidates with exact Jaccard ≥ `threshold`.
    *
    * RECALL CONTRACT — approximate by design: a true pair surfaces
    * only if it collides in ≥1 band, P(candidate | j) = 1−(1−j^r)^b
    * with r = numHashes/bands. At the defaults (b=16, r=4) that is
    * ~0.988 AT a 0.7 threshold boundary and >0.9998 by j=0.8 — so a
    * large corpus WILL miss a few threshold-grazing pairs (sf1:
    * 4 of 247,945, all at j≤0.78 where the S-curve predicts them),
    * while precision is exact (every
    * emitted pair is verified). More bands buy recall linearly in
    * signature cost; EXACTNESS is bought with [[jaccardJoinExact]]
    * (the PPJoin prefix-filter twin) — the same relationship as
    * `sim_neardup_lsh` vs `sim_neardup_exact`.
    *
    * Scale shape: the only shuffle is the groupBy on band hash; bucket
    * sizes are bounded by collision rate, not corpus size. The join
    * inside a bucket is an equi-join on the bucket key — Spark plans a
    * shuffle hash join keyed by (band, hash), never a cartesian over the
    * corpus. Exact duplicates (which can form huge buckets) should be
    * removed with `exactClusters` FIRST; `maxBucket` guards against
    * degenerate buckets turning quadratic.
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, maxBucket: Int = 1000): DataFrame = {
    // Candidate generation runs over SLIM (id, band) rows only. Payloads
    // (shingle arrays) must never be SELECTED next to the explode:
    // Catalyst places per-row expressions ABOVE a Generate, so a shingle
    // column projected alongside explode(bands) is recomputed once per
    // band (16×), and the candidate join would shuffle/broadcast the
    // arrays — measured 60-120 s vs ~8 s for this shape at 5k docs.
    // The shingle frame itself persists ONCE (8 B hashes, no text) and
    // feeds all three consumers: band derivation (the band keys are a
    // pure function of the same per-shingle base hashes —
    // minhashBandsFromHashesUdf is bit-identical to bandHashes) and the
    // two verification join-backs. One corpus scan + one shingle pass,
    // where the text form paid three of each. Handle unreferenced after
    // materialization; ContextCleaner reclaims the blocks.
    val sh = df.select(col(idCol).as("id"),
      hashedShingles(col(textCol), shingleK).as("sh"))
      .persist()
    val bandRows = sh.select(
      col("id"),
      explode(minhashBandsFromHashesUdf(numHashes, bands)(col("sh")))
        .as("band"))
    // ONE banding pass + ONE shuffle: bucket members gather via
    // collect_list (bounded by maxBucket) and in-bucket pairs are
    // emitted directly — the self-join formulation recomputes the
    // banding expression once per join side plus once for the bucket
    // counts (3×)
    val pairsOf = udf((ids: Seq[Long]) => {
      val sorted = ids.sorted
      for {
        i <- sorted.indices
        j <- (i + 1) until sorted.length
      } yield (sorted(i), sorted(j))
    })
    val candidates = withBucketMetrics(
      bandRows
        .groupBy(col("band")).agg(collect_list(col("id")).as("ids")),
      size(col("ids")), maxBucket)
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(pairsOf(col("ids"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"))
      .distinct() // a pair may share several bands; verify once
    // hashed shingles (8 B each) joined onto the small candidate list
    // from the SAME persisted frame the banding read
    candidates
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.GraftFunctions
          .jaccardSorted(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** INCREMENTAL near-dup — incoming batch vs historical corpus (the
    * nightly-ingest dedup: "is tonight's crawl already in the lake?").
    * Same MinHash banding as [[nearDupPairs]] but the candidate join is
    * ASYMMETRIC: incoming band rows equi-join the history's per-band
    * member lists, so the work is O(|incoming| · bands) probe rows
    * against a corpus-sized but SLIM (band → ids) table — the corpus
    * text is never rescanned against itself, which is what makes
    * nightly dedup affordable when |incoming| ≪ |history|. At scale
    * the grouped history band table is the persistent artifact: build
    * it once, append each night's accepted bands to it.
    *
    * Returns (id_in, id_hist, jaccard ≥ threshold) verified on hashed
    * shingles. History buckets above `maxBucket` are dropped (surfaced
    * via `observe` metrics, same contract as [[nearDupPairs]]) — and
    * the same banding RECALL contract applies: P(candidate | j) =
    * 1−(1−j^r)^b, so threshold-grazing pairs can miss (sf1 sample: 1
    * of 9,954, in the S-curve's predicted band); precision is exact.
    */
  def nearDupAgainst(history: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, maxBucket: Int = 1000): DataFrame = {
    // each side's shingle frame persists once and feeds both its band
    // derivation and its verification join-back (the nearDupPairs
    // one-scan-one-shingle-pass discipline; bands are bit-identical
    // to bandHashes via minhashBandsFromHashesUdf)
    val shH = history.select(col(idCol).as("id_hist"),
      hashedShingles(col(textCol), shingleK).as("sh_h"))
      .persist()
    val shI = incoming.select(col(idCol).as("id_in"),
      hashedShingles(col(textCol), shingleK).as("sh_i"))
      .persist()
    val hBands = shH.select(col("id_hist"),
      explode(minhashBandsFromHashesUdf(numHashes, bands)(col("sh_h")))
        .as("band"))
    val iBands = shI.select(col("id_in"),
      explode(minhashBandsFromHashesUdf(numHashes, bands)(col("sh_i")))
        .as("band"))
    val hGrouped = withBucketMetrics(
      hBands.groupBy(col("band")).agg(collect_list(col("id_hist")).as("ids")),
      size(col("ids")), maxBucket)
      .filter(size(col("ids")) <= maxBucket)
    // explode the capped buckets back to slim rows BEFORE the join:
    // joining onto the array frame copies the whole member list onto
    // every incoming band row before exploding (bucketWidth × 8 B of
    // array duplication per hit — the similarityJoinMultiProbe ×30
    // lesson); exploded rows keep the maxBucket cap and join emits
    // each candidate as one slim row
    val hRows = hGrouped.select(col("band"),
      explode(col("ids")).as("id_hist"))
    val candidates = iBands.join(hRows, Seq("band"))
      .select(col("id_in"), col("id_hist"))
      .distinct() // a pair may share several bands; verify once
    candidates
      .join(shI, Seq("id_in"))
      .join(shH, Seq("id_hist"))
      .select(col("id_in"), col("id_hist"),
        graft.functions.GraftFunctions
          .jaccardSorted(col("sh_i"), col("sh_h")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** EXACT n-gram-Jaccard similarity join via prefix filtering (the
    * AllPairs/PPJoin family: Bayardo et al., WWW'07; Xiao et al.,
    * WWW'08). Unlike [[nearDupPairs]] (probabilistic recall from the
    * MinHash S-curve), this returns EVERY pair with Jaccard ≥
    * `threshold` — the verifier of record when recall must be 1.0.
    *
    * Prefix-filter principle: fix ANY global total order on tokens;
    * if J(a,b) ≥ t then the first `|S| − ⌈t·|S|⌉ + 1` tokens of each
    * set (in that order) must intersect. Ordering tokens rarest-first
    * makes prefix tokens the LOW-document-frequency ones, so the
    * inverted-index buckets stay near output size instead of
    * corpus size — that is what makes an exact join feasible at scale.
    *
    * Shuffle ledger (all keyed, no cartesian, ONE pass over the text):
    * (1) window-count by token for document frequency — the same
    * one-scan trick as [[minhashClusters]]; a groupBy+join form was
    * measured planning 12 parquet scans via duplicated self-join
    * lineage, this shape plans 3 — (2) per-doc rebuild keyed by id,
    * (3) prefix-token groupBy with in-bucket pair expansion (the
    * Jaccard length filter `t·max ≤ min` applied before a pair is
    * emitted; bucket memory is O(df·16 B)),
    * (4) the PPJoin POSITION filter on the slim candidate rows: both
    * arrays carry the same global order, so a pair's first shared
    * token has the minimal (posA, posB) over its emissions, total
    * overlap is ≤ `min(szA−posA, szB−posB)+1`, and J ≥ t needs
    * overlap ≥ t·(szA+szB)/(1+t) — pairs sharing only a LATE prefix
    * token are pruned while still 32 B rows, before any array joins,
    * (5) verification joins of the 8 B/shingle hashed arrays onto the
    * surviving candidates only. The (id, shingles) frame PERSISTS for
    * its three consumers (an index build, like any similarity join),
    * so the corpus is scanned and shingled once, not three times.
    * Worst case is output-bound: an
    * all-identical corpus yields O(n²) candidates because the ANSWER
    * is O(n²) — the exactness contract, not a defect (use
    * [[nearDupPairs]] + `exactClusters` when approximate recall is
    * acceptable).
    *
    * Requires an integral `idCol` (the in-bucket expansion carries
    * (id, set-size) as (Long, Int)); hash or rank string ids first.
    */
  def jaccardJoinExact(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, threshold: Double = 0.7): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    val idType = df.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(idType.typeName),
      s"jaccardJoinExact requires an integral idCol (widened to long); " +
        s"'$idCol' is ${idType.simpleString}. Hash or rank string ids first.")
    // persisted: THREE consumers read the shingled frame (the prefix
    // explode plus the two payload join-backs onto the deduped pair
    // list) — unpersisted, each re-runs the corpus scan AND the
    // per-doc shingle+hash UDF. Rows are (id, hash array): the text
    // payload never enters the cache, and MEMORY_AND_DISK spills at
    // scale where re-shingling would burn CPU over the whole corpus.
    // The handle goes unreferenced once the caller materializes the
    // pair frame; the ContextCleaner reclaims the blocks.
    val docs = df.select(col(idCol).as("id"),
      hashedShingles(col(textCol), shingleK).as("sh"))
      .persist()
    val toks = docs.select(col("id"), explode(col("sh")).as("tok"))
    // global document frequency = the total order (rare first, hash
    // value tie-break makes it deterministic); window-count computes it
    // on the SAME exploded frame — no second scan, no freq join
    val withDf = toks.withColumn("df", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("tok"))))
    val ordered = withDf
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok"))))
        .as("ord"))
      .select(col("id"),
        transform(col("ord"), x => x("tok")).as("rare_first"),
        size(col("ord")).as("sz"))
    val prefixLen = (col("sz")
      - ceil(col("sz") * lit(threshold)).cast("int") + lit(1))
    val prefixes = ordered.select(
      col("id").cast("long").as("id"), col("sz"),
      posexplode(slice(col("rare_first"), lit(1), prefixLen))
        .as(Seq("pos", "tok")))
    // in-bucket pair expansion with the length filter (J ≥ t ⇒
    // min(|a|,|b|) ≥ t·max(|a|,|b|)) applied before a pair is emitted;
    // members carry (id, sz, pos) so the position filter can run on
    // the emitted 32 B rows
    val pairsOf = udf((members: Seq[(Long, Int, Int)]) => {
      val sorted = members.sortBy(_._1)
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Int, Int, Int, Int)]
      var i = 0
      while (i < sorted.length) {
        var j = i + 1
        while (j < sorted.length) {
          val minSz = math.min(sorted(i)._2, sorted(j)._2).toDouble
          val maxSz = math.max(sorted(i)._2, sorted(j)._2).toDouble
          if (sorted(i)._1 != sorted(j)._1 && minSz >= threshold * maxSz)
            out += ((sorted(i)._1, sorted(j)._1, sorted(i)._2, sorted(j)._2,
              sorted(i)._3, sorted(j)._3))
          j += 1
        }
        i += 1
      }
      out.toSeq
    })
    val candidates = prefixes
      .groupBy(col("tok"))
      .agg(collect_list(struct(col("id").as("_1"), col("sz").as("_2"),
        col("pos").as("_3"))).as("members"))
      .filter(size(col("members")) >= 2)
      .select(explode(pairsOf(col("members"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"),
        col("p._3").as("sz_a"), col("p._4").as("sz_b"),
        col("p._5").as("pos_a"), col("p._6").as("pos_b"))
      // position filter at the pair's FIRST shared token (= min pos in
      // both arrays, since they share one global order): overlap can't
      // exceed what remains after it
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("pos_a")).as("pa"), min(col("pos_b")).as("pb"),
        first(col("sz_a")).as("sa"), first(col("sz_b")).as("sb"))
      .filter((least(col("sa") - lit(1) - col("pa"),
          col("sb") - lit(1) - col("pb")) + lit(1)).cast("double") + lit(1e-9)
        >= lit(threshold / (1.0 + threshold)) * (col("sa") + col("sb")))
      .select(col("id_a"), col("id_b"))
    candidates
      .join(docs.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(docs.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.GraftFunctions
          .jaccardSorted(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** One-pass near-dup clustering: every doc labeled by the minimum doc
    * id sharing any LSH band with it (single groupBy + min, no
    * iteration). This is a conservative approximation of connected
    * components — chains longer than one hop keep distinct labels; for
    * dedup survivorship that under-merges, never over-merges beyond a
    * shared band.
    */
  def minhashClusters(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val exploded = df.select(
      col(idCol).as("id"),
      explode(bandHashes(col(textCol), shingleK, numHashes, bands))
        .as("band"))
    // window-min instead of groupBy+self-join: ONE scan of the input
    // (the join form re-reads and re-hashes everything a second time)
    exploded
      .withColumn("band_min", min(col("id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"))))
      .groupBy(col("id"))
      .agg(min(col("band_min")).as("cluster_id"))
  }

  /** One-hop LSH clustering in the PORTABLE md5 hash family: the band
    * keys are slices of [[minhashSignaturePortable]]'s signature, so a
    * DuckDB oracle can reproduce the ENTIRE pipeline — shingling,
    * per-slot min, banding, bucket-min labeling — byte-for-byte. Same
    * labeling semantics as [[minhashClusters]] (min doc id sharing any
    * band; under-merges chains, never over-merges beyond a shared
    * band) and the same one-scan window-min shape; only the hash
    * family differs. Use this when cross-engine reproducibility of
    * cluster ids matters (e.g. incremental dedup against an index
    * built by another engine); [[minhashClusters]]' splitmix family is
    * faster per hash when the ids stay engine-private.
    */
  def minhashClustersPortable(df: DataFrame, idCol: String,
      textCol: String, numHashes: Int = 8, bands: Int = 4,
      shingleK: Int = 3): DataFrame =
    bandKeysPortable(df, idCol, textCol, numHashes, bands, shingleK)
      .withColumn("band_min", min(col("id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"))))
      .groupBy(col("id"))
      .agg(min(col("band_min")).as("cluster_id"))

  /** The portable (id, band) LSH bucket keys of
    * [[minhashClustersPortable]], exposed on their own: band `b` of a
    * document is `"b|slot[b·r]|…|slot[(b+1)·r−1]"` over the md5
    * signature's slots (r = numHashes/bands). This is the artifact a
    * persistent dedup SIGNATURE STORE holds — two documents are
    * near-dup candidates iff they share a band key, so an incremental
    * or streaming consumer can test arriving documents against stored
    * keys without recomputing history
    * ([[graft.streaming.Streams]]' streaming dedup). Slim rows:
    * bands × (id, ~50 B key) per document.
    */
  def bandKeysPortable(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8, bands: Int = 4, shingleK: Int = 3): DataFrame = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    val rowsPerBand = numHashes / bands
    val slots = split(col("sig"), ",")
    val bandKeys = (0 until bands).map { b =>
      concat_ws("|",
        (lit(b.toString) +: (0 until rowsPerBand).map(r =>
          slots.getItem(b * rowsPerBand + r))): _*)
    }
    minhashSignaturePortable(df, idCol, textCol, numHashes, shingleK)
      .select(col("id"), explode(array(bandKeys: _*)).as("band"))
  }

  /** MinHash signature in a PORTABLE hash family: slot `i` of the
    * signature is `min over shingles of md5(i + "|" + shingle)`
    * (low 64 hex bits) — any engine with md5 reproduces it
    * byte-for-byte, which is what makes the minhash COMPUTATION
    * itself cross-engine checkable (the splitmix family used by
    * [[minhashClusters]]/[[bandHashes]] is faster per hash but
    * engine-private). Collision behavior is the same Pr[min match] =
    * Jaccard estimator; md5's cost is paid once per (shingle, slot)
    * at index-build time, and the signature — numHashes×16 hex chars
    * per document — is the artifact a 100 TB dedup would persist.
    *
    * Shape: one explode of the distinct shingle set, then numHashes
    * independent `min` aggregates over the SAME exploded frame — a
    * single scan with map-side partial mins, shuffling one slim
    * (id, numHashes×16 B) row per document.
    */
  def minhashSignaturePortable(df: DataFrame, idCol: String,
      textCol: String, numHashes: Int = 8, shingleK: Int = 3): DataFrame = {
    require(numHashes > 0, s"numHashes must be positive, got $numHashes")
    // stage tokens as an attribute BEFORE shingling: the inline form
    // re-evaluates the regex split per shingle element (O(len²)/doc —
    // measured 4.3 s vs ~0.6 s on the sf0.1 corpus)
    val exploded = df
      .select(col(idCol).as("id"),
        graft.llm.TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("id"),
        explode(shinglesOfTokens(col("toks"), shingleK)).as("sh"))
    val mins = (0 until numHashes).map(i =>
      min(substring(md5(concat_ws("|", lit(i.toString), col("sh"))), 17, 16))
        .as(s"h$i"))
    exploded.groupBy(col("id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("id"),
        concat_ws(",", (0 until numHashes).map(i => col(s"h$i")): _*)
          .as("sig"))
  }

  /** EXACT edit-distance-≤1 similarity join via the deletion
    * neighborhood (the FastSS scheme): every string signatures to
    * itself plus each single-character deletion; any two strings
    * within one edit (substitution, insertion, or deletion) provably
    * share a signature, so grouping by signature hash finds ALL
    * qualifying pairs with no all-pairs join — the fuzzy-matching
    * member of the dedup family (entity keys, near-identical titles).
    *
    * Scale shape mirrors [[simhashPairs]]: signatures are 8 B hashes
    * (never the substrings), ONE shuffle keyed by signature, bucket
    * members gathered via collect_list under `maxBucket` (bucket size
    * tracks the true neighbor count, not corpus size), candidates
    * deduped as 16 B pairs, then the builtin codegen'd `levenshtein`
    * verifies — hash collisions only ever ADD candidates, which
    * verification removes.
    *
    * A signature bucket larger than `maxBucket` means >maxBucket
    * near-identical strings share one deletion signature; silently
    * dropping it would break the recall-1.0 contract, so the job FAILS
    * LOUDLY instead (mirroring `connectedComponents`' non-convergence
    * throw) with instructions to raise `maxBucket` or pre-dedup exact
    * duplicates.
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      maxBucket: Int = 1000): DataFrame = {
    val idType = df.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(idType.typeName),
      s"editDistancePairs requires an integral idCol; '$idCol' is " +
        s"${idType.simpleString}. Hash or rank string ids first.")
    val sigsOf = udf((s: String) =>
      if (s == null) Seq.empty[Long]
      else {
        val out = new Array[Long](s.length + 1)
        out(0) = baseHash(s)
        var i = 0
        while (i < s.length) {
          out(i + 1) = baseHash(s.substring(0, i) + s.substring(i + 1))
          i += 1
        }
        out.toSeq.distinct
      })
    val exploded = df.select(col(idCol).cast("long").as("id"),
        explode(sigsOf(col(strCol))).as("sig"))
    val pairsOf = udf((ids: Seq[Long]) => {
      val sorted = ids.distinct.sorted
      if (sorted.length > maxBucket)
        throw new IllegalStateException(
          s"editDistancePairs: a deletion-signature bucket holds " +
            s"${sorted.length} ids (> maxBucket=$maxBucket). Dropping it " +
            "would silently break the exact-recall contract; raise " +
            "maxBucket or exact-dedup the strings first.")
      for {
        i <- sorted.indices
        j <- (i + 1) until sorted.length
      } yield (sorted(i), sorted(j))
    })
    val candidates = withBucketMetrics(
      exploded.groupBy(col("sig"))
        .agg(collect_list(col("id")).as("ids")),
      size(col("ids")), maxBucket)
      .filter(size(col("ids")) >= 2)
      .select(explode(pairsOf(col("ids"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"))
      .distinct()
    val names = df.select(col(idCol).cast("long").as("id"),
      col(strCol).as("s"))
    candidates
      .join(names.select(col("id").as("id_a"), col("s").as("s_a")), Seq("id_a"))
      .join(names.select(col("id").as("id_b"), col("s").as("s_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b")).as("edit_dist"))
      .filter(col("edit_dist") <= 1)
  }

  /** TRUE connected components over a pair list (vs
    * [[minhashClusters]]' deliberate one-hop approximation): iterative
    * min-label propagation — each round, every vertex takes the
    * minimum label among itself and its neighbors; converges in
    * O(graph diameter) rounds, which for near-dup clusters is small
    * (they are dense families, not long chains). Each round is one
    * keyed join + aggregate; each round's labels are eagerly
    * materialized with lineage truncated ([[Checkpointing]]) — persist
    * alone truncates only execution, so the plan tree (and any
    * explain/AQE log of it) would still grow by one full round per
    * iteration and OOM the driver after ~10 rounds (the classic
    * iterative-algorithm trap). On a real cluster set `checkpointDir`
    * (or the `spark.graft.checkpointDir` session conf) to switch the
    * rounds to RELIABLE checkpoints: localCheckpoint blocks die with
    * their executor, which on a multi-hour 100 TB job turns one lost
    * executor into a dead fixpoint. The loop shape is identical either
    * way (CheckpointingSpec pins label equality).
    * Non-convergence inside `maxIter` throws loudly rather than
    * returning a silently-partial clustering.
    *
    * The loop runs over the NON-ISOLATED subgraph only: a vertex with
    * no edges keeps `label = id` forever, so iterating it is pure
    * waste — and in a dedup graph isolated vertices are the vast
    * majority (most documents are unique). At 100 TB this is the
    * difference between shuffling the corpus' id set every round and
    * shuffling only the near-dup families; isolated vertices union
    * back in at the end with zero jobs.
    */
  def connectedComponents(vertices: DataFrame, idCol: String,
      edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20,
      broadcastThreshold: Long = 4000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    require(broadcastThreshold >= 0 && broadcastThreshold < Int.MaxValue,
      s"broadcastThreshold must be in [0, Int.MaxValue), got " +
        s"$broadcastThreshold (0 = always use the distributed layout)")
    val materialize =
      Checkpointing.materializer(vertices.sparkSession, checkpointDir)
    // materialize the adjacency ONCE: every round joins against it, and
    // an unpersisted edge list would re-run its whole upstream pipeline
    // (e.g. the exact-Jaccard join) once per round
    val adj = edges
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .union(edges
        .select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .persist()
    adj.count()
    val allIds = vertices.select(col(idCol).cast("long").as("id"))
    val nonIsolated = allIds
      .join(adj.select(col("src").as("id")), Seq("id"), "left_semi")
    // Dual layout (the graph_pagerank pattern): when the NON-ISOLATED
    // vertex set is bounded (≤ broadcastThreshold, 8 B/id = 32 MB at
    // the default), the min-label loop runs on dense primitive arrays
    // — labels broadcast per round, edges packed once into
    // per-partition index pairs, one shuffle-free mapPartitions +
    // treeReduce(min) job per round. The DataFrame loop below pays
    // ~0.5 s/round of join+checkpoint plan fixed cost at ANY size;
    // the dense loop pays ~50 ms. Above the threshold the keyed-join
    // loop IS the scale path and runs unchanged. The mode probe is ONE
    // limit-capped collect (the labelPropagation idiom: threshold+1
    // rows fetched at most) that doubles as the dense path's id fetch
    // — the old materialize + count + collect triple was three jobs
    // for the same decision.
    val probe = nonIsolated.select(col("id"))
      .limit(broadcastThreshold.toInt + 1).collect()
    if (probe.isEmpty) {
      // no edges at all: every vertex is its own singleton component —
      // no loop to run in either layout
      adj.unpersist()
      return allIds.select(col("id"), col("id").as("component"))
    }
    if (probe.length <= broadcastThreshold) {
      val components = ccBroadcast(adj, probe.map(_.getLong(0)), maxIter)
        .select(col("id"), col("label").as("component"))
      adj.unpersist()
      val isolated = allIds
        .join(components.select(col("id")), Seq("id"), "left_anti")
        .select(col("id"), col("id").as("component"))
      return components.union(isolated)
    }
    var labels = materialize(
      nonIsolated.select(col("id"), col("id").as("label")))
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val nbrMin = adj
        .join(labels.select(col("id").as("src"), col("label").as("nl")),
          Seq("src"))
        .groupBy(col("dst"))
        .agg(min(col("nl")).as("nbr_min"))
        .select(col("dst").as("id"), col("nbr_min"))
      // one join per round: carry old and new labels side by side so
      // convergence detection needs no second join; eager checkpoint
      // materializes the round and resets the plan to a leaf scan
      val joined = materialize(labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nbr_min"), col("label")))
            .as("label")))
      changed = joined.filter(col("label") =!= col("old_label")).count()
      labels = joined.select(col("id"), col("label"))
      it += 1
    }
    adj.unpersist() // final labels are materialized; adj no longer needed
    if (changed > 0) {
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "graph diameter exceeds the bound; raise maxIter")
    }
    // Isolated vertices re-enter as their own singleton components.
    // Anti-join against the CHECKPOINTED labels (a leaf scan), not
    // against adj: adj is unpersisted by now, and a lineage reference
    // to it would re-run the whole upstream edge pipeline (e.g. the
    // exact-Jaccard join) when the caller executes the result.
    val components = labels.select(col("id"), col("label").as("component"))
    val isolated = allIds
      .join(components.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    components.union(isolated)
  }

  /** Bounded-vertex-state connected components: ids as a sorted
    * primitive long array, edges packed ONCE into per-partition dense
    * (srcIdx<<32|dstIdx) pairs via binary search, then each min-label
    * round is one shuffle-free `mapPartitions` + elementwise-min
    * `treeReduce` over a per-round labels broadcast — no joins, no
    * checkpoints, no plan rebuild. Same semantics as the DataFrame
    * loop (component = min id, O(diameter) rounds, loud
    * non-convergence); edges stay DISTRIBUTED — only vertex state is
    * bounded.
    */
  private def ccBroadcast(adj: DataFrame, idsIn: Array[Long],
      maxIter: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = adj.sparkSession
    val sc = spark.sparkContext
    val ids = idsIn.clone()
    java.util.Arrays.sort(ids)
    val bcIds = sc.broadcast(ids)
    val packed = adj.rdd.mapPartitions { rows =>
      val idArr = bcIds.value
      val buf = new scala.collection.mutable.ArrayBuilder.ofLong
      rows.foreach { r =>
        val si = java.util.Arrays.binarySearch(idArr, r.getLong(0))
        val di = java.util.Arrays.binarySearch(idArr, r.getLong(1))
        buf += (si.toLong << 32) | (di.toLong & 0xffffffffL)
      }
      Iterator.single(buf.result())
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nn = ids.length
    var labels = ids.clone()
    var changed = true
    var it = 0
    while (changed && it < maxIter) {
      val bcL = sc.broadcast(labels)
      val contrib = packed.mapPartitions { arrs =>
        val lv = bcL.value
        val acc = Array.fill(lv.length)(Long.MaxValue)
        arrs.foreach { arr =>
          var j = 0
          while (j < arr.length) {
            val p = arr(j)
            val l = lv((p >>> 32).toInt)
            val d = (p & 0xffffffffL).toInt
            if (l < acc(d)) acc(d) = l
            j += 1
          }
        }
        Iterator.single(acc)
      }.treeReduce({ (a, b) =>
        var j = 0
        while (j < a.length) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
        a
      }, depth = 2)
      changed = false
      var i = 0
      val next = new Array[Long](nn)
      while (i < nn) {
        val v = math.min(labels(i), contrib(i))
        next(i) = v
        if (v != labels(i)) changed = true
        i += 1
      }
      labels = next
      bcL.destroy()
      it += 1
    }
    packed.unpersist(false)
    if (changed) {
      bcIds.destroy()
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "graph diameter exceeds the bound; raise maxIter")
    }
    // Result leaves the driver ONCE, as a torrent broadcast — NOT as a
    // parallelized collection: parallelize embeds the rows in every
    // task binary, re-serialized on EVERY downstream action (the
    // memoized component frame is consumed by several queries), and at
    // sf1 that was a 2.2 MB task the scheduler warns about. A range
    // RDD's tasks carry only offsets; executors read the broadcast
    // arrays by index. ~100k rows/partition so a threshold-sized
    // result never funnels through one downstream task.
    val bcLabels = sc.broadcast(labels)
    val slices = math.max(1, nn / 100000)
    val rows = sc.range(0L, nn.toLong, 1L, slices).mapPartitions { idx =>
      val (idArr, lblArr) = (bcIds.value, bcLabels.value)
      idx.map(i => Row(idArr(i.toInt), lblArr(i.toInt)))
    }
    spark.createDataFrame(rows,
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("label", LongType, nullable = false))))
  }

  /** Exact-duplicate clusters on the normalized-text fingerprint:
    * (id, cluster_id = min id with identical content, n_copies).
    */
  def exactClusters(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .withColumn("cluster_id",
        min(col("id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
      .withColumn("n_copies",
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
      .select(col("id"), col("cluster_id"), col("n_copies"))

  // ------------------------------------------------------------ simhash

  /** 64-bit SimHash of the token multiset. One UDF per row (per-bit
    * weighted sums don't reduce to array expressions cleanly); the
    * surrounding tokenization stays in codegen.
    *
    * The per-token hash is the LOW 64 BITS OF md5 (big-endian bytes
    * 8..15 — hex chars 17..32 of the digest), not a bespoke mix: any
    * SQL engine can derive the identical value from its own `md5()`,
    * which is what lets the driver's DuckDB oracle recompute whole
    * signatures and makes the SimHash stratum hash-checkable rather
    * than rows-only. (Cost: md5 is a few× FNV per token; the 64-bit
    * accumulation loop dominates either way.)
    */
  val simhash64: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((tokensIn: Seq[String]) => {
      val tokens = if (tokensIn == null) Seq.empty[String] else tokensIn
      val md = java.security.MessageDigest.getInstance("MD5")
      val acc = new Array[Int](64)
      tokens.foreach { t =>
        md.reset()
        val dig = md.digest(t.getBytes("UTF-8"))
        var h = 0L
        var k = 8
        while (k < 16) { h = (h << 8) | (dig(k) & 0xffL); k += 1 }
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
          i += 1
        }
      }
      var sig = 0L
      var i = 0
      while (i < 64) { if (acc(i) > 0) sig |= (1L << i); i += 1 }
      sig
    })

  def simhashCol(text: Column): Column = simhash64(TextAnalysis.tokens(text))

  /** Hamming distance between two 64-bit signatures (bit_count of xor). */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidates: split the 64-bit signature into
    * `chunks` pieces; two docs within hamming distance `chunks-1` share
    * at least one exact chunk (pigeonhole), so grouping by chunk value
    * finds all of them without an all-pairs join. Verified with the true
    * hamming distance ≤ maxHamming.
    *
    * Same scale shape as [[nearDupPairs]]: ONE shuffle keyed by
    * (chunk, piece), bucket members gathered via `collect_list` (8 B
    * signature + id each), verified pairs emitted in-bucket, and
    * `maxBucket` bounds the quadratic expansion — a degenerate piece
    * value (e.g. the all-zero chunk every short/empty doc produces)
    * forms one giant bucket that would otherwise go O(corpus²) through
    * a self-join. Dropped oversized buckets are counted in the
    * `graft_dedup_buckets_*` observed metric.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      chunks: Int = 4, maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    // the in-bucket verifier carries (id, sig) as (Long, Long); require
    // an integral id up front (clear error instead of an analysis-time
    // encoder mismatch) — hash or dense-rank non-integral ids first
    val idType = df.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(idType.typeName),
      s"simhashPairs requires an integral idCol (widened to long); " +
        s"'$idCol' is ${idType.simpleString}. Hash or rank string ids first.")
    require(chunks > 0 && 64 % chunks == 0,
      s"chunks must divide 64 evenly, got $chunks")
    require(maxHamming <= chunks - 1,
      s"pigeonhole recall is only guaranteed for hamming <= chunks-1 = " +
        s"${chunks - 1}; got maxHamming=$maxHamming (raise chunks)")
    val bits = 64 / chunks
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    val sigs = df.select(col(idCol).as("id"),
      simhashCol(col(textCol)).as("sig"))
    val pieces = (0 until chunks).map(c =>
      struct(lit(c).as("chunk"),
        shiftright(col("sig"), c * bits).bitwiseAND(lit(mask)).as("piece")))
    val exploded = sigs.select(col("id"), col("sig"),
      explode(array(pieces: _*)).as("cp"))
      .select(col("cp.chunk").as("chunk"), col("cp.piece").as("piece"),
        struct(col("id").cast("long").as("_1"), col("sig").as("_2")).as("member"))
    // in-bucket pair expansion WITH verification: only pairs within
    // maxHamming leave the bucket, so output size tracks true near-dups
    val verifiedPairs = udf((members: Seq[(Long, Long)]) => {
      val sorted = members.sortBy(_._1)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
      var i = 0
      while (i < sorted.length) {
        var j = i + 1
        while (j < sorted.length) {
          val h = java.lang.Long.bitCount(sorted(i)._2 ^ sorted(j)._2)
          if (sorted(i)._1 < sorted(j)._1 && h <= maxHamming)
            out += ((sorted(i)._1, sorted(j)._1, h))
          j += 1
        }
        i += 1
      }
      out.toSeq
    })
    withBucketMetrics(
      exploded.groupBy(col("chunk"), col("piece"))
        .agg(collect_list(col("member")).as("members")),
      size(col("members")), maxBucket)
      .filter(size(col("members")).between(2, maxBucket))
      .select(explode(verifiedPairs(col("members"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"),
        col("p._3").as("hamming"))
      .distinct() // a pair may share several chunks; report once
  }

  /** Corpus-scaled chunk count for [[simhashPairs]]. Pieces must stay
    * selective — a piece of width w has only 2^w values, so bucket
    * occupancy is ~n/2^w per chunk: at 5 000 docs 4-bit pieces put
    * ~300 docs in every bucket and candidate generation degenerates
    * toward all-pairs (measured 26 s vs <1 s at sf0.1). Piece width
    * must grow like log2(n) — which shrinks the guaranteed recall
    * radius (chunks−1): the fundamental SimHash pigeonhole tradeoff
    * (the same n-scaling as [[Similarity.bitsFor]]).
    *
    *   n < 16k → 8 chunks of 8 bits (recall ≤ 7);
    *   n < 4M  → 4 chunks of 16 bits (recall ≤ 3, the Manku et al.
    *             web-scale standard);
    *   else    → 2 chunks of 32 bits (recall ≤ 1; prefer MinHash-LSH
    *             for wider radii at that scale).
    */
  def chunksFor(n: Long): Int =
    if (n < (1L << 14)) 8 else if (n < (1L << 22)) 4 else 2

  // -------------------------------------------------- exact substring

  /** Positional winnowing over RAW text (no normalization — exact
    * means exact): rolling-hash every k-gram, keep each w-window's
    * minimum (rightmost on ties), dedup consecutive picks, return
    * (hash, 0-based position) pairs. The MOSS guarantee transfers:
    * any common RAW substring of length ≥ k+w−1 yields at least one
    * shared (hash, ·) pick in BOTH documents at the aligned offsets.
    * Documents shorter than k+w−1 cannot contain a qualifying
    * substring and emit nothing. O(len·w) per document, one UDF pass.
    */
  private def winnowPicksUdf(k: Int, w: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) => {
      if (text == null || text.length < k + w - 1) Seq.empty[(Long, Int)]
      else {
        val B = 1000003L
        var pow = 1L
        var i = 0
        while (i < k - 1) { pow *= B; i += 1 }
        val n = text.length - k + 1
        val hashes = new Array[Long](n)
        var h = 0L
        i = 0
        while (i < text.length) {
          if (i >= k) h -= text.charAt(i - k) * pow
          h = h * B + text.charAt(i)
          if (i >= k - 1) hashes(i - k + 1) = h
          i += 1
        }
        val picks = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
        var lastPickIdx = -1
        var start = 0
        while (start + w <= n) {
          var minIdx = start
          var j = start + 1
          while (j < start + w) {
            if (hashes(j) <= hashes(minIdx)) minIdx = j
            j += 1
          }
          if (minIdx != lastPickIdx) {
            picks += ((hashes(minIdx), minIdx)); lastPickIdx = minIdx
          }
          start += 1
        }
        picks.toSeq
      }
    })

  /** EXACT-substring near-dup pairs (the Lee et al. 2021 "exact
    * substring deduplication" semantics): document pairs sharing a
    * verbatim substring of ≥ `minLen` characters. The reference
    * method builds one suffix array over the concatenated corpus — a
    * global sort-order structure that doesn't distribute; this is the
    * Spark-shaped equivalent with the same answer set:
    *
    *   1. positional winnowing anchors (`winnowPicksUdf`, k-gram
    *      size `k`, window w = minLen−k+1, so the guarantee threshold
    *      is exactly `minLen`) — fingerprint density ~2/(w+1) per
    *      char, so the exploded anchor table is a small constant
    *      fraction of corpus size, in slim (id, hash, pos) rows;
    *   2. ONE shuffle keyed by anchor hash; bucket members gather
    *      into `maxBucket`-capped lists (observe() drop metrics, the
    *      [[nearDupPairs]] contract — an over-cap bucket is a k-gram
    *      shared by >maxBucket docs, i.e. boilerplate) and in-bucket
    *      anchor pairs are emitted via higher-order functions, never
    *      a UDF over the corpus;
    *   3. anchor pairs dedup per document pair (first `maxAnchors` in
    *      deterministic position order — a true ≥minLen match yields
    *      an in-region anchor among the earliest by construction, but
    *      pathologically self-repetitive docs could exceed the cap,
    *      hence its size);
    *   4. texts join onto the DEDUPED pair list only (payloads never
    *      ride the explode), and a verification UDF extends each
    *      anchor left/right while characters match: hash collisions
    *      and sub-minLen coincidences are rejected, so the output has
    *      NO false positives, and the winnowing guarantee means no
    *      false negatives — exact, with no all-pairs join and no
    *      global suffix sort.
    *
    * Returns (id_a, id_b) with id_a < id_b.
    */
  def exactSubstringPairs(df: DataFrame, idCol: String, textCol: String,
      minLen: Int = 50, k: Int = 20, maxBucket: Int = 1000,
      maxAnchors: Int = 256): DataFrame = {
    require(k >= 2 && k < minLen, s"need 2 <= k < minLen, got k=$k minLen=$minLen")
    val w = minLen - k + 1
    val picks = df.select(col(idCol).as("id"),
        explode(winnowPicksUdf(k, w)(col(textCol))).as("pk"))
      .select(col("pk._1").as("h"), col("id"), col("pk._2").as("pos"))
    // in-bucket anchor pairs: sorted members, i<j upper triangle —
    // pure Catalyst HOFs over the capped member list
    val anchorPairs = withBucketMetrics(
      picks.groupBy(col("h"))
        .agg(collect_list(struct(col("id"), col("pos"))).as("ms")),
      size(col("ms")), maxBucket, "graft_substring_buckets")
      .filter(size(col("ms")).between(2, maxBucket))
      .select(explode(expr(
        """flatten(transform(array_sort(ms), (x, i) ->
          |  transform(slice(array_sort(ms), i + 2, size(ms)), y ->
          |    struct(x.id AS id_a, x.pos AS pos_a,
          |           y.id AS id_b, y.pos AS pos_b))))""".stripMargin)).as("p"))
      .select(col("p.*"))
      .filter(col("id_a") =!= col("id_b"))
    val candidates = anchorPairs
      .groupBy(col("id_a"), col("id_b"))
      .agg(slice(array_sort(collect_set(
        array(col("pos_a"), col("pos_b")))), 1, maxAnchors).as("anchors"))
    val verifies = udf((ta: String, tb: String, anchors: Seq[Seq[Int]]) => {
      if (ta == null || tb == null) false
      else anchors.exists { an =>
        val pa = an(0); val pb = an(1)
        var ok = pa >= 0 && pb >= 0 && pa + k <= ta.length && pb + k <= tb.length
        var i = 0
        while (ok && i < k) { ok = ta.charAt(pa + i) == tb.charAt(pb + i); i += 1 }
        ok && {
          var left = 0
          while (pa - left - 1 >= 0 && pb - left - 1 >= 0 &&
            ta.charAt(pa - left - 1) == tb.charAt(pb - left - 1)) left += 1
          var right = 0
          while (pa + k + right < ta.length && pb + k + right < tb.length &&
            ta.charAt(pa + k + right) == tb.charAt(pb + k + right)) right += 1
          left + k + right >= minLen
        }
      }
    })
    val txt = df.select(col(idCol).as("id"), col(textCol).as("text"))
    candidates
      .join(txt.select(col("id").as("id_a"), col("text").as("text_a")), Seq("id_a"))
      .join(txt.select(col("id").as("id_b"), col("text").as("text_b")), Seq("id_b"))
      .filter(verifies(col("text_a"), col("text_b"), col("anchors")))
      .select(col("id_a"), col("id_b"))
  }

  // ------------------------------------------------------------- metrics

  private val obsId = new java.util.concurrent.atomic.AtomicInteger

  /** No silent caps: attach an observed metric counting buckets the
    * `maxBucket` guard will drop (plus the max bucket size seen), so
    * recall loss is visible to ops via `QueryExecutionListener` /
    * `StreamingQueryListener` without an extra job. The name is
    * uniquified because observation names must be unique per query and
    * one query may contain several dedup operators.
    */
  private[llm] def withBucketMetrics(grouped: DataFrame, bucketSize: Column,
      maxBucket: Int, name: String = "graft_dedup_buckets"): DataFrame =
    grouped.observe(s"${name}_${obsId.incrementAndGet()}",
      sum(when(bucketSize > maxBucket, 1L).otherwise(0L))
        .as("dropped_oversized_buckets"),
      max(bucketSize).as("max_bucket_size"))
}
