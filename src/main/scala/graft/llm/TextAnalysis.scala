package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (north-star
  * surface; no reference counterpart — the reference's text handling
  * stops at categorical "path=value" strings).
  *
  * Everything here is pure Column expressions — whole-stage codegen,
  * no UDFs — so the operators scan-pipeline at 100 TB: one pass, no
  * shuffle, filters composable on top.
  */
object TextAnalysis {

  /** Lowercased, punctuation-stripped normalization (the canonical form
    * used by fingerprinting and shingling).
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "[^\\p{L}\\p{Nd}]+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalized(text), " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def charCount(text: Column): Column = length(text)

  /** Shannon entropy (bits) of the text's character distribution — a
    * cheap perplexity proxy for quality filtering: random/encoded
    * content scores near log2(alphabet), repetitive boilerplate low.
    * One UDF pass per document (a per-char explode would shuffle
    * |text| rows per doc); accumulation runs in sorted-char order so
    * the float sum is deterministic. Unit is UTF-16 code units, which
    * coincides with characters for BMP text.
    */
  def charEntropy(text: Column): Column = charEntropyUdf(text)

  private val charEntropyUdf =
    org.apache.spark.sql.functions.udf((s: String) => {
      if (s == null || s.isEmpty) 0.0
      else {
        val counts = scala.collection.mutable.SortedMap.empty[Char, Long]
        s.foreach(c => counts(c) = counts.getOrElse(c, 0L) + 1L)
        val n = s.length.toDouble
        var h = 0.0
        counts.values.foreach { cnt =>
          val p = cnt / n
          h -= p * math.log(p)
        }
        h / math.log(2.0)
      }
    })

  /** BPE-ish subword count estimate: words plus an extra unit per 4
    * chars of long words (a cheap, deterministic stand-in for a real
    * tokenizer's subword splitting; good enough for budget accounting).
    */
  def subwordCountEstimate(text: Column): Column =
    aggregate(tokens(text), lit(0),
      (acc, w) => acc + greatest(lit(1), ceil(length(w) / lit(4)).cast("int")))

  /** GPT-2-family BPE pre-tokenizer split pattern (the public regex
    * shape: contraction suffixes, letter runs, digit runs, punctuation
    * runs, whitespace — each optionally space-prefixed). Token count
    * under this split approximates a real BPE tokenizer's
    * pre-tokenization far better than whitespace words and needs no
    * vocabulary. Kept to constructs Java regex and RE2 share
    * (no lookarounds) so the oracle can run the same pattern.
    */
  val BpeishPattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{Nd}+| ?[^\\s\\p{L}\\p{Nd}]+|\\s+"

  /** Number of BPE-ish pre-tokens (codegen'd regexp_extract_all). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  // ---------------------------------------------------------- redaction

  /** Email shape, kept to constructs Java regex and RE2 share (plain
    * character classes, no lookarounds) so an oracle can run the
    * identical pattern.
    */
  val EmailPattern: String = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** PII scrub for the training-data path: replace every email with a
    * placeholder. Pure codegen'd `regexp_replace` — one scan, no
    * shuffle, runs at read speed over 100 TB.
    */
  def redactEmails(text: Column, placeholder: String = "[EMAIL]"): Column =
    regexp_replace(text, EmailPattern, placeholder)

  /** Number of email occurrences (audit counterpart of the scrub). */
  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0)))

  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[\\p{L}\\p{Nd}\\s]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Fraction of tokens found in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val sw = typedLit(stopwords)
    aggregate(tokens(text), lit(0),
      (acc, t) => acc + when(array_contains(sw, t), 1).otherwise(0))
      .cast("double") / greatest(tokenCount(text), lit(1)).cast("double")
  }

  def meanWordLength(text: Column): Column =
    aggregate(tokens(text), lit(0), (acc, w) => acc + length(w))
      .cast("double") / greatest(tokenCount(text), lit(1)).cast("double")

  /** Composite quality score in [0,1]: long enough, mostly letters, a
    * sane stopword fraction, plausible word lengths. The weights are a
    * heuristic, not learned — each component is independently exposed
    * above so pipelines can threshold on the raw signals.
    */
  def qualityScore(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val lenScore = least(tokenCount(text).cast("double") / lit(100.0), lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * lit(4.0), lit(1.0))
    val swr = stopwordRatio(text, stopwords)
    val swScore = lit(1.0) - least(abs(swr - lit(0.4)) * lit(2.5), lit(1.0))
    val mwl = meanWordLength(text)
    val wordScore = when(mwl.between(3.0, 10.0), 1.0).otherwise(0.5)
    (lenScore * lit(0.3) + punctScore * lit(0.2) +
      swScore * lit(0.3) + wordScore * lit(0.2))
  }

  /** Document fingerprint: 64-bit hash of the normalized text (xxhash64
    * — Spark builtin, codegen'd). Identical normalized content ⇒
    * identical fingerprint; the exact-dedup key.
    */
  /** Gopher-style repetition signals: the fraction of token
    * occurrences that are repeats (`1 − distinct/total`) and the same
    * over adjacent bigrams — boilerplate and looping-generator output
    * score high, natural prose low. Pure expressions over a STAGED
    * token array (tokenizing once into an attribute keeps the
    * `transform` lambda from re-evaluating the split per element,
    * which would be O(len²) per document); no shuffle, the shape of a
    * 100 TB quality-filter scan. Both fractions are small-integer
    * ratios — one IEEE divide, bit-identical on any engine.
    */
  def repetitionBigrams(toks: Column): Column =
    when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))

  def dupFraction(arr: Column): Column =
    when(size(arr) < 1, lit(0.0))
      .otherwise(round(lit(1.0) -
        size(array_distinct(arr)).cast("double") /
          size(arr).cast("double"), 4))

  /** Quality-filter CASCADE: the C4/Gopher-style keep/drop decision as
    * ONE scan — each rule's raw signal plus its boolean flag plus the
    * final verdict, so a pipeline can both filter and audit WHY a
    * document died (drop-reason accounting is how filter drift gets
    * caught at corpus scale). The token array is STAGED into an
    * attribute before the bigram lambda (re-evaluating the split per
    * element would be O(len²) per document); zero shuffle.
    */
  def qualityCascade(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minTokens: Int = 20, minQuality: Double = 0.5,
      maxBigramDup: Double = 0.1): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("id"), col(textCol).as("__text"),
        tokens(col(textCol)).as("__toks"))
      .select(col("id"),
        size(col("__toks")).as("n_tokens"),
        round(qualityScore(col("__text")), 6).as("quality"),
        dupFraction(repetitionBigrams(col("__toks")))
          .as("dup_bigram_frac"))
      .withColumn("too_short", col("n_tokens") < minTokens)
      .withColumn("low_quality", col("quality") < minQuality)
      .withColumn("repetitive", col("dup_bigram_frac") > maxBigramDup)
      .withColumn("keep",
        !col("too_short") && !col("low_quality") && !col("repetitive"))

  /** ADAPTIVE per-source length filter: keep documents whose token
    * count sits within [p_low, p_high] of their OWN source's length
    * distribution — fixed global cutoffs misfire whenever domains have
    * different length regimes (code vs chat vs web), which they always
    * do. `percentile_disc` bounds (exact order statistics — integers
    * from the data, no interpolation, no cross-engine float risk).
    *
    * Scale shape: bounds are ONE aggregation over slim
    * (source, n_tok) rows — source cardinality is tiny, so the bounds
    * frame broadcasts and the corpus filters MAP-SIDE; document text
    * never shuffles.
    */
  def adaptiveLengthFilter(df: org.apache.spark.sql.DataFrame,
      idCol: String, srcCol: String, textCol: String,
      pLow: Double = 0.05, pHigh: Double = 0.95)
      : org.apache.spark.sql.DataFrame = {
    require(pLow >= 0 && pHigh <= 1 && pLow <= pHigh,
      s"need 0 <= pLow <= pHigh <= 1, got ($pLow, $pHigh)")
    val counted = df.select(col(srcCol).as("source"), col(idCol).as("id"),
      tokenCount(col(textCol)).as("n_tok"))
    val bounds = counted.groupBy(col("source")).agg(
      expr(s"percentile_disc($pLow) WITHIN GROUP (ORDER BY n_tok)")
        .as("lo"),
      expr(s"percentile_disc($pHigh) WITHIN GROUP (ORDER BY n_tok)")
        .as("hi"))
    counted.join(broadcast(bounds), Seq("source"))
      .filter(col("n_tok") >= col("lo") && col("n_tok") <= col("hi"))
      .select(col("source"), col("id"), col("n_tok"))
  }

  def fingerprint(text: Column): Column = xxhash64(normalized(text))

  /** MD5 fingerprint variant (hex string) — portable to any engine with
    * md5, which makes it the oracle-checkable flavor.
    */
  def fingerprintMd5(text: Column): Column = md5(normalized(text))

  // ------------------------------------------------------------ lang-id

  /** Tiny per-language function-word profiles (public knowledge). The
    * score of a language is the fraction of tokens that are among its
    * function words; argmax wins, "und" (undetermined) when every score
    * is ~0.
    */
  val LanguageProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was",
      "for", "with", "as", "his", "on", "be", "at", "by", "had", "not"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ich", "nicht", "sie",
      "es", "ein", "eine", "mit", "auf", "für", "den", "von", "zu", "im"),
    "fr" -> Seq("le", "la", "les", "et", "est", "je", "ne", "pas", "vous",
      "un", "une", "du", "des", "dans", "que", "qui", "pour", "sur", "au"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "no", "que", "en",
      "un", "una", "por", "con", "para", "su", "se", "del", "al", "lo"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "他", "这", "不", "人",
      "们", "来", "到", "时", "大", "地", "为", "子", "中", "你"),
    "ru" -> Seq("и", "в", "не", "на", "я", "что", "он", "с", "это",
      "как", "по", "но", "его", "к", "у", "из", "за", "от", "же", "то"),
    "ar" -> Seq("في", "من", "على", "إلى", "عن", "أن", "هذا", "هذه",
      "التي", "الذي", "مع", "كان", "لا", "ما", "هو", "هي", "قد", "كل",
      "أو", "ثم"),
    // ja/ko: single-character profiles → character-level scoring (no
    // whitespace tokenization exists for these scripts). Hiragana
    // particles/okurigana separate ja from zh (kana never appears in
    // Chinese text; the zh profile's Han characters are rare in
    // Japanese prose relative to kana density). Hangul syllables are
    // unique to ko.
    "ja" -> Seq("の", "に", "は", "を", "た", "が", "で", "て", "と",
      "し", "も", "な", "い", "か", "ら", "れ", "る", "す", "ま", "こ"),
    "ko" -> Seq("이", "의", "에", "는", "을", "를", "가", "하", "고",
      "지", "서", "다", "로", "과", "도", "은", "인", "한", "그", "사"))

  /** Language score: token-level function-word ratio for space-delimited
    * scripts; character-level ratio when the profile is single
    * characters (CJK — no whitespace tokenization exists there).
    */
  def langScore(text: Column, profile: Seq[String]): Column =
    if (profile.forall(_.length == 1)) {
      val norm = normalized(text)
      // \Q..\E-quote each char so regex metacharacters ('-', ']', '^',
      // '\') in a profile can't corrupt the character class
      val cls = "[" + profile.map(c => "\\Q" + c + "\\E").mkString + "]"
      (length(norm) - length(regexp_replace(norm, cls, "")))
        .cast("double") / greatest(length(norm), lit(1)).cast("double")
    } else stopwordRatio(text, profile)

  /** Best-scoring language label, or "und" below `minScore`. One pass,
    * pure expressions (a when-chain over the profile map, evaluated in
    * sorted language order so ties resolve deterministically to the
    * alphabetically-first language).
    */
  def langId(text: Column, minScore: Double = 0.05,
      profiles: Map[String, Seq[String]] = LanguageProfiles): Column = {
    val scored = profiles.toSeq.sortBy(_._1)
      .map { case (l, p) => l -> langScore(text, p) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    // reverse fold so the FIRST language in sorted order wins ties
    scored.reverse.foldLeft(lit("und")) { case (acc, (l, s)) =>
      when(s >= lit(minScore) && s === best, lit(l)).otherwise(acc)
    }
  }

  // ------------------------------------------------------- fingerprints

  /** Winnowing document fingerprints (the MOSS scheme): rolling-hash
    * every k-gram of the normalized character stream, slide a window of
    * `w` hashes, keep each window's minimum (rightmost on ties), dedup
    * consecutive picks. Guarantees any shared substring of length ≥
    * k+w−1 contributes at least one shared fingerprint — the property
    * exact-hash fingerprints lack for partial overlap detection.
    * One UDF pass per row; upstream normalization stays in codegen.
    */
  def winnowingFingerprints(k: Int = 8, w: Int = 4)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) => {
      if (text == null) Seq.empty[Long]
      else {
        val s = text.toLowerCase.replaceAll("[^\\p{L}\\p{Nd}]+", " ").trim
        if (s.length < k) Seq(s.hashCode.toLong)
        else {
          val B = 1000003L
          var pow = 1L
          var i = 0
          while (i < k - 1) { pow *= B; i += 1 }
          val hashes = new Array[Long](s.length - k + 1)
          var h = 0L
          i = 0
          while (i < s.length) {
            if (i >= k) h -= s.charAt(i - k) * pow
            h = h * B + s.charAt(i)
            if (i >= k - 1) hashes(i - k + 1) = h
            i += 1
          }
          val picks = scala.collection.mutable.ArrayBuffer.empty[Long]
          var lastPickIdx = -1
          var start = 0
          while (start + w <= hashes.length) {
            var minIdx = start
            var j = start + 1
            while (j < start + w) {
              if (hashes(j) <= hashes(minIdx)) minIdx = j
              j += 1
            }
            if (minIdx != lastPickIdx) { picks += hashes(minIdx); lastPickIdx = minIdx }
            start += 1
          }
          picks.toSeq
        }
      }
    })

  /** PORTABLE winnowing: same algorithm as [[winnowingFingerprints]]
    * (k-gram hashes, rightmost-min over a w-window, consecutive-pick
    * dedup) but with md5-hex k-gram hashes compared lexicographically —
    * a hash any SQL engine reproduces, so the DRIVER ORACLE can replay
    * the entire winnow (positions → md5 → windowed rightmost-min →
    * distinct picks) and hash-check the fingerprints themselves.
    * Rightmost-min makes the winning index non-decreasing as the
    * window slides, so consecutive-pick dedup ≡ DISTINCT pick
    * positions — which is what makes the SQL replay exact. Cost is
    * O(len·k) md5 versus the rolling form's O(len); use the rolling
    * form when fingerprint values need no cross-engine contract.
    */
  def winnowPortable(k: Int = 8, w: Int = 4)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) => {
      // one digest instance per row, reset per k-gram (getInstance per
      // k-gram would allocate O(len) digests per document)
      val md = java.security.MessageDigest.getInstance("MD5")
      def md5hex(s: String): String = {
        md.reset()
        md.digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
      }
      if (text == null) Seq.empty[String]
      else {
        val s = text.toLowerCase.replaceAll("[^\\p{L}\\p{Nd}]+", " ").trim
        if (s.length < k) Seq(md5hex(s))
        else {
          val n = s.length - k + 1
          val hx = Array.tabulate(n)(p => md5hex(s.substring(p, p + k)))
          val picks = scala.collection.mutable.ArrayBuffer.empty[String]
          var last = -1
          var st = 0
          while (st + w <= n) {
            var m = st
            var j = st + 1
            while (j < st + w) {
              if (hx(j).compareTo(hx(m)) <= 0) m = j // rightmost min
              j += 1
            }
            if (m != last) { picks += hx(m); last = m }
            st += 1
          }
          picks.toSeq
        }
      }
    })

  def winnow(text: Column, k: Int = 8, w: Int = 4): Column =
    winnowingFingerprints(k, w)(text)

  /** Minimal English stopword list for quality scoring. */
  val EnglishStopwords: Seq[String] = LanguageProfiles("en") ++ Seq(
    "a", "an", "are", "but", "from", "or", "this", "which", "you", "we",
    "they", "have", "has", "were", "been", "their", "its", "can", "will")
}
