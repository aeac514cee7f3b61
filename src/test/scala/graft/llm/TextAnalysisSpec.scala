package graft.llm

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token and char counts") {
    val df = Seq(Tuple1("Hello, World! This is a test.")).toDF("t")
    val r = df.select(
      TextAnalysis.tokenCount(col("t")),
      TextAnalysis.charCount(col("t"))).collect().head
    assert(r.getInt(0) == 6)
    assert(r.getInt(1) == 29)
  }

  test("bpe-ish token count splits contractions, digits, punctuation") {
    val df = Seq(Tuple1("I'll pay $42.50, that's fine!")).toDF("t")
    // I |'ll| pay| $|42|.|50|,| that|'s| fine|!  = 12 pre-tokens
    val r = df.select(TextAnalysis.bpeTokenCount(col("t"))).collect().head
    assert(r.getInt(0) == 12)
  }

  test("punct ratio counts non-alphanumeric non-space chars") {
    val df = Seq(Tuple1("ab, cd!")).toDF("t")
    val r = df.select(TextAnalysis.punctRatio(col("t"))).collect().head
    assert(math.abs(r.getDouble(0) - 2.0 / 7.0) < 1e-12)
  }

  test("fingerprint is normalization-invariant") {
    val df = Seq(("The  Quick   FOX!", "the quick fox")).toDF("a", "b")
    val r = df.select(
      TextAnalysis.fingerprintMd5(col("a")),
      TextAnalysis.fingerprintMd5(col("b"))).collect().head
    assert(r.getString(0) == r.getString(1))
  }

  test("langId classifies real-language sentences") {
    val samples = Seq(
      ("the cat sat on the mat and it was happy to be at home", "en"),
      ("der hund ist nicht mit der katze auf dem sofa und ich bin im haus", "de"),
      ("le chat est dans la maison et je ne sais pas pour quoi il dort", "fr"),
      ("el perro es un animal que vive en la casa con su familia", "es"),
      ("我是一个人他是我的朋友这是我们的家", "zh"))
    val df = samples.toDF("text", "expected")
    val got = df.select(col("expected"),
      TextAnalysis.langId(col("text")).as("pred")).collect()
    got.foreach { r =>
      assert(r.getString(1) == r.getString(0),
        s"expected ${r.getString(0)}, got ${r.getString(1)}")
    }
  }

  test("langId: per-language recall on planted docs across all nine " +
      "profiles, incl. mixed-script separation") {
    // three planted docs per language; recall must be 3/3 per language
    val planted = Seq(
      "en" -> Seq(
        "it was the best of times and it was the worst of times for all",
        "she said that the house at the end of the road was not for sale",
        "he had been to the city by the sea and was glad to be at home"),
      "de" -> Seq(
        "ich bin mit dem zug von der stadt zu dir gefahren und es war schön",
        "das kind ist nicht im haus und sie hat es auf der straße gesehen",
        "der mann und die frau sind mit einem auto zu dem see gefahren"),
      "fr" -> Seq(
        "je ne sais pas si vous avez le temps pour un café dans la matinée",
        "les enfants sont dans le jardin et la mère est sur le balcon",
        "il est venu du village pour la fête qui a lieu sur la place"),
      "es" -> Seq(
        "el libro que me diste es muy bueno y lo leo con mucho interés",
        "no hay nada en la mesa para el desayuno de los niños una manzana",
        "la ciudad es grande y por la noche se ve con una luz preciosa"),
      "zh" -> Seq(
        "他是我的朋友我们在这个大地方有很多人",
        "你来我家的时候他不在我们是一家人",
        "这是中国人的大时代我们都在其中"),
      "ru" -> Seq(
        "я не знаю что он сказал но это было как в кино по телевизору",
        "он пошёл в магазин за хлебом и не вернулся к ужину домой",
        "у нас из окна видно что за рекой то поле то лес и дорога"),
      "ar" -> Seq(
        "هذا الكتاب من أفضل ما قرأت في هذه السنة على الإطلاق",
        "كان الرجل في البيت مع أولاده وقد خرج إلى السوق ثم عاد",
        "هي التي قالت لا أريد أن أذهب إلى المدرسة كل يوم"),
      "ja" -> Seq(
        "わたしはまいにちがっこうにいってともだちとはなします",
        "ねこがにわでねているのをみてこどもはわらった",
        "このほんはとてもおもしろくてよるまでよんでしまった"),
      "ko" -> Seq(
        "나는 오늘 학교에 가서 친구들과 이야기를 하고 집으로 돌아왔다",
        "그 사람은 서울에 사는데 주말마다 산에 가는 것을 좋아한다",
        "아이들이 공원에서 놀고 있는 모습을 보는 것이 즐겁다"))
    val df = planted.flatMap { case (l, docs) => docs.map(l -> _) }
      .toDF("expected", "text")
    val byLang = df.select(col("expected"),
        TextAnalysis.langId(col("text")).as("pred")).collect()
      .groupBy(_.getString(0))
      .map { case (l, rs) =>
        l -> rs.count(r => r.getString(1) == l).toDouble / rs.length }
    planted.foreach { case (l, _) =>
      assert(byLang(l) == 1.0, s"recall($l) = ${byLang(l)}, want 1.0")
    }
    // mixed-script: kana density separates ja from zh even when the
    // doc also carries kanji the zh profile counts
    val mixed = Seq(Tuple1("私は毎日学校に行って友達と話をしています")).toDF("text")
    assert(mixed.select(TextAnalysis.langId(col("text"))).collect()
      .head.getString(0) == "ja", "kanji+kana doc must classify ja")
  }

  test("langScore is safe for profiles containing regex metacharacters") {
    // '-', ']', '^', '\' in a single-char profile must be literal, not
    // corrupt the character class into silent wrong ranges
    val df = Seq(Tuple1("a-b]c^d\\e")).toDF("t")
    val score = df.select(TextAnalysis.langScore(col("t"),
      Seq("-", "]", "^", "\\", "z"))).collect().head.getDouble(0)
    // normalized() strips punctuation, so none of the metachars survive
    // and nothing matches — the point is no pattern error / no mis-range
    assert(score == 0.0)
    val df2 = Seq(Tuple1("zzzz")).toDF("t")
    val s2 = df2.select(TextAnalysis.langScore(col("t"),
      Seq("-", "]", "z"))).collect().head.getDouble(0)
    assert(s2 == 1.0)
  }

  test("langId returns und for non-language content") {
    val df = Seq(Tuple1("xk9 qq7 zzz9 blorp wug 42 17")).toDF("t")
    assert(df.select(TextAnalysis.langId(col("t"))).collect()
      .head.getString(0) == "und")
  }

  test("quality score ranges sanely: real text beats garbage") {
    val df = Seq(
      ("good", "the report shows that revenue is growing and the team " +
        "expects it to continue because demand for the product is strong " +
        "across all the regions where we have been operating this year"),
      ("garbage", "$$$ !!! @@@ ### %% ^^ && ** (( )) __ ++ == ~~ ``")
    ).toDF("kind", "text")
    val scores = df.select(col("kind"),
      TextAnalysis.qualityScore(col("text")).as("q")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scores("good") > 0.6, s"good text scored ${scores("good")}")
    assert(scores("garbage") < 0.4, s"garbage scored ${scores("garbage")}")
    assert(scores.values.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("winnowing: shared substring yields shared fingerprints") {
    val common = "the quick brown fox jumps over the lazy sleeping dog tonight"
    val a = s"PREFIX AAA $common SUFFIX BBB"
    val b = s"totally different beginning here $common and another ending"
    val c = "no overlap with anything else whatsoever in this sentence at all"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "t")
    val fps = df.select(col("id"), TextAnalysis.winnow(col("t")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty,
      "docs sharing a long substring must share fingerprints")
    assert(fps(1L).intersect(fps(3L)).isEmpty ||
      fps(1L).intersect(fps(3L)).size < fps(1L).intersect(fps(2L)).size)
    // deterministic
    val again = df.select(TextAnalysis.winnow(col("t"))).collect()
      .map(_.getSeq[Long](0)).toSeq
    assert(again == df.select(TextAnalysis.winnow(col("t"))).collect()
      .map(_.getSeq[Long](0)).toSeq)
  }

  test("geometric mean aggregator: correctness and null/invalid handling") {
    val df = Seq(("a", 2.0), ("a", 8.0), ("b", 5.0), ("b", -1.0), ("c", 0.0))
      .toDF("g", "x")
    val out = df.groupBy("g")
      .agg(graft.functions.GeometricMean(col("x")).as("gm"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(math.abs(out("a").get - 4.0) < 1e-12) // sqrt(2*8)
    assert(math.abs(out("b").get - 5.0) < 1e-12) // -1 ignored
    assert(out("c").isEmpty)                     // no valid values
  }

  test("subword estimate upper-bounds word count for long words") {
    val df = Seq(Tuple1("internationalization is extraordinary")).toDF("t")
    val r = df.select(
      TextAnalysis.tokenCount(col("t")),
      TextAnalysis.subwordCountEstimate(col("t"))).collect().head
    assert(r.getInt(0) == 3)
    assert(r.getInt(1) > 3) // 20-char + 13-char words split
  }
  test("charEntropy matches hand-computed distributions") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, "aaaa"),     // one symbol -> 0 bits
      (2L, "abab"),     // uniform 2 symbols -> 1 bit
      (3L, "abcdabcd"), // uniform 4 symbols -> 2 bits
      (4L, ""),         // empty -> 0
      (5L, "aab")       // 2/3,1/3 -> ~0.9183
    ).toDF("id", "t")
    val got = df.select(col("id"),
        TextAnalysis.charEntropy(col("t")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 0.0)
    assert(math.abs(got(2L) - 1.0) < 1e-12)
    assert(math.abs(got(3L) - 2.0) < 1e-12)
    assert(got(4L) == 0.0)
    assert(math.abs(got(5L) - 0.9182958340544896) < 1e-12)
  }

  test("repetition signals: duplicate token/bigram fractions by hand") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, "a a b"),     // 3 toks 2 distinct -> 1/3; bigrams {a a, a b} -> 0
      (2L, "x x x"),     // 1 - 1/3 = 2/3; bigrams {x x, x x} -> 1/2
      (3L, "one"),       // single token: no bigrams -> 0.0
      (4L, "p q r s")    // all distinct -> 0, 0
    ).toDF("id", "t")
    val staged = df.select(col("id"), TextAnalysis.tokens(col("t")).as("toks"))
    val got = staged.select(col("id"),
        TextAnalysis.dupFraction(col("toks")).as("dt"),
        TextAnalysis.dupFraction(
          TextAnalysis.repetitionBigrams(col("toks"))).as("db"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(got(1L) == ((0.3333, 0.0)))
    assert(got(2L) == ((0.6667, 0.5)))
    assert(got(3L) == ((0.0, 0.0)))
    assert(got(4L) == ((0.0, 0.0)))
  }

  test("portable winnow keeps the shared-substring guarantee and edge cases") {
    import org.apache.spark.sql.functions._
    val common = "the quick brown fox jumps over the lazy sleeping dog tonight"
    val df = Seq(
      (1L, s"PREFIX AAA $common SUFFIX BBB"),
      (2L, s"totally different beginning here $common and another ending"),
      (3L, "no overlap with anything else whatsoever in this sentence"),
      (4L, "tiny"),                    // shorter than k -> whole-string md5
      (5L, "exactly9ch")               // 10 chars: positions < w -> empty
    ).toDF("id", "t")
    val fps = df.select(col("id"),
        TextAnalysis.winnowPortable()(col("t")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty)
    assert(fps(4L).length == 1 && fps(4L).head.length == 32)
    assert(fps(5L).isEmpty)
    // picks are md5 hex of the winning 8-gram, deterministic
    assert(fps(1L).forall(_.matches("[0-9a-f]{32}")))
  }

  test("adaptiveLengthFilter trims per-source outliers by exact order stats") {
    // source A: lengths 1..20 (one doc each); source B: all length 5
    val docs =
      (1 to 20).map(i => (i.toLong, "a", Seq.fill(i)("w").mkString(" "))) ++
      (21 to 30).map(i => (i.toLong, "b", "v v v v v"))
    val df = docs.toDF("doc_id", "source", "text")
    val out = TextAnalysis
      .adaptiveLengthFilter(df, "doc_id", "source", "text",
        pLow = 0.1, pHigh = 0.9)
      .collect().map(r => r.getLong(1)).toSet
    // source A: percentile_disc(0.1) of 1..20 = 2, disc(0.9) = 18
    val expectA = (1 to 20).filter(i => i >= 2 && i <= 18).map(_.toLong).toSet
    // source B: degenerate distribution — everything survives
    val expectB = (21 to 30).map(_.toLong).toSet
    assert(out == expectA ++ expectB,
      s"missing=${(expectA ++ expectB) -- out} extra=${out -- (expectA ++ expectB)}")
  }

  test("qualityCascade flags each rule independently and keep = none fired") {
    // alternate stopwords with UNIQUE words: long, swr ≈ 0.5, sane word
    // lengths, and every bigram distinct (no repetition)
    val longGood = (0 until 20)
      .map(i => Seq("the", "and", "of", "to", "in")(i % 5) + s" word$i")
      .mkString(" ")
    val repetitive = ("spam ham " * 30).trim // bigram dup fraction ~1
    val df = Seq(
      (1L, longGood),            // long, quality ok, not repetitive
      (2L, "too short"),         // dies on length only
      (3L, repetitive)           // long enough but repeats
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityCascade(df, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(4), r.getBoolean(5),
        r.getBoolean(6), r.getBoolean(7)))
      .toMap
    // (too_short, low_quality, repetitive, keep)
    assert(!out(1L)._1 && !out(1L)._3, s"doc1 flags: ${out(1L)}")
    assert(out(1L)._4 == (!out(1L)._1 && !out(1L)._2 && !out(1L)._3))
    assert(out(2L)._1 && !out(2L)._4, s"doc2 flags: ${out(2L)}")
    assert(out(3L)._3 && !out(3L)._4, s"doc3 flags: ${out(3L)}")
  }

}
