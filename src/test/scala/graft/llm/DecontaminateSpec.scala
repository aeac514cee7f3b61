package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"),
    (101L, "pack my box with five dozen liquor jugs")
  ).toDF("id", "text")

  private val corpus = Seq(
    // contains benchmark item 100 verbatim inside other text
    (1L, "intro text the quick brown fox jumps over the lazy dog outro"),
    // shares no 4-gram with any benchmark doc
    (2L, "completely unrelated content about spark query planning"),
    // shares a 4-gram with item 101
    (3L, "please pack my box with care and speed")
  ).toDF("id", "text")

  test("planted contamination is flagged with exact overlap counts") {
    val report = Decontaminate
      .contaminationReport(corpus, bench, "id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1: normalized text has the full 9-word benchmark span =
    // 6 distinct 4-grams shared
    assert(report(1L) == 6L, s"doc 1 overlap: ${report.get(1L)}")
    // doc 3: "pack my box with" is the single shared 4-gram
    assert(report(3L) == 1L, s"doc 3 overlap: ${report.get(3L)}")
    assert(!report.contains(2L), s"clean doc flagged: $report")
  }

  test("decontaminated() drops exactly the flagged docs at maxFrac=0") {
    val kept = Decontaminate
      .decontaminated(corpus, bench, "id", "text", k = 4)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L), s"kept: $kept")
  }

  test("bloom-prefiltered report is byte-identical to the exact report") {
    val exact = Decontaminate
      .contaminationReport(corpus, bench, "id", "text", k = 4)
      .orderBy(col("id")).collect().toSeq
    // fpp high enough that false positives are likely on a tiny set —
    // the exact-verify phase must still strip every one of them
    val bloom = Decontaminate
      .contaminationReportBloom(corpus, bench, "id", "text", k = 4,
        fpp = 0.2)
      .orderBy(col("id")).collect().toSeq
    assert(bloom == exact, s"bloom=$bloom exact=$exact")
  }

  test("a doc shorter than k words matches only as a whole unit") {
    val shortBench = Seq((200L, "tiny doc")).toDF("id", "text")
    val shortCorpus = Seq((10L, "tiny doc"), (11L, "tiny dog"))
      .toDF("id", "text")
    val report = Decontaminate
      .contaminationReport(shortCorpus, shortBench, "id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(report == Map(10L -> 1L), s"got $report")
  }
}
