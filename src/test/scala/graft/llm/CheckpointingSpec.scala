package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the reliable-checkpoint switch for the iterative fixpoint
  * loops: with a checkpoint dir configured, connected components and
  * distributed PageRank run their rounds through reliable
  * `checkpoint` (executor-loss-durable on a real cluster) and produce
  * results identical to the localCheckpoint default. Also pins the
  * dense-broadcast ≡ keyed-join CC equivalence (the PageRank twin
  * exists in GraphSpec).
  */
class CheckpointingSpec extends SparkSpec {
  import spark.implicits._

  // chain 1-2-3-4, triangle 5-6-7 + bridge 7-8, singleton 9
  private def vertices = (1L to 9L).map(Tuple1(_)).toDF("id")
  private def edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L),
    (5L, 6L), (6L, 7L), (5L, 7L), (7L, 8L)).toDF("a", "b")

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("CC keyed-join loop: reliable checkpoint ≡ localCheckpoint") {
    val dir = Files.createTempDirectory("graft_ckpt").toString
    // broadcastThreshold = 0 forces the keyed-join loop — the mode
    // whose per-round materialization the switch governs
    val local = labelsOf(Dedup.connectedComponents(
      vertices, "id", edges, "a", "b", broadcastThreshold = 0L))
    val reliable = labelsOf(Dedup.connectedComponents(
      vertices, "id", edges, "a", "b", broadcastThreshold = 0L,
      checkpointDir = Some(dir)))
    assert(reliable == local)
    assert(local(1L) == 1L && local(4L) == 1L)
    assert(local(8L) == 5L)
    assert(local(9L) == 9L)
    // the reliable run actually wrote round state to the dir
    assert(new java.io.File(dir).listFiles().nonEmpty,
      s"no reliable checkpoint data written under $dir")
  }

  test("CC dense-broadcast mode ≡ keyed-join mode (same labels)") {
    val dense = labelsOf(Dedup.connectedComponents(
      vertices, "id", edges, "a", "b"))
    val keyed = labelsOf(Dedup.connectedComponents(
      vertices, "id", edges, "a", "b", broadcastThreshold = 0L))
    assert(dense == keyed)
  }

  test("distributed PageRank: reliable checkpoint ≡ localCheckpoint") {
    val dir = Files.createTempDirectory("graft_ckpt_pr").toString
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    def ranks(ck: Option[String]) =
      Graph.pageRank(e, "src", "dst", iters = 5,
          broadcastThreshold = 0L, checkpointDir = ck)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val local = ranks(None)
    val reliable = ranks(Some(dir))
    assert(local.keySet == reliable.keySet)
    local.foreach { case (id, pr) =>
      assert(math.abs(pr - reliable(id)) < 1e-12,
        s"rank drift for $id: $pr vs ${reliable(id)}")
    }
  }

  test("session conf spark.graft.checkpointDir drives the switch") {
    val dir = Files.createTempDirectory("graft_ckpt_conf").toString
    spark.conf.set(Checkpointing.ConfKey, dir)
    try {
      val got = labelsOf(Dedup.connectedComponents(
        vertices, "id", edges, "a", "b", broadcastThreshold = 0L))
      assert(got(4L) == 1L)
      assert(new java.io.File(dir).listFiles().nonEmpty,
        s"conf-driven run wrote nothing under $dir")
    } finally spark.conf.unset(Checkpointing.ConfKey)
  }
}
