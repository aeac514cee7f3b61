package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does the streaming-query wall actually go? Runs the
  * streaming_join_semi shape (two-batch events stream, stream-stream
  * interval semi join, AvailableNow, memory sink) and prints the
  * engine's own per-batch breakdown (`durationMs` phases) plus the
  * outside wall — separating irreducible machinery (query start,
  * state-store setup, per-batch planning/commit) from data work. Knobs
  * via env: PROBE_PARTS (state partitions, default 8), PROBE_CONF
  * (comma-separated extra k=v conf pairs).
  */
object ProbeStreamFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val parts = sys.env.getOrElse("PROBE_PARTS", "8").toInt
    val extra = sys.env.get("PROBE_CONF").map(_.split(",").toSeq
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); k -> v
      }.toMap).getOrElse(Map.empty)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import graft.streaming.Streams
    def once(tag: String): Unit = {
      val t0 = System.nanoTime()
      val raw = Streams.eventsStreamTwoBatches(spark,
        s"$sfDir/events.parquet", "2024-01-16")
      val views = raw.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user_id"),
          col("event_id").as("view_id"), col("ts").as("v_ts"))
        .withWatermark("v_ts", "1 hour")
      val clicks = raw.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user_id"),
          col("event_id").as("click_id"), col("ts").as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      val joined = views.join(clicks,
        col("v_user_id") === col("c_user_id") &&
          col("c_ts") >= col("v_ts") &&
          col("c_ts") <= col("v_ts") + expr("interval 30 minutes"),
        "left_semi")
        .select(col("v_user_id").as("user_id"), col("view_id"))
      val iso = graft.core.Sessions.isolated(spark,
        extra + ("spark.sql.shuffle.partitions" -> parts.toString))
      val name = s"probe_semi_${System.nanoTime()}"
      val tPlan0 = System.nanoTime()
      val q = graft.core.Sessions.rebind(iso, joined).writeStream
        .format("memory").queryName(name)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val tQ = (System.nanoTime() - tPlan0) / 1e9
      val n = iso.table(name).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val batches = q.recentProgress.toSeq
      println(f"[floor] $tag parts=$parts wall=$wall%.2fs stream=$tQ%.2fs " +
        f"batches=${batches.size} rows=$n")
      batches.foreach { p =>
        val d = p.durationMs
        println(s"[floor]   batch=${p.batchId} total=${d.get("triggerExecution")}ms " +
          s"addBatch=${d.get("addBatch")}ms getBatch=${d.get("getBatch")}ms " +
          s"planning=${d.get("queryPlanning")}ms walCommit=${d.get("walCommit")}ms " +
          s"commitOffsets=${d.get("commitOffsets")}ms " +
          s"stateRows=${p.stateOperators.map(_.numRowsTotal).sum} " +
          s"stateCommitMs=${p.stateOperators.map(_.allUpdatesTimeMs).sum}+" +
          s"${p.stateOperators.map(_.commitTimeMs).sum}")
      }
    }
    once("cold")
    once("warm")
    once("warm2")
    spark.stop()
  }
}
