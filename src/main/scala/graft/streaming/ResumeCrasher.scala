package graft.streaming

import org.apache.spark.sql.SparkSession

/** Hard-kill half of the durable-resume certification: a SEPARATE
  * JVM that runs a watermarked stateful dedup over a staged paced
  * source with a durable checkpoint, then `Runtime.halt`s itself
  * inside the target epoch — after that epoch's output is written,
  * before its commit. No shutdown hooks, no finally blocks, no
  * graceful anything: the process is gone the way a preempted
  * executor host is gone.
  *
  * The parent spec (`StreamingResumeSpec`) waits for the halt exit
  * code, rebuilds the identical plan in its own JVM, resumes from the
  * on-disk checkpoint, and proves the assembled end state equals an
  * uninterrupted run's.
  *
  * args: stagedDir workDir haltAtBatch
  */
object ResumeCrasher {
  /** Exit code the parent asserts on — distinguishable from a crash
    * of the crasher itself (1) or a clean-but-wrong run (0).
    */
  val HaltCode = 117

  def main(args: Array[String]): Unit = {
    val Array(stagedDir, workDir, haltAtStr) = args
    val haltAt = haltAtStr.toLong
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-resume-crasher")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Streams.resumableAttempt(
      Streams.dedupByKey(Streams.pacedStream(spark, stagedDir),
        "event_id", watermark = "3650 days"),
      s"$workDir/sink", s"$workDir/ckpt", "resume_crasher",
      complete = false,
      sabotage = id =>
        if (id == haltAt) {
          Console.err.println(s"[crasher] halting JVM inside epoch $id")
          Runtime.getRuntime.halt(HaltCode)
        })
    // reaching here means the sabotage never fired — fail loudly so
    // the parent never mistakes a no-crash run for a certification
    Console.err.println(s"[crasher] ERROR: epoch $haltAt never ran")
    spark.stop()
    sys.exit(1)
  }
}
