package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lineage-truncation policy for iterative fixpoint loops (connected
  * components, distributed PageRank).
  *
  * Every round of an iterative DataFrame loop must EAGERLY materialize
  * its result and truncate lineage — persist alone truncates only
  * execution, so the plan tree would grow by one round per iteration
  * and OOM the driver (the classic iterative-algorithm trap). Two ways
  * to do that, and the difference only shows up on a real cluster:
  *
  *   - `localCheckpoint(true)` (the default): fastest — blocks stay in
  *     executor storage — but they DIE WITH THE EXECUTOR: on a
  *     multi-hour 100 TB job a single lost executor kills the whole
  *     fixpoint, because truncated lineage means nothing can be
  *     recomputed;
  *   - durable spill (a `checkpointDir` is configured): each round is
  *     written to cluster-visible storage as parquet and read back, so
  *     the loop survives executor loss at the cost of one write per
  *     round.
  *
  * The durable mode deliberately uses a parquet write+read rather than
  * `Dataset.checkpoint`, for two operational reasons:
  *
  *   1. no global state: `checkpoint` funnels through the ONE
  *     SparkContext-wide `setCheckpointDir` — two concurrent loops
  *     with different dirs would silently redirect each other's
  *     durability. Each materializer here owns a private subdirectory.
  *   2. bounded storage: Spark never reclaims reliable checkpoint
  *     files mid-job (`cleanCheckpoints` is off by default and
  *     static), so a 50-round fixpoint would hold 50 full frame
  *     copies. The spill rotates — once round n is written, rounds
  *     ≤ n−2 are deleted (n−1 is kept one extra round out of caution;
  *     the caller's final result only references the last round).
  *
  * Callers pick per call (`checkpointDir = Some(dir)`), or fleet-wide
  * via the session conf `spark.graft.checkpointDir` — the ops switch a
  * production deployment sets once. Local runs default to
  * localCheckpoint.
  */
object Checkpointing {

  /** The session-conf key consulted when a loop is not given an
    * explicit checkpoint dir.
    */
  val ConfKey = "spark.graft.checkpointDir"

  /** Effective checkpoint dir: the explicit argument, else the session
    * conf, else none (→ localCheckpoint).
    */
  def resolve(spark: SparkSession, explicit: Option[String]): Option[String] =
    explicit.orElse(spark.conf.getOption(ConfKey).filter(_.nonEmpty))

  /** The per-round materializer for ONE dependency CHAIN of a fixpoint
    * loop: a durable rotating parquet spill when a dir is configured,
    * `localCheckpoint` otherwise. Both are eager and reset the plan to
    * a leaf scan. Each call owns a fresh unique subdirectory, so
    * concurrent loops (even with the same base dir) never interfere.
    *
    * CHAIN contract (durable mode): round n's files are deleted when
    * round n+2 is written, so every frame this materializer returns
    * may only be read until two more rounds have been materialized
    * through the SAME instance. A frame that lives across the whole
    * loop (e.g. PageRank's node set) must go through its OWN
    * materializer instance — one write, never rotated.
    */
  def materializer(spark: SparkSession,
      checkpointDir: Option[String]): DataFrame => DataFrame =
    resolve(spark, checkpointDir) match {
      case Some(dir) =>
        val base = s"$dir/graft-fixpoint-${java.util.UUID.randomUUID()}"
        val round = new java.util.concurrent.atomic.AtomicLong(0)
        df => {
          val n = round.getAndIncrement()
          val path = s"$base/round=$n"
          df.write.mode("overwrite").parquet(path)
          if (n >= 2) deleteDir(df.sparkSession, s"$base/round=${n - 2}")
          // explicit schema: an all-empty round may write no data
          // files, and schema inference over none would throw
          df.sparkSession.read.schema(df.schema).parquet(path)
        }
      case None =>
        df => df.localCheckpoint(eager = true)
    }

  private def deleteDir(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true): Unit
  }
}
