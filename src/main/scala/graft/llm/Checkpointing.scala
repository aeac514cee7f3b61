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
  *   - `localCheckpoint(true)`: fastest (blocks stay in executor
  *     storage), but blocks DIE WITH THE EXECUTOR — on a multi-hour
  *     100 TB job a single lost executor kills the whole fixpoint,
  *     because truncated lineage means nothing can be recomputed;
  *   - reliable `checkpoint(true)` against a cluster-visible directory
  *     (HDFS/object store): each round's rows are written out, so the
  *     loop survives executor loss at the cost of one write per round.
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

  /** The per-round materializer for a fixpoint loop: reliable
    * `checkpoint` when a dir is configured, `localCheckpoint`
    * otherwise. Both are eager and reset the plan to a leaf scan.
    */
  def materializer(spark: SparkSession,
      checkpointDir: Option[String]): DataFrame => DataFrame =
    resolve(spark, checkpointDir) match {
      case Some(dir) =>
        // SparkContext-global, but idempotent for a fixed dir; reliable
        // checkpoint refuses to run without it
        spark.sparkContext.setCheckpointDir(dir)
        df => df.checkpoint(eager = true)
      case None =>
        df => df.localCheckpoint(eager = true)
    }
}
