package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-query SQL-conf isolation (the alternative to mutating the
  * shared session's conf under a lock): a throwaway `newSession()`
  * carries the overrides — same SparkContext, cached data, and catalog
  * metastore, own SQLConf — and a frame's logical plan is rebound onto
  * it so ITS conf governs planning. Used by the streaming runners
  * (state-partition and state-store-provider overrides) and the AQE
  * skew-join operator (skew thresholds sized to the corpus).
  */
object Sessions {

  /** A throwaway session carrying per-query conf overrides. */
  def isolated(spark: SparkSession,
      overrides: Map[String, String]): SparkSession = {
    val iso = spark.newSession()
    overrides.foreach { case (k, v) => iso.conf.set(k, v) }
    iso
  }

  /** Rebind a frame's logical plan onto another session (same
    * SparkContext): re-analysis happens in the target session, so its
    * conf — not the origin session's — governs planning.
    */
  def rebind(to: SparkSession, df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.Bridge.ofRows(to, df.queryExecution.logical)
}
