package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Runtime (semi-join) filters: prune the PROBE side of a join with a
  * sketch of the BUILD side's keys before any shuffle happens — the
  * canonical big-join optimization at 100 TB, where shipping probe rows
  * that can never match dominates join cost. Spark injects these itself
  * when stats allow (`spark.sql.optimizer.runtime.bloomFilter.enabled`);
  * this operator is the explicit form for when the build side is
  * filtered by predicates stats can't see through.
  *
  * Correctness contract: a Bloom filter has NO false negatives, so the
  * pruned join's result is byte-identical to the unpruned join — false
  * positives only cost a little wasted shuffle. That is why the pruned
  * query can share the plain join's oracle.
  */
object RuntimeFilter {

  /** Probe rows that *may* have a build-side match: builds a Bloom
    * filter over `build(buildKey)` (one aggregation job on the build
    * side — `DataFrameStatFunctions.bloomFilter`, distributed
    * treeAggregate), broadcasts it, and filters the probe BEFORE any
    * shuffle. Choose `expectedItems` ≈ distinct build keys; the sketch
    * is ~1.2 bytes/key at fpp=0.01 — megabytes where the exact key set
    * would be gigabytes.
    */
  def bloomSemiFilter(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    // The filter is BUILT on the build column's native type but PROBED
    // via mightContainLong on the probe key cast to long. If the build
    // key were a string, the sketch would hash binary while the probe
    // hashes longs — silent FALSE NEGATIVES, i.e. dropped matches.
    // Require integral keys on both sides so build and probe hash the
    // same representation (same guard as Dedup.editDistancePairs).
    val integral = Set("byte", "short", "integer", "long")
    Seq(build.schema(buildKey) -> buildKey, probe.schema(probeKey) -> probeKey)
      .foreach { case (f, name) =>
        require(integral.contains(f.dataType.typeName),
          s"bloomSemiFilter requires integral join keys (the sketch is " +
            s"probed via mightContainLong); '$name' is " +
            s"${f.dataType.simpleString}. Hash or rank non-integral keys " +
            "first.")
      }
    val bf = build.stat.bloomFilter(buildKey, expectedItems, fpp)
    val bc = probe.sparkSession.sparkContext.broadcast(bf)
    // long-typed keys use the sketch's long hash directly; the UDF stays
    // null-safe (null key can never equi-join, so it is pruned)
    val keep = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    probe.filter(keep(col(probeKey).cast("long")))
  }

  /** The full pruned join: probe is bloom-filtered, then equi-joined to
    * the build side. Result ≡ `probe.join(build, probeKey === buildKey)`
    * (no false negatives); the win is the probe rows that never enter
    * the shuffle.
    */
  def bloomPrunedJoin(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame =
    bloomSemiFilter(probe, probeKey, build, buildKey, expectedItems, fpp)
      .join(build, col(probeKey) === col(buildKey))
}
