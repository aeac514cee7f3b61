package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of (nearest-preceding-key temporal) join — the operator
  * behind "join each event to the latest quote/order/click at or before
  * its timestamp". SURVEY §2.2 maps it as a non-equi/bucketed-SMJ
  * category member; DuckDB's `ASOF JOIN` provides the oracle.
  *
  * Physical strategy: the union-and-window formulation, not a range
  * join. Left and right rows are tagged and unioned, then ONE window
  * pass per key (`last(payload, ignoreNulls)` over rows unbounded
  * preceding) carries the most recent right payload forward onto every
  * left row. Cost at 100 TB: a single hash shuffle on the key columns
  * plus a per-key sort — exactly what any join on those keys would
  * shuffle anyway — with NO candidate-pair expansion, unlike a range
  * join whose bucket overlap factor multiplies rows. Ties (right.time
  * equal to left.time) match inclusively, like DuckDB `ON l.t >= r.t`.
  *
  * Skew note: one pathological key sorts in one task; for that shape,
  * pre-bucket the key with a coarse time bucket (salting the window the
  * same way `Skew.saltedJoin` salts a join) and stitch bucket
  * boundaries with a second pass over bucket heads.
  */
object AsOf {

  /** Join each `left` row to the latest `right` row with equal `keys`
    * and `right.rightTime <= left.leftTime` — or, with
    * `forward = true`, the EARLIEST right row with
    * `right.rightTime >= left.leftTime`. Ties match inclusively in
    * both directions.
    *
    * @param rightPayload right columns carried onto matches (must not
    *   collide with left column names); unmatched left rows get nulls
    *   (LEFT-join semantics).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightPayload: Seq[String], forward: Boolean = false): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name ≥1 column")
    val collisions = rightPayload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"rightPayload collides with left columns: $collisions")
    val leftCols = left.columns.toSeq
    // tie-break tag: right rows sort on the WINDOW side of left rows at
    // an equal timestamp (before, for the backward running last();
    // after, for the forward running first()) so `<=`/`>=` ties match
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
    val r = right.select(
      keys.map(col) :+ col(rightTime).as("__t") :+
        struct(rightPayload.map(col): _*).as("__pay"): _*)
      .withColumn("__is_left", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val base = Window.partitionBy(keys.map(col): _*)
    val (w, pick) =
      if (forward) (
        base.orderBy(col("__t").asc, col("__is_left").desc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing),
        first(col("__pay"), ignoreNulls = true))
      else (
        base.orderBy(col("__t").asc, col("__is_left").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow),
        last(col("__pay"), ignoreNulls = true))
    val matched = unioned
      .withColumn("__m", pick.over(w))
      .filter(col("__is_left") === 1)
    matched.select(
      leftCols.map(col) ++
        rightPayload.map(f => col(s"__m.$f").as(f)): _*)
  }

  /** NEAREST as-of join (pandas `merge_asof(direction='nearest')`):
    * each left row matches the right row with equal keys whose time is
    * CLOSEST in either direction — ties prefer the backward (earlier)
    * match, pandas semantics. Composed from one backward and one
    * forward [[asofJoin]] re-joined on `leftId` (a caller-supplied
    * UNIQUE left key — an internally-generated row id would not
    * survive lineage recomputation), with the per-row winner picked by
    * exact integer microsecond distance. Cost: the two single-shuffle
    * as-of passes plus one equi-join on the unique id — still no
    * candidate-pair expansion anywhere.
    *
    * `rightTime` must be included in `rightPayload` (the distance is
    * computed from the matched payload).
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String,
      rightPayload: Seq[String], leftId: String): DataFrame = {
    require(rightPayload.contains(rightTime),
      s"rightPayload must include the right time column $rightTime")
    val leftCols = left.columns.toSeq
    def side(forward: Boolean, tag: String) =
      asofJoin(left, right, keys, leftTime, rightTime, rightPayload,
          forward)
        .select(col(leftId) +:
          rightPayload.map(c => col(c).as(s"__${tag}_$c")): _*)
    val joined = left
      .join(side(forward = false, "b"), Seq(leftId), "left")
      .join(side(forward = true, "f"), Seq(leftId), "left")
    // exact integer distance: µs for timestamps, raw value otherwise
    def ticks(c: org.apache.spark.sql.Column,
        dt: org.apache.spark.sql.types.DataType) = dt match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case _ => c.cast("long")
    }
    val lt = ticks(col(leftTime), left.schema(leftTime).dataType)
    val rdt = right.schema(rightTime).dataType
    val bt = col(s"__b_$rightTime")
    val ft = col(s"__f_$rightTime")
    val distB = abs(lt - ticks(bt, rdt))
    val distF = abs(lt - ticks(ft, rdt))
    val pickBack = ft.isNull || (bt.isNotNull && distB <= distF)
    joined.select(
      leftCols.map(col) ++ rightPayload.map(c =>
        when(pickBack, col(s"__b_$c")).otherwise(col(s"__f_$c"))
          .as(c)): _*)
  }

  /** The custom-operator formulation of the backward as-of join:
    * [[graft.plans.AsOfJoinPlan]] planned by
    * [[graft.plans.AsOfJoinStrategy]] into a single streaming merge
    * pass per co-partition ([[graft.plans.AsOfJoinExec]]) — no union
    * padding, no window buffering. Same semantics as
    * `asofJoin(..., forward = false)`; requires the strategy to be
    * registered (GraftExtensions). Null times must be filtered
    * upstream.
    */
  def asofJoinNative(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightPayload: Seq[String], forward: Boolean = false): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name ≥1 column")
    val collisions = rightPayload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"rightPayload collides with left columns: $collisions")
    import org.apache.spark.sql.graft.Bridge
    val lPlan = Bridge.planOf(left)
    // re-alias every right column: fresh exprIds so a self-join (left and
    // right sharing a scan) can't collide — the analyzer's
    // DeduplicateRelations re-IDs child outputs but cannot rewrite a
    // custom node's key references
    val rPlan = Bridge.planOf(
      right.select(right.columns.toIndexedSeq.map(c => col(c).as(c)): _*))
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name)}"))
    Bridge.ofRows(left.sparkSession, graft.plans.AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      rightPayload.map(attr(rPlan, _)), forward))
  }
}
