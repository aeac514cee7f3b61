package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (expectation suites): each rule is a
  * named pair of aggregate expressions — a numeric `metric` and a
  * boolean `passed` derived from it — and a whole suite evaluates in
  * ONE aggregation job regardless of rule count (every rule is just
  * another agg column in the same pass; Catalyst gives the scan +
  * partial aggregation for free). That single-pass shape is the point
  * at 100 TB: a validation suite must not cost one table scan per rule.
  *
  * The output is one row per rule `(rule, metric, passed)` so sinks,
  * alerting, and the driver's oracle compare all see a plain
  * DataFrame.
  */
object DataQuality {

  /** One expectation: `metric` is any aggregate expression over the
    * checked frame; `passed` the boolean aggregate verdict (usually a
    * comparison over the same aggregate — Catalyst dedups the shared
    * subexpression in the single agg pass).
    */
  final case class DqRule(name: String, metric: Column, passed: Column)

  /** Null-fraction expectation (the most common DQ rule). */
  def nullFraction(c: String, atMost: Double): DqRule = {
    val frac = avg(when(col(c).isNull, 1.0).otherwise(0.0))
    DqRule(s"${c}_null_frac", frac, frac <= atMost)
  }

  /** Key-uniqueness expectation: distinct count equals row count. */
  def unique(c: String): DqRule =
    DqRule(s"${c}_unique", countDistinct(col(c)).cast("double"),
      countDistinct(col(c)) === count(lit(1)))

  /** Range expectation over a column's observed min. */
  def minAtLeast(c: String, bound: Double): DqRule =
    DqRule(s"${c}_min", min(col(c)).cast("double"), min(col(c)) >= bound)

  /** Range expectation over a column's observed max. */
  def maxAtMost(c: String, bound: Double): DqRule =
    DqRule(s"${c}_max", max(col(c)).cast("double"), max(col(c)) <= bound)

  /** Evaluate a suite in one aggregation job → (rule, metric, passed)
    * rows, ordered by rule name for deterministic output.
    */
  def check(df: DataFrame, rules: Seq[DqRule]): DataFrame = {
    require(rules.nonEmpty, "empty DQ suite")
    val dupes = rules.groupBy(_.name).filter(_._2.size > 1).keys
    require(dupes.isEmpty,
      s"duplicate rule names would collide in the agg row: " +
        dupes.mkString(", "))
    // a rule whose verdict is NULL (e.g. avg/min over an empty or
    // all-null frame) did NOT pass — a DQ gate must fail closed
    val aggs = rules.flatMap(r => Seq(
      r.metric.cast("double").as(s"${r.name}__metric"),
      coalesce(r.passed, lit(false)).as(s"${r.name}__passed")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.map(r => struct(
        lit(r.name).as("rule"),
        col(s"${r.name}__metric").as("metric"),
        col(s"${r.name}__passed").as("passed"))): _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.metric").as("metric"),
        col("r.passed").as("passed"))
      .orderBy(col("rule"))
  }

  /** Referential-integrity expectation — needs a join, so it runs as
    * its own (anti-join + count) job rather than inside [[check]]'s
    * single pass. The parent side is usually a dimension: broadcast.
    * Returns the same (rule, metric, passed) shape; metric = orphan
    * row count.
    */
  def refIntegrity(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String,
      broadcastParent: Boolean = true): DataFrame = {
    val p = parent.select(col(parentKey).as("__pk")).distinct()
    val pSide = if (broadcastParent) broadcast(p) else p
    child.join(pSide, col(childKey) === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("orphans"))
      .select(
        lit(s"${childKey}_in_$parentKey").as("rule"),
        col("orphans").cast("double").as("metric"),
        (col("orphans") === 0).as("passed"))
  }
}
