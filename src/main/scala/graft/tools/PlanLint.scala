package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Plan linting: machine-readable scale-shape facts about a physical
  * plan (cartesian products, shuffle/broadcast/scan counts). Used by
  * PlanLintSpec as a regression net over every registered query — a
  * refactor that silently turns a keyed join into a cartesian product
  * (the classic 100 TB job-killer) fails CI instead of the cluster.
  */
object PlanLint {

  final case class Report(
      cartesianProducts: Int,
      shuffles: Int,
      broadcasts: Int,
      parquetScans: Int,
      unpartitionedWindows: Int = 0) {
    def hasCartesian: Boolean = cartesianProducts > 0
    def hasUnpartitionedWindow: Boolean = unpartitionedWindows > 0
  }

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    // walk INTO adaptive plan wrappers and subqueries — a cartesian
    // hidden under AQE still executes
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case other => other.children
    }
    p +: children.flatMap(collectAll)
  }

  def analyze(df: DataFrame): Report = {
    val nodes = collectAll(df.queryExecution.executedPlan)
    Report(
      cartesianProducts = nodes.count(_.isInstanceOf[CartesianProductExec]),
      shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec]),
      broadcasts = nodes.count(_.isInstanceOf[BroadcastExchangeExec]),
      parquetScans = nodes.count(n =>
        n.nodeName.toLowerCase.contains("scan") &&
          n.toString.contains("parquet")),
      // a WindowExec with no partition spec funnels the whole input
      // through ONE task — at 100 TB that is the job-killer sibling
      // of the cartesian product. Bounded-by-construction frames
      // (SeqPack offsets, top-k ranks) declare a non-foldable
      // constant partition key (column × 0; a foldable lit(0) would be
      // optimizer-stripped),
      // which is non-empty and passes.
      unpartitionedWindows = nodes.count {
        case w: org.apache.spark.sql.execution.window.WindowExec =>
          w.partitionSpec.isEmpty
        case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
          w.partitionSpec.isEmpty
        case _ => false
      })
  }
}
