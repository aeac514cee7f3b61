package graft.plans

import graft.SparkSpec
import graft.relational.AsOf

class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(99)
  private val rightRows = rnd.shuffle(
    (for (k <- 0L until 6L; t <- 0L until 300L) yield (k, t)).toVector)
    .take(90).map { case (k, t) => (k, t, rnd.nextDouble()) }
  private val leftRows = (1 to 250).map(i =>
    (rnd.nextInt(8).toLong, rnd.nextInt(320).toLong, i.toLong))

  test("native exec agrees with the union+window form on random timelines") {
    val left = leftRows.toDF("k", "t", "row_id")
    val right = rightRows.toDF("k", "rt", "price")
    def collectMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(2) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    val window = collectMap(
      AsOf.asofJoin(left, right, Seq("k"), "t", "rt", Seq("rt", "price")))
    val native = collectMap(
      AsOf.asofJoinNative(left, right, Seq("k"), "t", "rt", Seq("rt", "price")))
    assert(native.size == leftRows.size)
    leftRows.foreach { case (_, _, id) =>
      assert(native(id) == window(id),
        s"row $id: native ${native(id)} != window ${window(id)}")
    }
  }

  test("native forward exec agrees with the window form on random timelines") {
    val left = leftRows.toDF("k", "t", "row_id")
    val right = rightRows.toDF("k", "rt", "price")
    def collectMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(2) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    val window = collectMap(AsOf.asofJoin(left, right, Seq("k"), "t", "rt",
      Seq("rt", "price"), forward = true))
    val native = collectMap(AsOf.asofJoinNative(left, right, Seq("k"), "t",
      "rt", Seq("rt", "price"), forward = true))
    leftRows.foreach { case (_, _, id) =>
      assert(native(id) == window(id),
        s"row $id: native ${native(id)} != window ${window(id)}")
    }
  }

  test("plan: AsOfJoinExec with planner-inserted exchanges and sorts") {
    val left = leftRows.toDF("k", "t", "row_id")
    val right = rightRows.toDF("k", "rt", "price")
    val q = AsOf.asofJoinNative(left, right, Seq("k"), "t", "rt", Seq("price"))
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("AsOfJoin"), physical) // Exec suffix stripped in plan text
    assert("Exchange hashpartitioning".r.findAllIn(physical).length == 2,
      s"both sides must be co-partitioned by key:\n$physical")
    assert(physical.contains("Sort ["), s"per-partition sorts required:\n$physical")
  }

  test("entirely empty right side yields all-null payload, both engines") {
    val left = Seq((1L, 10L, 1L), (2L, 20L, 2L)).toDF("k", "t", "row_id")
    val right = Seq.empty[(Long, Long, Double)].toDF("k", "rt", "price")
    Seq(
      AsOf.asofJoin(left, right, Seq("k"), "t", "rt", Seq("price")),
      AsOf.asofJoinNative(left, right, Seq("k"), "t", "rt", Seq("price")))
      .foreach { df =>
        val rows = df.collect()
        assert(rows.length == 2 && rows.forall(_.isNullAt(3)), df.collect().toSeq)
      }
  }

  test("ties and missing keys behave like the window form") {
    val left = Seq((1L, 10L, 1L), (1L, 5L, 2L), (2L, 10L, 3L))
      .toDF("k", "t", "row_id")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0)).toDF("k", "rt", "price")
    val out = AsOf.asofJoinNative(left, right, Seq("k"), "t", "rt", Seq("price"))
      .collect()
      .map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(out(1L) == Some(100.0)) // inclusive tie
    assert(out(2L) == None)        // before all right rows
    assert(out(3L) == None)        // key absent on right
  }
}
