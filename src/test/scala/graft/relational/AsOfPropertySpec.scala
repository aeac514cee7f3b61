package graft.relational

import graft.SparkSpec

/** Randomized reference checks (seeded — deterministic in CI): the
  * union+window as-of must agree with a brute-force per-row scan on
  * arbitrary keyed timelines, both directions, including timestamp
  * collisions between left and right.
  */
class AsOfPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(4242)
  // right (key, time) pairs unique: tie order among duplicate right rows
  // at one instant is unspecified in ANY as-of engine
  private val rightRows = rnd.shuffle(
    (for (k <- 0L until 8L; t <- 0L until 400L) yield (k, t)).toVector)
    .take(120).map { case (k, t) => (k, t, rnd.nextDouble()) }
  private val leftRows = (1 to 300).map(i =>
    (rnd.nextInt(10).toLong, rnd.nextInt(420).toLong, i.toLong))

  private def bruteBackward(k: Long, t: Long): Option[Double] =
    rightRows.filter(r => r._1 == k && r._2 <= t)
      .sortBy(_._2).lastOption.map(_._3)

  private def bruteForward(k: Long, t: Long): Option[Double] =
    rightRows.filter(r => r._1 == k && r._2 >= t)
      .sortBy(_._2).headOption.map(_._3)

  test("backward as-of equals brute-force reference on 300 random rows") {
    val left = leftRows.toDF("k", "t", "row_id")
    val right = rightRows.toDF("k", "rt", "price")
    val got = AsOf.asofJoin(left, right, Seq("k"), "t", "rt", Seq("price"))
      .collect()
      .map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    leftRows.foreach { case (k, t, id) =>
      assert(got(id) == bruteBackward(k, t),
        s"row $id (k=$k t=$t): got ${got(id)}, want ${bruteBackward(k, t)}")
    }
  }

  test("forward as-of equals brute-force reference on 300 random rows") {
    val left = leftRows.toDF("k", "t", "row_id")
    val right = rightRows.toDF("k", "rt", "price")
    val got = AsOf.asofJoin(left, right, Seq("k"), "t", "rt", Seq("price"),
        forward = true)
      .collect()
      .map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    leftRows.foreach { case (k, t, id) =>
      assert(got(id) == bruteForward(k, t),
        s"row $id (k=$k t=$t): got ${got(id)}, want ${bruteForward(k, t)}")
    }
  }
}
