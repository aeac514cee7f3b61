package graft.relational

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, "at-tie"), (1L, 20L, "after-both"), (1L, 5L, "before-all"),
    (2L, 10L, "no-right-key")
  ).toDF("k", "t", "tag")

  private def right = Seq(
    (1L, 10L, 100.0), (1L, 15L, 150.0), (3L, 1L, 999.0)
  ).toDF("k", "rt", "price")

  test("matches latest preceding right row; ties inclusive; nulls when none") {
    val out = AsOf.asofJoin(left, right, Seq("k"), "t", "rt", Seq("rt", "price"))
      .collect()
      .map(r => r.getString(2) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out("at-tie") == ((Some(10L), Some(100.0))),
      s"equal timestamps must match (inclusive): $out")
    assert(out("after-both") == ((Some(15L), Some(150.0))))
    assert(out("before-all") == ((None, None)))
    assert(out("no-right-key") == ((None, None)))
  }

  test("rejects payload columns colliding with left") {
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(left, right.withColumnRenamed("price", "tag"),
        Seq("k"), "t", "rt", Seq("tag"))
    }
  }

  test("forward direction matches earliest following right row, ties inclusive") {
    val out = AsOf.asofJoin(left, right, Seq("k"), "t", "rt",
      Seq("rt", "price"), forward = true)
      .collect()
      .map(r => r.getString(2) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out("at-tie") == ((Some(10L), Some(100.0))),
      s"equal timestamps must match forward too: $out")
    assert(out("before-all") == ((Some(10L), Some(100.0))))
    assert(out("after-both") == ((None, None))) // nothing follows t=20
    assert(out("no-right-key") == ((None, None)))
  }

  test("multiple left rows between two right rows all match the earlier one") {
    val l = Seq((1L, 11L, "x"), (1L, 12L, "y"), (1L, 14L, "z")).toDF("k", "t", "tag")
    val out = AsOf.asofJoin(l, right, Seq("k"), "t", "rt", Seq("price"))
      .collect().map(r => r.getString(2) -> r.getDouble(3)).toMap
    assert(out == Map("x" -> 100.0, "y" -> 100.0, "z" -> 100.0))
  }

  test("nearest direction picks the closer side; ties prefer backward") {
    // rights for k=1 at t=10 and t=15:
    //  t=11 → backward 10 (dist 1 < 4); t=14 → forward 15 (1 < 4);
    //  t=12.5 has no integer tie here, so plant an exact tie: a left
    //  at t=20 with rights at 15 and 25
    val l = Seq(
      (1L, 1L, 11L, "near-back"), (2L, 1L, 14L, "near-fwd"),
      (3L, 1L, 3L, "before-all"), (4L, 2L, 10L, "no-right"),
      (5L, 3L, 20L, "exact-tie")
    ).toDF("id", "k", "t", "tag")
    val r = Seq(
      (1L, 10L, 100.0), (1L, 15L, 150.0),
      (3L, 15L, 300.0), (3L, 25L, 350.0)
    ).toDF("k", "rt", "price")
    val out = AsOf.asofJoinNearest(l, r, Seq("k"), "t", "rt",
        Seq("rt", "price"), leftId = "id")
      .collect()
      .map(x => x.getString(3) -> (Option(x.get(4)).map(_.asInstanceOf[Long]),
        Option(x.get(5)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out("near-back") == ((Some(10L), Some(100.0))), out.toString)
    assert(out("near-fwd") == ((Some(15L), Some(150.0))), out.toString)
    // only a following right exists → forward match
    assert(out("before-all") == ((Some(10L), Some(100.0))), out.toString)
    assert(out("no-right") == ((None, None)), out.toString)
    // dist 5 both ways → backward (earlier) wins, pandas semantics
    assert(out("exact-tie") == ((Some(15L), Some(300.0))), out.toString)
    // rightTime must ride in the payload (distance needs it)
    intercept[IllegalArgumentException] {
      AsOf.asofJoinNearest(l, r, Seq("k"), "t", "rt", Seq("price"), "id")
    }
  }
}
