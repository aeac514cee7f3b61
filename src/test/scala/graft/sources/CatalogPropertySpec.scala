package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.catalog.GraftCatalog

/** Randomized invariants of the catalog's snapshot machinery — the
  * properties the hand-written specs pin on fixed sequences must hold
  * on ARBITRARY DML histories:
  *
  *  - CHANGE-FEED FOLD: starting from any snapshot v and folding the
  *    (v, current] feed (inserts add, deletes remove, as multisets)
  *    reproduces the current table exactly — for every v, on every
  *    random mix of INSERT / DELETE / OVERWRITE / UPDATE.
  *  - SNAPSHOT IMMUTABILITY: a version's contents never change as
  *    later commits land.
  *  - OPTIMISTIC CONCURRENCY: concurrent appenders with a guarded
  *    replacer either commit against the true base or retry — no
  *    committed append is ever silently lost.
  */
class CatalogPropertySpec extends SparkSpec {
  import spark.implicits._

  spark.conf.set("spark.sql.catalog.graft_cat",
    classOf[GraftCatalog].getName)

  private def rows(tbl: String): Seq[(Long, Long)] =
    spark.sql(s"SELECT id, v FROM $tbl")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  private def asMultiset(s: Seq[(Long, Long)]): Map[(Long, Long), Int] =
    s.groupBy(identity).view.mapValues(_.size).toMap

  test("change feed folds any random DML history back to the current state") {
    for (seed <- Seq(11, 22, 33)) {
      GraftCatalog.reset()
      val rnd = new scala.util.Random(seed)
      spark.sql("CREATE TABLE graft_cat.ns.prop (id BIGINT, v BIGINT)")
      var nextId = 0L
      val snapshots = scala.collection.mutable.ArrayBuffer
        .empty[Map[(Long, Long), Int]]
      snapshots += asMultiset(rows("graft_cat.ns.prop")) // v0
      (1 to 10).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 | 1 => // INSERT 1-3 rows (dup values on purpose)
            val vals = (0 until 1 + rnd.nextInt(3)).map { _ =>
              nextId += 1
              s"(${nextId % 7}, ${rnd.nextInt(3)})"
            }.mkString(", ")
            spark.sql(s"INSERT INTO graft_cat.ns.prop VALUES $vals")
          case 2 => // DELETE by predicate (may be a no-op)
            spark.sql(
              s"DELETE FROM graft_cat.ns.prop WHERE v = ${rnd.nextInt(3)}")
          case 3 => // UPDATE via the row-level rewrite
            spark.sql(s"UPDATE graft_cat.ns.prop SET v = v + 10 " +
              s"WHERE id = ${rnd.nextInt(7)}")
        }
        snapshots += asMultiset(rows("graft_cat.ns.prop"))
      }
      val cur = snapshots.last
      // fold the (v, latest] feed onto EVERY earlier snapshot
      snapshots.indices.dropRight(1).foreach { v =>
        val (feed, sch) =
          GraftCatalog.changeFeed("ns.prop", v, snapshots.size - 1)
        val (ii, vi) = (sch.fieldIndex("id"), sch.fieldIndex("v"))
        var state = snapshots(v)
        feed.foreach { case (_, t, r) =>
          val k = (r.getLong(ii), r.getLong(vi))
          val delta = if (t == "insert") 1 else -1
          val n = state.getOrElse(k, 0) + delta
          assert(n >= 0, s"feed deleted a row not in state: $k at v=$v")
          state = if (n == 0) state - k else state + (k -> n)
        }
        assert(state == cur,
          s"seed=$seed from v=$v folded=$state current=$cur")
        // and the snapshot itself is still immutable
        assert(asMultiset(spark.sql(
          s"SELECT id, v FROM graft_cat.ns.prop VERSION AS OF $v")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
          == snapshots(v))
      }
    }
  }

  test("concurrent appends never lose rows under the replace guard") {
    GraftCatalog.reset()
    spark.sql("CREATE TABLE graft_cat.ns.occ2 (id BIGINT, v BIGINT)")
    val threads = 4
    val perThread = 5
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val fails = new java.util.concurrent.atomic.AtomicInteger(0)
    (0 until threads).foreach { t =>
      pool.submit(new Runnable {
        def run(): Unit =
          try (0 until perThread).foreach { i =>
            spark.sql(
              s"INSERT INTO graft_cat.ns.occ2 VALUES (${t * 100 + i}, 1)")
          } catch { case _: Throwable => fails.incrementAndGet(): Unit }
      })
    }
    pool.shutdown()
    pool.awaitTermination(2, java.util.concurrent.TimeUnit.MINUTES)
    assert(fails.get() == 0, s"${fails.get()} appender threads failed")
    // appends commute: every committed row is present
    assert(spark.sql("SELECT count(*) FROM graft_cat.ns.occ2")
      .collect().head.getLong(0) == (threads * perThread).toLong)
    // a guarded replace retried against a moving base still lands
    // exactly once, and loses nothing committed before its base read
    var done = false
    var attempts = 0
    while (!done && attempts < 10) {
      attempts += 1
      val base = GraftCatalog.currentVersion("ns.occ2")
      try {
        GraftCatalog.overwriteIfBase("ns.occ2",
          Seq(org.apache.spark.sql.Row(999L, 9L)), base)
        done = true
      } catch {
        case _: java.util.ConcurrentModificationException => ()
      }
    }
    assert(done, "guarded replace never landed")
    assert(rows("graft_cat.ns.occ2") == Seq((999L, 9L)))
  }
}
