package graft.relational

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("seeded sample is reproducible") {
    val df = (1 to 1000).toDF("x")
    val a = Sampling.sample(df, 0.1, seed = 7).collect().map(_.getInt(0)).toSeq
    val b = Sampling.sample(df, 0.1, seed = 7).collect().map(_.getInt(0)).toSeq
    assert(a == b)
    assert(a.nonEmpty && a.length < 400)
  }

  test("seeded randomSplit partitions all rows exactly once") {
    val df = (1 to 1000).toDF("x")
    val Array(l, r) = Sampling.randomSplit(df, Array(0.9, 0.1), seed = 7)
    assert(l.count() + r.count() == 1000)
  }

  test("partition heuristic matches reference formula") {
    assert(Sampling.partitionsForRows(100000) == 10)
    assert(Sampling.partitionsForRows(5) == 2) // min 2
    assert(Sampling.partitionsForRows(1000000, 50000) == 20)
  }

  test("microBatches yields all rows in order without full collect") {
    val df = (1 to 25).toDF("x").coalesce(1)
    val batches = Sampling.microBatches(df, 10).toSeq
    assert(batches.map(_.size) == Seq(10, 10, 5))
    assert(batches.flatten.map(_.getInt(0)) == (1 to 25))
  }

  test("withPersist unpersists even when body throws") {
    val df = (1 to 10).toDF("x")
    intercept[RuntimeException] {
      Caching.withPersist(df)(_ => throw new RuntimeException("boom"))
    }
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }
  test("mixtureSample draws exact per-group target counts, deterministically") {
    import org.apache.spark.sql.functions._
    val df = (0 until 100).map(i => (i.toLong, s"g${i % 4}")).toDF("k", "g")
    val targets = Map("g0" -> 5, "g1" -> 10, "g2" -> 0, "g3" -> 25)
    val out = Sampling.mixtureSample(df, "g", "k", targets)
    val counts = out.groupBy(col("g")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("g0" -> 5L, "g1" -> 10L, "g3" -> 25L), s"$counts")
    // pure function of the data: same picks on a re-run
    val again = Sampling.mixtureSample(df, "g", "k", targets)
      .select(col("k")).collect().map(_.getLong(0)).toSet
    assert(again == out.select(col("k")).collect().map(_.getLong(0)).toSet)
    // a group absent from the targets contributes nothing
    assert(!counts.contains("g2"))
  }

  test("mixtureSampleTemperature flattens shares by integer sqrt weight") {
    import org.apache.spark.sql.functions._
    // sources sized 100 and 4: raw shares 96%/4%; sqrt weights 10/2 →
    // flattened targets at totalN=6: (6*10) DIV 12 = 5, (6*2) DIV 12 = 1
    val df = ((0 until 100).map(i => (i.toLong, "big")) ++
      (100 until 104).map(i => (i.toLong, "small"))).toDF("k", "g")
    val counts = Sampling.mixtureSampleTemperature(df, "g", "k", 6L)
      .groupBy(col("g")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("big" -> 5L, "small" -> 1L), s"$counts")
    // target caps at the group's own size: tiny groups can't upsample
    val capped = Sampling.mixtureSampleTemperature(df, "g", "k", 600L)
      .groupBy(col("g")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(capped("small") == 4L, s"$capped")
  }

  test("mixtureSample caps at group size when the target exceeds it") {
    import org.apache.spark.sql.functions._
    val df = (0 until 10).map(i => (i.toLong, "only")).toDF("k", "g")
    val out = Sampling.mixtureSample(df, "g", "k", Map("only" -> 1000))
    assert(out.count() == 10)
  }

  test("md5-ranked sampling is invariant to physical partitioning") {
    import org.apache.spark.sql.functions._
    val df = (0 until 500).map(i => (i.toLong, s"g${i % 3}")).toDF("k", "g")
    val targets = Map("g0" -> 7, "g1" -> 11, "g2" -> 13)
    def pick(parts: Int): Set[Long] =
      Sampling.mixtureSample(df.repartition(parts), "g", "k", targets)
        .select(col("k")).collect().map(_.getLong(0)).toSet
    assert(pick(1) == pick(13) && pick(13) == pick(32),
      "selection changed with partition count — not a pure function of the data")
  }

  test("mixtureSampleByBudget: budget cut with at-most-one overshoot per group") {
    import org.apache.spark.sql.functions._
    // costs 1..40 over 2 groups
    val df = (0 until 40).map(i => (i.toLong, s"g${i % 2}", (i % 7 + 1).toLong))
      .toDF("k", "g", "cost")
    val budgets = Map("g0" -> 20L, "g1" -> 9L)
    val out = Sampling.mixtureSampleByBudget(df, "g", "k", "cost", budgets)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    // replicate locally: md5-rank within group, take while cum_before < budget
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(k: Long) = md.digest(k.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val local = df.collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
      .groupBy(_._1).flatMap { case (g, rows) =>
        var cum = 0L
        rows.sortBy(r => (h(r._2), r._2)).toSeq.takeWhile { r =>
          val keep = cum < budgets(g); cum += r._3; keep
        }
      }.toSet
    assert(out.toSet == local, s"got ${out.toSet} expected $local")
    // realized cost overshoots by at most the crossing row
    val byGroup = out.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    byGroup.foreach { case (g, tot) =>
      val maxCost = 7L
      assert(tot < budgets(g) + maxCost,
        s"group $g realized $tot vs budget ${budgets(g)}")
    }
    // a group with budget 0 takes nothing
    val none = Sampling.mixtureSampleByBudget(df, "g", "k", "cost",
      Map("g0" -> 0L))
    assert(none.count() == 0)
  }

  test("mixtureSampleApprox: fraction accuracy, determinism, no sort") {
    import org.apache.spark.sql.functions._
    val df = (0 until 20000).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("k", "g")
    val out = Sampling.mixtureSampleApprox(df, "g", "k",
      Map("a" -> 0.3, "b" -> 0.05))
    val counts = out.groupBy(col("g")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // binomial(10000, p): allow 5 sigma
    assert(math.abs(counts("a") - 3000.0) < 5 * math.sqrt(10000 * 0.3 * 0.7),
      s"a: ${counts("a")}")
    assert(math.abs(counts("b") - 500.0) < 5 * math.sqrt(10000 * 0.05 * 0.95),
      s"b: ${counts("b")}")
    // deterministic + partition-invariant
    def pick(parts: Int): Set[Long] =
      Sampling.mixtureSampleApprox(df.repartition(parts), "g", "k",
          Map("a" -> 0.3, "b" -> 0.05))
        .select(col("k")).collect().map(_.getLong(0)).toSet
    assert(pick(3) == pick(17))
    // no Window/Sort in the plan — the scale contract
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.toLowerCase.contains("sortexec"),
      plan)
  }

  test("weightedSample: deterministic, k per group, biased toward weight") {
    import org.apache.spark.sql.functions._
    // 400 keys per group, half weight 8, half weight 1
    val df = (0 until 800).map { i =>
      (if (i % 2 == 0) "a" else "b", i.toLong, if (i < 400) 8 else 1)
    }.toDF("g", "id", "w")
    val s1 = Sampling.weightedSample(df, "g", "id", "w", k = 50)
      .select("g", "id").collect().map(r => (r.getString(0), r.getLong(1)))
    val s2 = Sampling.weightedSample(df, "g", "id", "w", k = 50)
      .select("g", "id").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(s1.sorted.toSeq == s2.sorted.toSeq, "not deterministic")
    assert(s1.count(_._1 == "a") == 50 && s1.count(_._1 == "b") == 50)
    // E-S inclusion: weight-8 rows (ids < 400) should dominate. Per
    // slot P(heavy) ≈ 8/9; over 100 picks the count below 70 has
    // vanishing probability under the scheme
    val heavy = s1.count(_._2 < 400)
    assert(heavy >= 70, s"weight bias too weak: $heavy/100 heavy picks")
  }

  test("weightedSample: bounded top-k aggregate, no per-group window sort") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = (0 until 300).map(i => ("g" + (i % 3), i.toLong, 1 + i % 8))
      .toDF("g", "id", "w")
    val got = Sampling.weightedSample(df, "g", "id", "w", k = 7)
    // plan: ranking runs as a partial-merge aggregate, not a window —
    // a window would sort-shuffle every group row into one task
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_topkminbykey") ||
      plan.toLowerCase.contains("objecthashaggregate"), plan)
    // equivalence: the aggregate ranking equals the window form
    val tickets = df
      .select(col("g"), col("id"),
        explode(sequence(lit(0), col("w") - 1)).as("t"))
      .groupBy(col("g"), col("id"))
      .agg(min(md5(concat(col("id").cast("string"), lit("#"),
        col("t").cast("string")))).as("ticket"))
    val windowForm = tickets
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("ticket"), col("id"))))
      .filter(col("rn") <= 7)
      .select("g", "id").collect().map(r => (r.getString(0), r.getLong(1)))
    val aggForm = got.select("g", "id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(aggForm.sorted.toSeq == windowForm.sorted.toSeq)
  }

  test("weightedSample: out-of-range weight fails loudly") {
    import org.apache.spark.sql.functions._
    val df = Seq(("a", 1L, 0), ("a", 2L, 3)).toDF("g", "id", "w")
    val ex = intercept[Exception] {
      Sampling.weightedSample(df, "g", "id", "w", k = 1).collect()
    }
    assert(ex.getMessage != null)
  }

}
