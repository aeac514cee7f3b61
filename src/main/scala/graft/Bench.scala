package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. A failing query is reported under "errors" with
  * its exception — never silently folded into a timing (a crash must not
  * look like a fast run).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }

    // JIT/codegen warmup so the alphabetically-first query doesn't absorb
    // first-job overhead into its timing: one scan-agg query, plus the
    // shingle-UDF path over a 100-row slice (JIT only — a LIMIT cannot
    // cache or precompute anything the timed queries reuse)
    try {
      SparkEntry.queries.get("q1_pricing_summary")
        .foreach(fn => fn(spark, sfDir).count())
      // the heaviest codegen/JIT paths, each over a tiny LIMIT slice:
      // nothing here caches data or precomputes results a timed query
      // could reuse — it only compiles the generated code once
      val docSlice = graft.sources.Tables.documents(spark, sfDir).limit(50)
      graft.llm.Dedup.jaccardJoinExact(docSlice, "doc_id", "text")
        .count(): Unit
    } catch { case _: Throwable => () }

    // optional positional args restrict the run to the named queries
    // (iteration aid; the driver passes none and times everything)
    val only = args.toSet
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable => errors(name) = e.toString.take(300)
      }
    }
    val qs = timings.map { case (k, v) => s""""${esc(k)}":$v""" }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    val total = timings.values.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
