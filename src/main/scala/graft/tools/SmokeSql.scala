package graft.tools

import graft.core.GraftSession

/** Smoke main: a GraftSession-built session must expose graft SQL
  * functions (extension wiring) and run a fixture query end-to-end.
  */
object SmokeSql {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[2]",
      shufflePartitions = 2).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS same, " +
        "graft_cosine(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS ortho")
      .collect().head
    println(s"SMOKE graft_cosine same=${r.getDouble(0)} ortho=${r.getDouble(1)}")
    spark.stop()
  }
}
