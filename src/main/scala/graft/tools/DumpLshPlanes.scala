package graft.tools

/** Print the deterministic LSH hyperplane matrices as JSON — the
  * shared spec constants (HMAC-seeded `java.util.Random` gaussians,
  * `Similarity.hyperplanes`) that `tools/sf1_lsh_replay.py` feeds its
  * INDEPENDENT replay of the multiprobe pipeline. Dumping them from
  * the JVM instead of reimplementing `nextGaussian` in Python keeps
  * the replay exact: `StrictMath.log`'s fdlibm rounding differs from
  * libm by an ulp, and an ulp in a plane coefficient can flip a
  * near-zero-margin sign bit.
  *
  * No SparkSession — plane generation is pure JVM.
  *
  * args: dim bits tables [seedPrefix]
  * stdout: {"t0": [ [...], ...], "t1": ...}
  */
object DumpLshPlanes {
  def main(args: Array[String]): Unit = {
    val dim = args(0).toInt
    val bits = args(1).toInt
    val tables = args(2).toInt
    val seedPrefix = args.lift(3).getOrElse("lsh")
    val json = (0 until tables).map { t =>
      val planes = graft.llm.Similarity
        .hyperplanes(dim, bits, s"$seedPrefix/t$t")
      val rows = planes.map(_.map(v =>
        // shortest round-trip decimal: java Double.toString is exact
        // enough for parse-back equality in both Java and Python
        java.lang.Double.toString(v)).mkString("[", ",", "]"))
      s""""t$t":${rows.mkString("[", ",", "]")}"""
    }.mkString("{", ",", "}")
    println(json)
  }
}
