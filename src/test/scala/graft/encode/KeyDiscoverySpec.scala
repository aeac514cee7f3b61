package graft.encode

import graft.SparkSpec

class KeyDiscoverySpec extends SparkSpec {
  import spark.implicits._

  test("emits path=value keys for every categorical column in one frame") {
    val df = Seq(("a", 1), ("b", 1), ("a", 2)).toDF("s", "i")
    val keys = KeyDiscovery.discoverKeys(df, Seq("s", "i"))
    assert(keys == Seq("i=1", "i=2", "s=a", "s=b"))
  }

  test("path prefix namespaces the keys") {
    val df = Seq(("x", 7)).toDF("s", "i")
    val keys = KeyDiscovery.discoverKeys(df, Seq("s"), pathPrefix = "root/")
    assert(keys == Seq("root/s=x"))
  }

  test("cardinality cap fails loudly instead of OOMing the driver") {
    val df = (1 to 100).map(i => Tuple1(i.toString)).toDF("s")
    val e = intercept[IllegalArgumentException](
      KeyDiscovery.discoverKeys(df, Seq("s"), maxKeys = 10))
    assert(e.getMessage.contains("cardinality"))
  }

  test("duplicate values collapse to one key (distinct)") {
    val df = Seq("a", "a", "a", "b").toDF("s")
    assert(KeyDiscovery.discoverKeys(df, Seq("s")) == Seq("s=a", "s=b"))
  }
}
