package graft.encode

import java.nio.charset.StandardCharsets.UTF_8
import java.util.UUID

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** T-5/T-6: deterministic parameter identity and initialization.
  *
  * Every feature parameter is globally named by its feature key (a
  * "path=value" string for categorical representations, a bare path for
  * numeric transforms). The key maps to
  *   - a UUIDv3 identity (`UUID.nameUUIDFromBytes`, reference
  *     `DataframeModeler.scala:213-215`), and
  *   - an HMAC-SHA1-derived RNG seed (reference
  *     `DataframeModeler.scala:260-264` keyed by the companion class name;
  *     the same literal key is kept here so vectors are reproducible
  *     against the reference's scheme), from which the initial tensor is
  *     drawn (reference `ModelingStrategy.scala:45-57`: uniform [0,1)
  *     doubles, then scaled to RMS 1).
  *
  * Because init is a pure function of the key, executors can materialize
  * a representation for a key they have never seen without any driver
  * round-trip — the property that lets encoding run over 100 TB without
  * a complete driver-side key table.
  */
object Deterministic {

  /** Reference parity: seed key = companion object's simple class name
    * (reference `DataframeModeler.scala:224`, `getClass.getSimpleName`).
    */
  val SeedKey: Array[Byte] = "DataframeModeler$".getBytes(UTF_8)

  /** First 8 bytes of HMAC-SHA1(seedKey, value), little-endian — the same
    * long Guava's `HashCode.asLong()` yields on the reference path.
    */
  def seedFor(value: String, seedKey: Array[Byte] = SeedKey): Long = {
    val mac = Mac.getInstance("HmacSHA1")
    mac.init(new SecretKeySpec(seedKey, "HmacSHA1"))
    val d = mac.doFinal(value.getBytes(UTF_8))
    (0 until 8).foldLeft(0L)((acc, i) => acc | ((d(i) & 0xffL) << (8 * i)))
  }

  /** UUIDv3 parameter identity (reference `DataframeModeler.scala:213-215`). */
  def uuidFor(key: String): UUID = UUID.nameUUIDFromBytes(key.getBytes(UTF_8))

  /** T-1 init: seeded uniform [0,1) vector normalized to RMS 1 (reference
    * `ModelingStrategy.scala:45-57`).
    */
  def representation(key: String, dim: Int,
      seedKey: Array[Byte] = SeedKey): Array[Double] = {
    val rnd = new java.util.Random(seedFor(key, seedKey))
    val arr = Array.fill(dim)(rnd.nextDouble())
    val rms = math.sqrt(arr.map(x => x * x).sum / dim)
    if (rms == 0.0) arr else arr.map(_ / rms)
  }

  /** T-3: frozen one-hot label vector at index value−1 (reference
    * `CategorizingModelingStrategy.scala:27-41`).
    */
  def oneHot(value: Int, categories: Int): Array[Double] = {
    require(value >= 1 && value <= categories,
      s"label value $value outside 1..$categories")
    val arr = new Array[Double](categories)
    arr(value - 1) = 1.0
    arr
  }

  /** T-2 init: weights of the learned affine map `f(x) = W·[1, z]`
    * (reference `ModelingStrategy.scala:59-70`: powers 0..mappingPower-1 of
    * the z-score feed a FullyConnectedLayer([mappingPower] → [dim])).
    *
    * Deviation (documented): the reference creates a seeded RNG here but
    * never uses it — its FC weights come from MindsEye's unseeded default
    * init, so reference transforms are NOT reproducible run-to-run. Ours
    * draws from the key-seeded RNG (uniform [-1,1) scaled by
    * 1/√mappingPower) so the whole model state is a pure function of the
    * schema + data stats.
    *
    * Returns `weights(p)(k)` = weight from power p to output k.
    */
  def transformWeights(path: String, dim: Int, mappingPower: Int = 2,
      seedKey: Array[Byte] = SeedKey): Array[Array[Double]] = {
    val rnd = new java.util.Random(seedFor(path, seedKey))
    val scale = 1.0 / math.sqrt(mappingPower.toDouble)
    Array.fill(mappingPower)(Array.fill(dim)((rnd.nextDouble() * 2 - 1) * scale))
  }
}
