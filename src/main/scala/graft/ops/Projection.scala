package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Random-projection dimensionality reduction for embedding columns —
  * the Johnson–Lindenstrauss transform with a Rademacher (±1) matrix
  * (Achlioptas 2003: database-friendly random projections; sign
  * entries preserve pairwise distances in expectation exactly like
  * Gaussian entries, with no float matrix to ship). Reducing 64-dim
  * embeddings to 16 dims cuts every downstream ANN scan/shuffle byte
  * count 4× and composes with the whole q38–q93 similarity family.
  *
  * The projection matrix is DETERMINISTIC and engine-neutral: entry
  * sign(i, j) = +1 iff the first hex digit of md5("i_j") < '8' — the
  * q101 trick of using a cryptographic digest both engines implement
  * identically, which makes this one of the rare linear-algebra
  * operators with an exact SQL oracle. Per-term products are
  * micro-rounded then integer-summed (the q70/q100 order-independence
  * rule), and the default `dPrime = 16` makes the 1/√d′ scale an
  * exact power of two — so the ONLY rounding in the whole operator is
  * the one deliberate micro-round per term: no libm, no
  * accumulation-order drift, bit-equal on any engine.
  *
  * Scale shape: the d×d′ sign matrix is built ONCE driver-side (1024
  * md5 calls for 64×16) and embedded as literals; each row is then a
  * pure map-side zip_with/aggregate — NO shuffle, NO per-row hashing,
  * no UDF. The declared query's only exchange is the presentation
  * sort.
  */
object Projection {

  /** Rademacher entry — identical to the oracle's
    * `substring(md5(i || '_' || j), 1, 1) < '8'` derivation.
    */
  private[graft] def signOf(i: Int, j: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"${i}_${j}".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xf) < 8) 1 else -1
  }

  /** Projected vector in micro-units: array of d′ longs, element j =
    * Σ_i round(x_i · sign(i,j) / √d′ · 1e6). `scale` must be exact in
    * binary for the oracle argument to hold (√16 = 4) — callers
    * picking a non-power-of-4 `dPrime` still get a correct projection,
    * just not a bit-exact cross-engine one.
    */
  def projectMicro(vec: Column, dim: Int, dPrime: Int): Column = {
    val scale = math.sqrt(dPrime.toDouble)
    array((0 until dPrime).map { j =>
      val signs = typedLit((0 until dim).map(i => signOf(i, j)))
      aggregate(
        zip_with(vec, signs, (x, s) =>
          round(x.cast("double") * s.cast("double") / lit(scale) *
            lit(1000000.0)).cast("long")),
        lit(0L), (acc, v) => acc + v)
    }: _*)
  }

  /** Projected vector as `array<float>` — drop-in input for the
    * q38/q43/q49 similarity operators (1e-6 quantization is far below
    * embedding noise).
    */
  def project(vec: Column, dim: Int, dPrime: Int): Column =
    transform(projectMicro(vec, dim, dPrime),
      v => (v.cast("double") / lit(1000000.0)).cast("float"))

  /** #107 Dimensionality reduction as a declared query: every
    * embedding's 16-dim Rademacher projection in long format
    * (vec_id, j, v_micro) — atomic columns, integer-exact, oracled.
    */
  def q107DimReduction(spark: SparkSession, dir: String, dim: Int = 64,
      dPrime: Int = 16): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        posexplode(projectMicro(col("embedding"), dim, dPrime)))
      .select(col("vec_id"), col("pos").as("j"), col("col").as("v_micro"))
      .orderBy("vec_id", "j")
}
