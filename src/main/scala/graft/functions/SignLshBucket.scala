package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Fused sign-LSH bucket id of an embedding: `planes` random-
  * hyperplane sign bits for hash table `table`, packed into one long
  * — a single tight two-level loop in generated code, replacing
  * `planes` interpreted `aggregate(zip_with(...))` higher-order folds
  * per row (~planes × dims interpreted closures; the q43 profile's
  * constant factor). Same ladder step as
  * [[MinHashSignature]] (SURVEY §2.12 step 3).
  *
  * Bit-for-bit identical to the HOF form it replaces: weights come
  * from the same splitmix64-style (plane, dim) mix, the per-plane dot
  * product accumulates left-to-right in double (same FP order), and
  * the sign test follows Spark SQL comparison semantics (NaN ≥ 0 is
  * TRUE — NaN sorts largest). A malformed vector (wrong length, null
  * element) makes every plane's dot NULL in the HOF form, zeroing all
  * bits — mirrored here by returning bucket 0.
  */
case class SignLshBucket(child: Expression, table: Int, planes: Int, dims: Int)
    extends UnaryExpression {
  // the bucket is ONE packed long, one bit per plane: planes > 64
  // would shift-wrap (1L << p aliases p mod 64) and silently XOR
  // unrelated planes into the low bits. Enforced at construction on
  // BOTH surfaces (Column API here, SQL literal bounds in
  // GraftFunctions.intLit).
  require(planes >= 1 && planes <= 64,
    s"sign_lsh_bucket: planes must be in [1, 64], got $planes")
  require(dims >= 1, s"sign_lsh_bucket: dims must be positive, got $dims")
  require(table >= 0, s"sign_lsh_bucket: table must be >= 0, got $table")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh_bucket expects array<float>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    SignLshBucket.bucket(input.asInstanceOf[ArrayData], table, planes, dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.SignLshBucket.bucket($arr, $table, $planes, $dims);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "sign_lsh_bucket"
}

object SignLshBucket {

  /** Deterministic pseudo-random hyperplane weight in [-1, 1) from a
    * splitmix64-style integer mix of (plane, dim) — no RNG state,
    * reproducible across engines and runs (public mixing constants,
    * Steele et al. splitmix64).
    */
  def planeWeight(p: Int, d: Int): Double = {
    var z = p.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xBF58476D1CE4E5B9L + 42L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  // executor-local weight matrices, keyed (table, planes, dims) —
  // recomputed per JVM from the deterministic mix instead of being
  // serialized with every task
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  private def weightsFor(table: Int, planes: Int, dims: Int): Array[Double] =
    cache.computeIfAbsent((table, planes, dims), { key =>
      val (t, np, nd) = key
      val w = new Array[Double](np * nd)
      var p = 0
      while (p < np) {
        var d = 0
        while (d < nd) { w(p * nd + d) = planeWeight(t * 1000 + p, d); d += 1 }
        p += 1
      }
      w
    })

  /** Codegen target: packed sign bits of one embedding. */
  def bucket(arr: ArrayData, table: Int, planes: Int, dims: Int): Long = {
    val n = arr.numElements()
    if (n != dims) return 0L
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return 0L; i += 1 }
    val w = weightsFor(table, planes, dims)
    var bits = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      val base = p * dims
      var d = 0
      while (d < dims) { dot += arr.getFloat(d).toDouble * w(base + d); d += 1 }
      // Spark SQL comparison semantics: NaN compares largest, so
      // NaN >= 0 is true (java's primitive >= would say false)
      if (dot >= 0.0 || java.lang.Double.isNaN(dot)) bits |= 1L << p
      p += 1
    }
    bits
  }

  def bucketOf(embedding: Column, table: Int, planes: Int, dims: Int): Column =
    ColumnBridge.column(
      SignLshBucket(ColumnBridge.expression(embedding), table, planes, dims))
}
