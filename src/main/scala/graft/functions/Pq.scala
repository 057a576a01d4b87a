package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization expression family (Jégou, Douze, Schmid 2011,
  * "Product quantization for nearest neighbor search" — public
  * algorithm). A vector is split into `m` disjoint subspaces of
  * `subDim` dims; each subvector is replaced by the id of its nearest
  * subspace centroid (`k` per subspace, L2). With m=8, k=16 the whole
  * code packs into ONE int (4 bits per subspace) — 64× smaller than
  * the 64-dim float vector it stands for, which is the entire point
  * at 100 TB: the ADC scan reads a 4-byte column, not a 256-byte one.
  *
  * Because subspaces are disjoint coordinates, inner products and
  * squared norms decompose exactly over subspaces, so asymmetric
  * distance computation (ADC) is `m` table lookups per candidate
  * against a per-query table of `m·k` precomputed sub-dots.
  */
object Pq {
  /** codebooks(mi)(ki) = centroid subvector; flattened row-major. */
  final class Codebooks(val m: Int, val k: Int, val subDim: Int,
      val flat: Array[Float]) extends Serializable {
    require(flat.length == m * k * subDim, "codebooks shape mismatch")
    def centroid(mi: Int, ki: Int, d: Int): Float =
      flat((mi * k + ki) * subDim + d)
    /** |x̂|² lookup table: normSq(mi*k + ki) = |centroid(mi,ki)|². */
    @transient lazy val normSq: Array[Double] = {
      val out = new Array[Double](m * k)
      var i = 0
      while (i < m * k) {
        var s = 0.0
        var d = 0
        while (d < subDim) { val v = flat(i * subDim + d); s += v.toDouble * v; d += 1 }
        out(i) = s; i += 1
      }
      out
    }
  }

  /** Nearest-centroid code per subspace, packed 4 bits each
    * (requires k <= 16, m <= 8). Ties break to the LOWEST centroid id
    * (strict < comparison) — deterministic.
    */
  def encode(arr: ArrayData, cb: Codebooks): Int = {
    // Defensive: a malformed embedding (wrong length or null slot)
    // encodes to code 0 instead of reading out-of-bounds/undefined
    // data — the same convention as SignLshBucket (bucket 0).
    val n = arr.numElements()
    if (n != cb.m * cb.subDim) return 0
    var chk = 0
    while (chk < n) { if (arr.isNullAt(chk)) return 0; chk += 1 }
    var code = 0
    var mi = 0
    while (mi < cb.m) {
      var bestK = 0
      var bestD = Double.MaxValue
      var ki = 0
      while (ki < cb.k) {
        var dist = 0.0
        var d = 0
        while (d < cb.subDim) {
          val diff = arr.getFloat(mi * cb.subDim + d).toDouble - cb.centroid(mi, ki, d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestD) { bestD = dist; bestK = ki }
        ki += 1
      }
      code |= bestK << (4 * mi)
      mi += 1
    }
    code
  }

  /** ADC inner product: Σ_m table[m·k + code_m]. Defensive like
    * [[encode]]: a malformed lookup table (wrong length or null
    * slot) scores 0 instead of reading out-of-bounds/undefined
    * array memory (UnsafeArrayData.getFloat has no bounds check).
    * Null checks cover exactly the `m` slots the sum reads — the
    * other m·(k-1) slots are never dereferenced, so scanning them
    * per row (as this once did) bought no safety and cost ~k× the
    * entire scoring loop on the finalist-scan hot path.
    */
  def adc(code: Int, table: ArrayData, m: Int, k: Int): Double = {
    if (table.numElements() != m * k) return 0.0
    var s = 0.0
    var mi = 0
    while (mi < m) {
      val idx = mi * k + ((code >>> (4 * mi)) & 0xF)
      if (table.isNullAt(idx)) return 0.0
      s += table.getFloat(idx)
      mi += 1
    }
    s
  }

  /** |x̂|² of a code via the codebooks' norm table (exact: subspaces
    * are disjoint coordinates, so cross terms vanish).
    */
  def reconNormSq(code: Int, cb: Codebooks): Double = {
    var s = 0.0
    var mi = 0
    while (mi < cb.m) {
      s += cb.normSq(mi * cb.k + ((code >>> (4 * mi)) & 0xF))
      mi += 1
    }
    s
  }
}

/** `pq_encode(embedding)` → packed int code. */
case class PqEncode(child: Expression, cb: Pq.Codebooks)
    extends UnaryExpression {
  require(cb.k <= 16 && cb.m <= 8, "pq_encode packs 4-bit codes into one int")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_encode expects array<float>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    Pq.encode(input.asInstanceOf[ArrayData], cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", cb, classOf[Pq.Codebooks].getName)
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.Pq.encode($arr, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

/** `pq_adc(code, table)` — ADC inner product of a packed code against
  * a per-query lookup table column (m·k floats).
  */
case class PqAdc(left: Expression, right: Expression, m: Int, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (int, array<float>), got ($l, $r)")
    }

  override def nullSafeEval(code: Any, table: Any): Any =
    Pq.adc(code.asInstanceOf[Int], table.asInstanceOf[ArrayData], m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (code, table) =>
      s"${ev.value} = graft.functions.Pq.adc($code, $table, $m, $k);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_adc"
}

/** `pq_recon_norm_sq(code)` — squared norm of the reconstruction. */
case class PqReconNormSq(child: Expression, cb: Pq.Codebooks)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_recon_norm_sq expects int, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    Pq.reconNormSq(input.asInstanceOf[Int], cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", cb, classOf[Pq.Codebooks].getName)
    nullSafeCodeGen(ctx, ev, code =>
      s"${ev.value} = graft.functions.Pq.reconNormSq($code, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pq_recon_norm_sq"
}

object PqEncode {
  def codes(embedding: Column, cb: Pq.Codebooks): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(embedding), cb))
}
object PqAdc {
  def ip(code: Column, table: Column, m: Int, k: Int): Column =
    ColumnBridge.column(PqAdc(ColumnBridge.expression(code),
      ColumnBridge.expression(table), m, k))
}
object PqReconNormSq {
  def normSq(code: Column, cb: Pq.Codebooks): Column =
    ColumnBridge.column(PqReconNormSq(ColumnBridge.expression(code), cb))
}
