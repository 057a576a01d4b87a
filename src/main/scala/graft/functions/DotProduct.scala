package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product of two float/double arrays, accumulated in
  * double in ascending index order — bit-identical to the declarative
  * `aggregate(zip_with(a, b, (x,y) => double(x)*double(y)), 0.0, +)`
  * fold it replaces (LlmOps.dotProduct), and therefore to the DuckDB
  * oracle's `list_sum(list_transform(range(1,65), ...))`.
  *
  * Why a custom Expression (SURVEY §2.12 policy step 3): the
  * higher-order-function fold is evaluated interpreted per row —
  * profiling showed the cosine family (q38/q42/q43) spending its time
  * there. This compiles to a tight primitive loop inside whole-stage
  * codegen: no lambda dispatch, no boxing, no intermediate arrays.
  *
  * Null/length semantics match zip_with+aggregate: NULL if either
  * array is NULL, if lengths differ (zip_with pads with NULL), or if
  * any element is NULL.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // result can be NULL (length mismatch / null element) even for
  // non-null children — forces ev.isNull to be a real variable in
  // generated code
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"dot_product expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
    }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = isFloat(left)
    val rf = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  private def accessor(float: Boolean, arr: String, i: String): String =
    if (float) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${accessor(isFloat(left), x, i)} * ${accessor(isFloat(right), y, i)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point (via the graftbridge around Spark 4's
    * private[sql] Column ⇄ Expression conversions).
    */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
