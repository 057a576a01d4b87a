package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(s)` — membership probe of a string or long
  * column against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]] (the public sketch
  * `DataFrameStatFunctions.bloomFilter` builds via distributed
  * treeAggregate — strings inserted as UTF-8 bytes, integral columns
  * via putLong; the probe must use the matching call, which the
  * expression picks from the CHILD'S type). The filter rides to
  * executors as a plan reference object, same as every
  * broadcast-small-side pattern in this repo; the generated code is
  * one call per row inside the scan's WholeStageCodegen span.
  *
  * No false negatives (every inserted member answers true), bounded
  * false positives (the fpp chosen at build) — which is exactly the
  * contract a PREFILTER needs: rows that pass still meet the exact
  * join behind it, rows rejected provably cannot match, so the final
  * answer is unchanged while the shuffle carries only the ~hit
  * fraction.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects string or bigint, got $t")
  }

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType => filter.mightContainLong(input.asInstanceOf[Long])
    // mightContainBinary over the UTF8String's own bytes —
    // mightContainString is defined as the UTF-8 binary probe, so
    // this skips the decode-to-java-String + re-encode round trip
    case _ => filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    child.dataType match {
      case LongType =>
        nullSafeCodeGen(ctx, ev, v =>
          s"${ev.value} = $ref.mightContainLong($v);")
      case _ =>
        // getBytes, not toString: same probe (mightContainString IS
        // the UTF-8 binary probe) minus a per-row String allocation
        // inside the WholeStageCodegen span
        nullSafeCodeGen(ctx, ev, s =>
          s"${ev.value} = $ref.mightContainBinary($s.getBytes());")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {
  def mightContain(s: Column, filter: BloomFilter): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(s), filter))
}
