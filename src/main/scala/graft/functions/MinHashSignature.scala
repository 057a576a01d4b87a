package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature of a hashed shingle set: for each of `nSeeds`
  * "permutations" i, `min over h in hs of XXH64(h, seed=i)` — one
  * tight two-level loop in generated code instead of `nSeeds`
  * interpreted `array_min(transform(...))` passes (SURVEY §2.12 step
  * 3; profiling showed q37's time in signature evaluation).
  *
  * Deterministic (no RNG state); NULL input → NULL; NULL elements are
  * SKIPPED (a null shingle hash is an absent shingle, not token 0 —
  * the type check admits containsNull arrays from the SQL surface);
  * empty set → Long.MaxValue per seed (callers filter empty docs
  * anyway).
  */
case class MinHashSignature(child: Expression, nSeeds: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<bigint>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val mins = Array.fill(nSeeds)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (!hs.isNullAt(j)) {
        val h = hs.getLong(j)
        var i = 0
        while (i < nSeeds) {
          val v = XXH64.hashLong(h, i.toLong)
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $hs.numElements();
         |long[] $mins = new long[$nSeeds];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($hs.isNullAt($j)) continue;
         |  long $h = $hs.getLong($j);
         |  for (int $i = 0; $i < $nSeeds; $i++) {
         |    long $v = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($h, (long) $i);
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {
  def signature(hs: Column, nSeeds: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(hs), nSeeds))
}
