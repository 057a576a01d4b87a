package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Trained-merge BPE encoder state: the ordered merge list fitted by
  * [[graft.ops.Bpe.fitMerges]] (Sennrich et al. 2016, public
  * algorithm), compiled to a rank map. One instance is built on the
  * driver and rides to executors as a plan reference object — the
  * "broadcast the merge table, encode map-side" shape: the corpus
  * never moves for encoding, only this table (KBs for any realistic
  * merge count) does.
  *
  * Encoding follows the standard greedy-rank loop: start from the
  * token's code points; while any adjacent symbol pair is in the
  * merge table, merge every (non-overlapping, left-to-right)
  * occurrence of the LOWEST-rank such pair; repeat. Deterministic by
  * construction. A thread-local memo caches token → piece count —
  * natural-language corpora repeat tokens heavily (Zipf), so the
  * amortized cost per row is a hash lookup.
  */
final class BpeTable(val merges: Seq[(String, String)]) extends Serializable {

  /** pair key → merge rank (lower = earlier = higher priority). The
    * key is LENGTH-PREFIXED (`"${a.length}:${a}${b}"`), which is
    * collision-free for ANY symbol content: two pairs collide only if
    * their left lengths match, which forces a==a' and then b==b'. A
    * bare separator character is not safe here — fitted symbols come
    * from space-split corpus text and can legally contain any other
    * character, including NUL.
    */
  private val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      // first occurrence wins if a pair was somehow recorded twice
      m.putIfAbsent(BpeTable.pairKey(a, b), Integer.valueOf(i))
    }
    m
  }

  private def rankOf(a: String, b: String): Int = {
    val r = ranks.get(BpeTable.pairKey(a, b))
    if (r == null) Int.MaxValue else r.intValue()
  }

  /** Encode one token to its BPE pieces. */
  def encode(token: String): Array[String] = {
    if (token.isEmpty) return Array.empty
    // split into code points (a surrogate pair is one symbol)
    var syms = {
      val out = new java.util.ArrayList[String](token.length)
      var i = 0
      while (i < token.length) {
        val cp = token.codePointAt(i)
        out.add(new String(Character.toChars(cp)))
        i += Character.charCount(cp)
      }
      out
    }
    while (syms.size() >= 2) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.size() - 1) {
        val r = rankOf(syms.get(i), syms.get(i + 1))
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) return syms.toArray(new Array[String](syms.size()))
      val next = new java.util.ArrayList[String](syms.size())
      var j = 0
      while (j < syms.size()) {
        if (j < syms.size() - 1 &&
            rankOf(syms.get(j), syms.get(j + 1)) == bestRank) {
          next.add(syms.get(j) + syms.get(j + 1))
          j += 2
        } else {
          next.add(syms.get(j))
          j += 1
        }
      }
      syms = next
    }
    syms.toArray(new Array[String](syms.size()))
  }

  // token → piece count, memoized per thread (no contention, no
  // cross-executor coordination); bounded so a high-cardinality
  // column can't grow it without limit
  // boxed values: a scala.Long value type would silently unbox a
  // missing-key null to 0
  @transient private lazy val memo =
    ThreadLocal.withInitial[java.util.HashMap[String, java.lang.Long]](() =>
      new java.util.HashMap[String, java.lang.Long]())
  private val MemoCap = 1 << 16

  def countPieces(token: String): Long = {
    val m = memo.get()
    val cached = m.get(token)
    if (cached != null) return cached.longValue()
    val n = encode(token).length.toLong
    if (m.size < MemoCap) m.put(token, java.lang.Long.valueOf(n))
    n
  }

  /** Total pieces across a token array (the per-document hot path). */
  def countPiecesAll(toks: ArrayData): Long = {
    var total = 0L
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      if (!toks.isNullAt(i)) total += countPieces(toks.getUTF8String(i).toString)
      i += 1
    }
    total
  }
}

/** `bpe_count_pieces(toks)` — total trained-BPE piece count of a
  * token array, as a single codegen-friendly expression per document
  * (no per-token array materialization, no UDF serialization). The
  * generated code is one call into the reference-object table, so
  * the surrounding WholeStageCodegen span stays intact.
  */
case class BpeCountPieces(child: Expression, table: BpeTable)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_count_pieces expects array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    table.countPiecesAll(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, toks => s"${ev.value} = $tableRef.countPiecesAll($toks);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_count_pieces"
}

/** `bpe_pieces(token)` — the pieces of ONE token as array<string>.
  * The inspection/debug surface (and the spec's merge-assertion
  * hook); the per-doc count path is [[BpeCountPieces]].
  */
case class BpePieces(child: Expression, table: BpeTable)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_pieces expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    BpePieces.piecesArrayData(table, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, tok =>
      s"${ev.value} = graft.functions.BpePieces.piecesArrayData($tableRef, $tok);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_pieces"
}

object BpeTable {
  /** Collision-free rank-map key for a merge pair: the left symbol's
    * length prefix pins the split point, so NO separator character is
    * needed — fitted symbols come from space-split corpus text and
    * may contain anything else (a former NUL-separator scheme was
    * ambiguous for symbols that themselves contained NUL).
    */
  private[functions] def pairKey(a: String, b: String): String =
    new java.lang.StringBuilder(a.length + b.length + 8)
      .append(a.length).append(':').append(a).append(b).toString
}

object BpePieces {
  /** Codegen target: UTF8String in, Spark ArrayData of pieces out. */
  def piecesArrayData(table: BpeTable, tok: UTF8String): ArrayData =
    new GenericArrayData(
      table.encode(tok.toString).map(p => UTF8String.fromString(p): Any))

  def pieces(tok: Column, table: BpeTable): Column =
    ColumnBridge.column(BpePieces(ColumnBridge.expression(tok), table))
}

object BpeCountPieces {
  def count(toks: Column, table: BpeTable): Column =
    ColumnBridge.column(BpeCountPieces(ColumnBridge.expression(toks), table))
}
