package graft

import graft.functions.{BpeCountPieces, BpePieces, BpeTable}
import graft.ops.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("fitMerges learns the known merge sequence on the classic fixture") {
    // hand-computed: pair freqs round 1 — (u,g)=20, (p,u)=17, (u,n)=16,
    // (h,u)=15, (g,s)=5, (b,u)=4 → merge (u,g); round 2 best (u,n)=16;
    // round 3 best (h,ug)=15
    val wf = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L), ("hugs", 5L))
    val merges = Bpe.fitMerges(wf, nMerges = 3)
    assert(merges === Seq(("u", "g"), ("u", "n"), ("h", "ug")))
    val table = new BpeTable(merges)
    assert(table.encode("hug").toSeq === Seq("hug"))
    assert(table.encode("bun").toSeq === Seq("b", "un"))
    assert(table.encode("hugs").toSeq === Seq("hug", "s"))
    // unseen word: known merges still apply where its pairs match
    assert(table.encode("mug").toSeq === Seq("m", "ug"))
    assert(table.encode("").toSeq === Seq.empty)
  }

  test("tie-break is deterministic: equal-frequency pairs merge lexicographically smallest first") {
    // (a,b) and (c,d) both appear exactly 3 times
    val merges = Bpe.fitMerges(Seq(("ab", 3L), ("cd", 3L)), nMerges = 2)
    assert(merges === Seq(("a", "b"), ("c", "d")))
  }

  test("zero merges → pieces are code points; piece concatenation always reproduces the token") {
    val empty = new BpeTable(Seq.empty)
    assert(empty.encode("héllo").toSeq === Seq("h", "é", "l", "l", "o"))
    val table = Bpe.fit(Tables.documents(spark, SharedSpark.sfTiny))
    val toks = Tables.documents(spark, SharedSpark.sfTiny)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().limit(200)
      .as[String].collect()
    assert(toks.nonEmpty)
    for (t <- toks) {
      val pieces = table.encode(t)
      assert(pieces.mkString("") === t, s"concat(pieces) != token for '$t'")
      assert(pieces.length >= 1 && pieces.length <= t.length)
      assert(empty.encode(t).length === t.codePointCount(0, t.length))
    }
  }

  test("BpeCountPieces (codegen count path) == size of BpePieces per token") {
    val table = Bpe.fit(Tables.documents(spark, SharedSpark.sfTiny), nMerges = 64)
    val df = Tables.documents(spark, SharedSpark.sfTiny)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        BpeCountPieces.count(col("toks"), table).as("fused"),
        aggregate(transform(col("toks"), t => size(BpePieces.pieces(t, table)).cast("long")),
          lit(0L), (acc, v) => acc + v).as("summed"))
    assert(df.filter(col("fused") =!= col("summed")).count() === 0L)
  }

  test("q85: trained piece counts are bounded by chars and at least the non-empty token count") {
    val r = Bpe.q85TokenCountBpeTrained(spark, SharedSpark.sfTiny)
      .join(Tables.documents(spark, SharedSpark.sfTiny).select("doc_id", "text"), "doc_id")
      .select(col("doc_id"), col("n_ws_tokens"), col("n_pieces_bpe"),
        length(col("text")).as("n_chars"))
      .collect()
    assert(r.nonEmpty)
    for (row <- r) {
      val (nTok, nPieces, nChars) =
        (row.getInt(1).toLong, row.getLong(2), row.getInt(3).toLong)
      // every non-empty token yields ≥1 piece, and a doc has at most
      // as many tokens as chars, so: n_pieces ∈ [1, n_chars]; pieces
      // can never be fewer than whitespace tokens either (each token
      // encodes to ≥1 piece; empty tokens to 0 — hence ≥, not ==)
      assert(nPieces >= 1L, s"doc ${row.getLong(0)}")
      assert(nPieces <= nChars, s"doc ${row.getLong(0)}: $nPieces > $nChars")
      assert(nTok >= 1L)
    }
    // merges actually fire on this corpus: trained counts must beat
    // the no-merge (per-character) encoding somewhere
    val noMerge = new BpeTable(Seq.empty)
    val vs = Tables.documents(spark, SharedSpark.sfTiny)
      .select(split(col("text"), " ").as("toks"))
      .select(BpeCountPieces.count(col("toks"), noMerge).as("chars_enc"))
      .agg(sum("chars_enc")).head().getLong(0)
    val trained = r.map(_.getLong(2)).sum
    assert(trained < vs, s"trained total $trained should be < char-encoding total $vs")
  }

  test("fit-once: q85 + q88 on the same (dir, params) run exactly one distributed fit") {
    // params unique to this test so earlier suites can't have warmed
    // the cache entry; delta-counted so suite order doesn't matter
    val before = Bpe.fitRuns.get()
    Bpe.q85TokenCountBpeTrained(spark, SharedSpark.sfTiny, nMerges = 77).count()
    Bpe.q88SequencePackingBpe(spark, SharedSpark.sfTiny, nMerges = 77).count()
    assert(Bpe.fitRuns.get() - before === 1L,
      "q88 must reuse the table q85 just fitted, not refit")
  }

  test("saveTable/loadTable round-trip: loaded table encodes bit-identically") {
    val fitted = Bpe.fit(
      Tables.documents(spark, SharedSpark.sfTiny), nMerges = 60)
    assert(fitted.merges.nonEmpty)
    val path = java.nio.file.Files.createTempDirectory("graft_bpe_art")
      .resolve("merges.parquet").toString
    Bpe.saveTable(spark, fitted, path)
    val loaded = Bpe.loadTable(spark, path)
    assert(loaded.merges === fitted.merges, "rank order must survive the artifact")
    val words = Tables.documents(spark, SharedSpark.sfTiny)
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().collect().map(_.getString(0))
    words.foreach { w =>
      assert(loaded.encode(w).toSeq === fitted.encode(w).toSeq, s"encode drift on '$w'")
    }
  }

  test("q88 packing equals a local reference pack over q85's counts") {
    val counts = Bpe.q85TokenCountBpeTrained(spark, SharedSpark.sfTiny)
      .select("doc_id", "n_pieces_bpe").as[(Long, Long)].collect().toMap
    val got = Bpe.q88SequencePackingBpe(spark, SharedSpark.sfTiny)
      .select("doc_id", "shard", "n_tokens", "bin", "bin_offset")
      .as[(Long, Int, Long, Int, Int)].collect()
    assert(got.nonEmpty)
    // reference: per shard (doc_id % 8), cumulative fill in doc_id order
    val expected = scala.collection.mutable.Map[Long, (Int, Int)]()
    counts.keys.toSeq.sorted.groupBy(_ % 8).foreach { case (_, ids) =>
      var cum = 0L
      for (id <- ids.sorted) {
        expected(id) = ((cum / 512).toInt, (cum % 512).toInt)
        cum += counts(id)
      }
    }
    for ((id, shard, n, bin, off) <- got) {
      assert(shard === (id % 8).toInt && n === counts(id))
      assert((bin, off) === expected(id), s"doc $id")
    }
  }
}
