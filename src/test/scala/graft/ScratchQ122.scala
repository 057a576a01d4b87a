package graft

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.LlmOps

/** Throwaway diagnostic for q122 — delete before commit. */
object ScratchQ122 {
  def main(args: Array[String]): Unit = {
    val spark = SharedSpark.spark
    val sf = SharedSpark.sfTiny
    val planted = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        when(col("doc_id") % 2 === 0, concat(col("text"), lit(" qzxplant")))
          .otherwise(col("text")).as("text"),
        (col("doc_id") % 2 === 0).cast("int").as("label"))
      .localCheckpoint()
    for (epochs <- Seq(0, 4, 8); lrv <- Seq(1.0, 4.0)) {
      val (w, b, losses) = LlmOps.fitHashedLr(planted, 4096, epochs, lrv)
      val scored = LlmOps.scoreHashedLr(planted, w, b, 4096)
        .join(planted.select("doc_id", "label"), "doc_id")
      val n = scored.count()
      val correct = scored.filter(
        (col("logit_micro") > 0) === (col("label") === 1)).count()
      println(s"DIAG epochs=$epochs lr=$lrv acc=${correct.toDouble / n} " +
        s"losses=${losses.map(x => f"$x%.4f").mkString(",")} bias=$b " +
        s"wNorm=${math.sqrt(w.map(x => x * x).sum)}")
    }
    // where does the planted token land, and what weight does it get?
    val (w0, _, _) = LlmOps.fitHashedLr(planted, 4096, 0, 1.0)
    val spark2 = spark
    import spark2.implicits._
    val bkt = Seq("qzxplant").toDF("tok")
      .select(pmod(xxhash64(col("tok")), lit(4096L)).as("b"))
      .head().getLong(0).toInt
    println(s"DIAG plantedBucket=$bkt w0=${w0(bkt)}")
    // margin distribution by label at init
    LlmOps.scoreHashedLr(planted, w0, 0.0, 4096)
      .join(planted.select("doc_id", "label"), "doc_id")
      .groupBy("label").agg(avg("logit_micro"), stddev("logit_micro"),
        min("logit_micro"), max("logit_micro"))
      .show(false)
    spark.stop()
  }
}
