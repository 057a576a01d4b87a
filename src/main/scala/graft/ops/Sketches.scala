package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-memory frequency sketching — the second UDAF exemplar
  * (SURVEY §2.12 policy step 2, alongside Features.HitRateAtK).
  *
  * Problem at 100 TB: "which tokens make up ≥ f of the corpus" via a
  * plain `groupBy(token).count` shuffles EVERY distinct token — on a
  * web corpus that is billions of keys moved to find a few hundred
  * winners. The Misra-Gries summary does it with O(1/f) state per
  * task: a capacity-k summary retains every item with true count
  * > n/(k+1), and summaries MERGE by count-addition + re-prune
  * (Agarwal et al., "Mergeable Summaries", PODS'12 — public result),
  * so the whole corpus reduces through Spark's ordinary partial/final
  * aggregation tree without ever shuffling the long tail.
  *
  * The declared query (q64) uses the sketch for CANDIDATES only, then
  * recounts the ≤ k survivors exactly (a map-side `isin` filter + a
  * k-key aggregation). Output = exactly the tokens with count ≥ n/200:
  * the MG guarantee makes candidates a superset of those, the recount
  * drops false positives, so the result is deterministic and
  * oracle-able even though intermediate sketch contents depend on
  * partition order.
  */
object Sketches {

  /** One Misra-Gries prune step: subtract the (capacity+1)-th largest
    * count from every entry and drop the non-positive — ≤ capacity
    * survivors, each true count under-estimated by at most
    * n/(capacity+1) in total. Shared by the [[MisraGries]] Aggregator
    * and [[StatefulTopK]]'s sketched streaming state, so the two
    * cannot drift.
    */
  private[ops] def mgPrune(m: Map[String, Long], capacity: Int): Map[String, Long] =
    if (m.size <= capacity) m
    else {
      val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
      m.collect { case (t, c) if c > cut => t -> (c - cut) }
    }

  /** Capacity-bounded Misra-Gries summary as a typed `Aggregator`.
    * Buffer is an opaque kryo map (never a declared output column);
    * the result surfaces as a typed array of candidate tokens —
    * tokens are arbitrary strings, so no delimiter encoding is safe.
    */
  class MisraGries(capacity: Int)
      extends Aggregator[String, Map[String, Long], Seq[String]] {
    def zero: Map[String, Long] = Map.empty

    private def prune(m: Map[String, Long]): Map[String, Long] =
      mgPrune(m, capacity)

    def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      prune(b.updated(a, b.getOrElse(a, 0L) + 1L))

    def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
      prune(y.foldLeft(x) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      })

    def finish(r: Map[String, Long]): Seq[String] =
      r.keys.toSeq.sorted

    def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
    def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Heavy hitters: tokens making up ≥ 0.5% of all token occurrences
    * (count·200 ≥ n, integer compare — bit-identical in the oracle).
    * Capacity 200 ⇒ the sketch provably retains everything above
    * n/201 < n/200, so the candidate pass misses nothing.
    *
    * The candidate collect is bounded-by-construction (≤ 200 strings,
    * same pattern as q49's 16 IVF centroids) and re-enters the plan as
    * literals; the exact pass is a map-side filter + a ≤ 200-key
    * aggregation — no full-vocabulary shuffle anywhere.
    */
  def q64HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
    val mg = udaf(new MisraGries(200), Encoders.STRING)
    val row = toks.agg(mg(col("token")).as("cand"), count(lit(1)).as("n")).head()
    val cand = row.getSeq[String](0)
    val n = row.getLong(1)
    toks.filter(col("token").isin(cand: _*))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(200L) >= lit(n))
      .orderBy("token")
  }
}
