package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling exemplars for the 100 TB path (SURVEY §4 "AQE +
  * key-salting note"). AQE's skew-join splitting covers joins; these
  * cover the aggregation side, where one hot key (a bot user on the
  * event log, a boilerplate shingle) would otherwise pin a whole
  * partition on one task.
  *
  * Pattern: two-phase aggregation through a salt. Phase 1 aggregates
  * (key, salt) — the hot key's rows spread over `salts` tasks; phase
  * 2 merges the per-salt partials. Works for any aggregation whose
  * merge is associative; the ordered-collect variant below shows the
  * trickiest case (merge = flatten + resort, exact because the sort
  * key travels with the data).
  */
object Skew {

  /** Salted count/sum groupBy: exact same result as
    * `df.groupBy(key).agg(count, sum)` with the hot-key row volume
    * spread across `salts` partials.
    */
  def saltedCountSum(df: DataFrame, key: Column, value: Column,
      salts: Int = 16): DataFrame =
    // row-content hash, never monotonically_increasing_id: a shuffle
    // key must re-evaluate identically on a partial map-stage retry
    df.withColumn("__salt", pmod(xxhash64(df.columns.map(col): _*), lit(salts.toLong)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("pn"), sum(value).as("ps"))
      .groupBy("key")
      .agg(sum("pn").as("n"), sum("ps").as("s"))

  /** Salted ordered collect (the flagship's shape, SURVEY §2 #12):
    * phase 1 collects (sortKey, value) structs per (key, salt); phase
    * 2 flattens the per-salt arrays and sorts ONCE by the carried
    * sort key — deterministic and equal to the unsalted
    * array_sort(collect_list(...)) because sorting commutes with
    * concatenation of sub-multisets.
    */
  def saltedOrderedCollect(df: DataFrame, key: Column, sortKey: Column,
      value: Column, salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(df.columns.map(col): _*), lit(salts.toLong)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(collect_list(struct(sortKey.as("sk"), value.as("v"))).as("part"))
      .groupBy("key")
      .agg(flatten(collect_list(col("part"))).as("parts"))
      .select(col("key"),
        transform(array_sort(col("parts")), x => x.getField("v")).as("values"))

  /** Salted shuffle join for one hot key pinning a task when the
    * small side is too big to broadcast and AQE skew-splitting isn't
    * available (or the partitioning must be explicit): the skewed big
    * side gets a salt, the other side is replicated `salts` times,
    * and the join key becomes (key, salt) — the hot key's rows spread
    * over `salts` tasks. Row-for-row equal to the unsalted join;
    * replication multiplies the small side by `salts`, so pick
    * salts ≈ (hot-key rows / average-key rows), not "big".
    *
    * The salt is a deterministic hash of the big side's FULL row
    * content — a shuffle key must re-evaluate identically on a
    * partial map-stage retry, or reducers that already fetched the
    * first attempt's output see duplicated/missing rows
    * (monotonically_increasing_id is exactly that hazard). Hot-key
    * rows that are full duplicates share a salt and do not spread;
    * at that point dedup first — spreading identical rows is
    * aggregation's job (saltedCountSum), not a join's.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salts.toLong)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
