package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Deterministic salt source: xxhash64 over the row's HASHABLE
    * columns only. xxhash64 fails analysis on map-typed columns (maps
    * have no canonical order), so those are excluded — recursively,
    * since a map nested in a struct/array fails the same way. The
    * shuffle-key rule still holds: the salt re-evaluates identically
    * on a partial map-stage retry because it is a pure function of row
    * content.
    */
  private[ops] def hashSupported(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => false
      case a: ArrayType => hashSupported(a.elementType)
      case s: StructType => s.fields.forall(f => hashSupported(f.dataType))
      case _ => true
    }
  }

  private[ops] def rowSalt(df: DataFrame, salts: Int): Column = {
    val cols = df.schema.fields.filter(f => hashSupported(f.dataType)).map(f => col(f.name))
    // no hashable columns: degenerate-but-correct constant salt (no
    // spreading) beats an analysis error on an all-map schema
    val h = if (cols.isEmpty) lit(0L) else xxhash64(cols.toIndexedSeq: _*)
    pmod(h, lit(salts.toLong))
  }

  /** Salted count/sum groupBy: exact same result as
    * `df.groupBy(key).agg(count, sum)` with the hot-key row volume
    * spread across `salts` partials.
    *
    * Caveat (shared with saltedOrderedCollect): the salt is a hash of
    * row CONTENT, so fully duplicate rows land on one salt and do not
    * spread. A hot key made of identical rows should be pre-reduced —
    * `groupBy(all columns).count` first, then salt the (row, n)
    * partials — identical rows carry no per-row information, so
    * collapsing them is always safe for count/sum.
    */
  def saltedCountSum(df: DataFrame, key: Column, value: Column,
      salts: Int = 16): DataFrame =
    // row-content hash, never monotonically_increasing_id: a shuffle
    // key must re-evaluate identically on a partial map-stage retry
    df.withColumn("__salt", rowSalt(df, salts))
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
    *
    * Same duplicate-row caveat as saltedCountSum: identical rows share
    * a salt; dedup-with-multiplicity first if a hot key is all
    * duplicates.
    */
  def saltedOrderedCollect(df: DataFrame, key: Column, sortKey: Column,
      value: Column, salts: Int = 16): DataFrame =
    df.withColumn("__salt", rowSalt(df, salts))
      .groupBy(key.as("key"), col("__salt"))
      .agg(collect_list(struct(sortKey.as("sk"), value.as("v"))).as("part"))
      .groupBy("key")
      .agg(flatten(collect_list(col("part"))).as("parts"))
      .select(col("key"),
        transform(array_sort(col("parts")), x => x.getField("v")).as("values"))

  /** Declared q57: the salted two-phase aggregation as a driver-
    * verified query — per-user event count and exact cents sum over
    * the event log, computed through the salt spread. The salt is
    * invisible in the result (two-phase merge is exact), so the oracle
    * is the PLAIN GROUP BY: the hash-green row proves the skew path
    * answers identically to the direct aggregation.
    */
  def q57SkewSaltedAgg(spark: SparkSession, dir: String): DataFrame =
    // project BEFORE salting: rowSalt hashes every hash-supported
    // column of its input, so an unprojected events frame would drag
    // the full table width (incl. the JSON props) through the scan
    // just to compute the salt; event_id keeps the salt basis unique
    saltedCountSum(
        graft.Tables.events(spark, dir).select("user_id", "event_id", "value"),
        col("user_id"), Relational.cents(col("value")))
      .select(col("key").as("user_id"), col("n"), col("s").as("sum_cents"))
      .orderBy("user_id")

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
    val salted = big.withColumn("__salt", rowSalt(big, salts))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Declared q76: [[saltedJoin]] as a driver-verified query — the
    * event log (skewed big side) joined to customers through the salt
    * spread, rolled up per market segment. Like q57, the salt is
    * invisible in the result (each big-side row meets exactly the one
    * small-side replica carrying its salt), so the oracle is the PLAIN
    * join + GROUP BY — the hash-green row proves the skew path answers
    * identically to the direct join. Projection before salting keeps
    * the salt basis narrow (and event_id keeps it unique), same trap
    * q57 documents.
    */
  def q76SkewSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .select("user_id", "event_id", "value")
    val cust = graft.Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    saltedJoin(ev, cust, "user_id")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(Relational.cents(col("value"))).as("sum_cents"))
      .orderBy("c_mktsegment")
  }
}
