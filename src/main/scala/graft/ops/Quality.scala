package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dbt-style data tests as first-class engine operations (the
  * reference's only declarative tests: `unique` + `not_null` on
  * nep_session_events.SESSION_ID, schema.yml:9-13; relationship
  * tests are the semi/anti-join shape of q09). Each check returns the
  * VIOLATION rows — empty result means the expectation holds, so the
  * checks compose into pipelines and scheduled audits the same way
  * `dbt test` gates runs.
  */
object Quality {

  /** Rows whose key occurs more than once (dbt `unique`). */
  def expectUnique(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("n_dupes"))
      .filter(col("n_dupes") > 1)

  /** Rows with a NULL in any listed column (dbt `not_null`). */
  def expectNotNull(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(cols.map(col(_).isNull).reduce(_ || _))

  /** Rows whose value is outside the accepted set (dbt `accepted_values`). */
  def expectAcceptedValues(df: DataFrame, c: String, accepted: Seq[String]): DataFrame =
    df.filter(!col(c).isin(accepted: _*))

  /** Child rows with no matching parent key (dbt `relationships`) —
    * the left-anti shape of q09.
    */
  def expectRelationship(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
      Seq(childKey), "left_anti")

  /** Rows violating an arbitrary predicate expectation. */
  def expectTrue(df: DataFrame, predicate: Column): DataFrame =
    df.filter(!predicate || predicate.isNull)

  /** Run a batch of named checks; returns (name, violations) — a
    * pipeline gate fails if any count is nonzero.
    */
  def runChecks(checks: (String, DataFrame)*): Seq[(String, Long)] =
    checks.map { case (name, v) => name -> v.count() }

  /** Declared q67: the dbt-test audit as ONE distributed query — each
    * check reduced to its violation count and unioned into a (check,
    * n_violations) report. This is `dbt test` run inside the engine:
    * the union of independent aggregates executes as parallel stages
    * of one job, each check a partial-agg count with no data movement
    * beyond its own shuffle. The hash-green row proves the checks
    * return the same verdicts as the oracle SQL running the same
    * assertions (all four pass on the harness data, and the count
    * column - not emptiness - is what the driver hashes, so a
    * regression that introduces violations flips the row red).
    */
  def q67DataQualityAudit(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val orders = graft.Tables.orders(spark, dir)
    val customer = graft.Tables.customer(spark, dir)
    def report(name: String, violations: DataFrame): DataFrame =
      violations.agg(count(lit(1)).cast("long").as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"))
    report("accepted_values_orderstatus",
        expectAcceptedValues(orders, "o_orderstatus", Seq("F", "O", "P")))
      .unionByName(report("not_null_custkey",
        expectNotNull(orders, Seq("o_custkey"))))
      .unionByName(report("relationship_orders_customer",
        expectRelationship(orders, "o_custkey", customer, "c_custkey")))
      .unionByName(report("unique_orderkey",
        expectUnique(orders, Seq("o_orderkey"))))
      .orderBy("check_name")
  }
}
