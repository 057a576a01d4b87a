package graft

import graft.ops.{Features, Relational, Scalars}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operator invariants the DuckDB oracle can't express (approximate
  * ops, laws, edge cases) on sf0.001 + tiny in-memory frames.
  */
class OperatorSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  val sf = SharedSpark.sfTiny

  test("q14: approx_count_distinct within 5% of exact") {
    val approx = Relational.q14AggApproxDistinct(spark, sf).collect()(0)
    val li = Tables.lineitem(spark, sf)
    val exact = li.agg(
      countDistinct(col("l_orderkey")), countDistinct(col("l_partkey")),
      countDistinct(col("l_suppkey"))).collect()(0)
    for (i <- 0 until 3) {
      val a = approx.getLong(i).toDouble
      val e = exact.getLong(i).toDouble
      assert(math.abs(a - e) / e <= 0.05, s"col $i: approx $a vs exact $e")
    }
  }

  test("q29: split fractions are ~90/10 and time-consistent") {
    val s = Features.q29TimeSplit(spark, sf).cache()
    val n = s.count().toDouble
    val nTrain = s.filter(col("split") === "train").count().toDouble
    assert(math.abs(nTrain / n - 0.9) < 0.01)
    // every train order date <= every test order date
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_orderdate")
    val j = s.join(ord, "o_orderkey")
    // o_orderdate is parquet timestamp-without-tz -> TIMESTAMP_NTZ -> LocalDateTime
    val maxTrain = j.filter(col("split") === "train").agg(max("o_orderdate"))
      .collect()(0).getAs[java.time.LocalDateTime](0)
    val minTest = j.filter(col("split") === "test").agg(min("o_orderdate"))
      .collect()(0).getAs[java.time.LocalDateTime](0)
    assert(!maxTrain.isAfter(minTest))
  }

  test("padTo: length invariant and content (pad / truncate / exact)") {
    val df = Seq(
      (1, Seq(7L)), (2, Seq(1L, 2L, 3L, 4L)), (3, (1L to 25L).toSeq)
    ).toDF("id", "a")
    val got = df.select(col("id"), Scalars.padTo(col("a"), 4, lit(0L)).as("p"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(got(1) === Seq(0L, 0L, 0L, 7L))
    assert(got(2) === Seq(1L, 2L, 3L, 4L))
    assert(got(3) === Seq(22L, 23L, 24L, 25L)) // keep LAST n (Keras maxlen)
  }

  test("q09: semi and anti partition the customer set") {
    val r = Relational.q09JoinSemiAnti(spark, sf).cache()
    val nCust = Tables.customer(spark, sf).count()
    assert(r.count() === nCust)
    assert(r.select("c_custkey").distinct().count() === nCust)
  }

  test("q10: as-of prior view is at or before the purchase (ms)") {
    val ev = Tables.events(spark, sf).select("event_id", "ts_ms")
    val r = Relational.q10JoinAsofRange(spark, sf)
      .filter(col("prior_view_id") =!= -1L)
      .join(ev.withColumnRenamed("event_id", "purchase_id")
        .withColumnRenamed("ts_ms", "p_ms"), "purchase_id")
      .join(ev.withColumnRenamed("event_id", "prior_view_id")
        .withColumnRenamed("ts_ms", "v_ms"), "prior_view_id")
    assert(r.filter(col("v_ms") > col("p_ms")).count() === 0)
    assert(r.count() > 0)
  }

  test("q15: rollup grand total equals sum of leaves") {
    val r = Relational.q15RollupGroupingSets(spark, sf).cache()
    val leaves = r.filter(col("rf") =!= "ALL" && col("ls") =!= "ALL")
      .agg(sum("sum_qty_cents"), sum("n")).collect()(0)
    val total = r.filter(col("rf") === "ALL" && col("ls") === "ALL")
      .select("sum_qty_cents", "n").collect()(0)
    assert(leaves.getLong(0) === total.getLong(0))
    assert(leaves.getLong(1) === total.getLong(1))
  }

  test("q31 HR@k Aggregator matches the relational formulation") {
    val data = Seq(
      (Seq(1, 2, 3), 2), (Seq(4, 5, 6), 9), (Seq(7, 8, 9), 7), (Seq(1, 1, 1), 5)
    )
    val agg = new Features.HitRateAtK(3)
    val ds = data.toDS()
    val got = ds.select(udaf(agg).apply(col("_1"), col("_2"))).collect()(0).getDouble(0)
    assert(got === 0.5) // rows 1 and 3 hit
  }

  test("dedup idempotence: q36 keepers are unique and cover all docs") {
    val d = ops.LlmOps.q36DedupExact(spark, sf).cache()
    val docs = Tables.documents(spark, sf).count()
    assert(d.agg(sum("n")).collect()(0).getLong(0) === docs)
    assert(d.select("keep_id").distinct().count() === d.count())
  }

  test("q26: slice/last/pad agree with each other") {
    // padded / all_but_last are pipe-joined strings (scalar-only
    // declared outputs); split them back to check the array algebra.
    val r = Scalars.q26ArrayFuncs(spark, sf)
      .withColumn("padded_a", split(col("padded"), "\\|"))
      .withColumn("abl_a",
        when(col("all_but_last") === "", array().cast("array<string>"))
          .otherwise(split(col("all_but_last"), "\\|")))
      .cache()
    assert(r.filter(size(col("padded_a")) =!= 20).count() === 0)
    assert(r.filter(size(col("abl_a")) =!= col("n") - 1).count() === 0)
    // last_el == last of padded when group nonempty
    assert(r.filter(element_at(col("padded_a"), -1).cast("long") =!= col("last_el")).count() === 0)
    r.unpersist()
  }

  test("q67: all dbt-style checks hold on the harness data") {
    val got = graft.ops.Quality.q67DataQualityAudit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size === 4)
    assert(got.values.forall(_ === 0L), got.toString)
  }

  test("q68 funnel laws: converted <= viewers; a seeded conversion is counted") {
    import spark.implicits._
    val got = Features.q68FunnelConversion(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1), r.toString)
    }
    // fixture: u1 view->purchase converts; u2 purchase-before-view
    // does not; u3 view only does not. ts is written as raw ns longs,
    // the on-disk shape Tables.events expects.
    val tmp = java.nio.file.Files.createTempDirectory("graft_funnel").toString
    val t0ns = 1700000000000000000L
    def ev(u: Long, t: String, offMin: Long) =
      (u, u * 10 + offMin, t, t0ns + offMin * 60000000000L)
    Seq(ev(1, "view", 1), ev(1, "purchase", 2),
        ev(2, "purchase", 1), ev(2, "view", 2),
        ev(3, "view", 1))
      .toDF("user_id", "event_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val fx = Features.q68FunnelConversion(spark, tmp).collect()
    assert(fx.length === 1)
    assert(fx(0).getLong(1) === 3L && fx(0).getLong(2) === 1L)
  }

  test("q69 cohort laws: day-0 equals cohort size, later offsets never exceed it") {
    val rows = Features.q69RetentionCohorts(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val day0 = rows.filter(_._2 == 0).map(t => t._1 -> t._3).toMap
    // every cohort has a day-0 row and no offset beats it
    rows.groupBy(_._1).foreach { case (c, rs) =>
      assert(day0.contains(c), s"cohort $c missing day-0 row")
      rs.foreach { case (_, off, n) =>
        assert(off >= 0 && n <= day0(c), s"cohort $c offset $off: $n > ${day0(c)}")
      }
    }
    // day-0 totals cover every user exactly once
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(day0.values.sum === users)
  }

  test("q71 transition laws: rows sum to 1 per type; transitions = events - users") {
    val rows = Features.q71TransitionMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val pSum = rs.map(_._4).sum
      assert(math.abs(pSum - 1.0) < 1e-4, s"$t: probabilities sum to $pSum")
    }
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_._3).sum === expected)
  }

  test("twoPhaseTimeSplit: over-bound key cardinality takes the range-bucket path, identical output") {
    val ord = Tables.orders(spark, sf)
    val direct = Features.twoPhaseTimeSplit(ord, "o_orderdate", "o_orderkey")
      .select("o_orderkey", "split").orderBy("o_orderkey")
      .collect().map(_.toString).toSeq
    // bound of 2 distinct dates forces the guarded collect to bail
    // into the globalRowNumber range-bucket form — same total order,
    // so the split must be row-identical
    val bucketed = Features.twoPhaseTimeSplit(ord, "o_orderdate", "o_orderkey",
        maxDistinctKeys = 2)
      .select("o_orderkey", "split").orderBy("o_orderkey")
      .collect().map(_.toString).toSeq
    assert(direct.nonEmpty)
    assert(bucketed === direct)
  }

  test("q112 PERMISSIVE from_json: typed fields, sentinels for absent keys, corrupt rows survive") {
    import spark.implicits._
    // harness data: every payload is valid {"k": N} — k lands typed,
    // envelope fields sentinel, corrupt column empty
    val got = Scalars.q112JsonSchemaProjection(spark, sf)
    assert(got.filter(col("k_val") < 0).count() === 0)
    assert(got.filter(col("session_id") =!= "").count() === 0)
    assert(got.filter(col("corrupt_rec") =!= "").count() === 0)
    // the corrupt-record contract on a frame with junk: the scan does
    // NOT throw, the malformed text lands verbatim in corrupt_rec,
    // typed fields of that row read as sentinels
    val junk = Seq[(Long, String)](
      (1L, """{"k": 7, "session_id": "s1"}"""),
      (2L, "not json at all"),
      (3L, null),
      (4L, """{"k": "abc"}"""),
      (5L, """[1, 2]""")).toDF("event_id", "props")
    val parsed = junk.select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "k INT, session_id STRING, _corrupt STRING"),
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt")).as("p"))
      .select(col("event_id"),
        coalesce(col("p.k"), lit(-1)).as("k_val"),
        coalesce(col("p.session_id"), lit("")).as("session_id"),
        coalesce(col("p._corrupt"), lit("")).as("corrupt_rec"))
      .orderBy("event_id")
      .as[(Long, Int, String, String)].collect().toSeq
    // rows 4/5 pin the PERMISSIVE semantics the q112 oracle comment
    // scopes out: VALID JSON that fails struct conversion (wrong
    // field type, non-object) also lands in the corrupt column —
    // a class json_valid cannot mirror, absent from the fixture
    assert(parsed.take(3) === Seq(
      (1L, 7, "s1", ""),
      (2L, -1, "", "not json at all"),
      (3L, -1, "", "")))
    assert(parsed(3)._2 === -1)
    assert(parsed(3)._4 === """{"k": "abc"}""")
    assert(parsed(4)._4 === """[1, 2]""")
  }
}

/** Salted two-phase aggregation == direct aggregation (Skew.scala). */
class SkewSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import org.apache.spark.sql.functions._
  val sf = SharedSpark.sfTiny

  test("saltedCountSum equals direct groupBy") {
    val ev = Tables.events(spark, sf)
    val direct = ev.groupBy(col("user_id").as("key"))
      .agg(count(lit(1)).as("n"), sum(ops.Relational.cents(col("value"))).as("s"))
    val salted = ops.Skew.saltedCountSum(ev, col("user_id"), ops.Relational.cents(col("value")))
    assert(direct.orderBy("key").collect().toSeq ===
      salted.orderBy("key").collect().toSeq)
  }

  test("saltedOrderedCollect equals direct ordered collect") {
    val ev = Tables.events(spark, sf)
    val direct = ev.groupBy(col("user_id").as("key"))
      .agg(transform(array_sort(collect_list(struct(
        struct(col("ts"), col("event_id")).as("sk"), col("event_id").as("v")))),
        x => x.getField("v")).as("values"))
    val salted = ops.Skew.saltedOrderedCollect(ev, col("user_id"),
      struct(col("ts"), col("event_id")), col("event_id"))
    assert(direct.orderBy("key").collect().toSeq ===
      salted.orderBy("key").collect().toSeq)
  }

  test("salt source skips map-typed columns (xxhash64 can't hash maps)") {
    // pre-fix this failed analysis with UNSUPPORTED_HASH_EXPRESSION;
    // the salt must simply exclude the map column, not error
    val ev = Tables.events(spark, sf)
      .withColumn("m", map(col("event_type"), col("value")))
    val direct = ev.groupBy(col("user_id").as("key"))
      .agg(count(lit(1)).as("n"), sum(ops.Relational.cents(col("value"))).as("s"))
    val salted = ops.Skew.saltedCountSum(ev, col("user_id"), ops.Relational.cents(col("value")))
    assert(direct.orderBy("key").collect().toSeq ===
      salted.orderBy("key").collect().toSeq)
  }
}

/** CDC merge semantics (Relational.mergeUpsert) on a hand-built
  * fixture covering all four outcomes: untouched base survives, a
  * change overwrites base, the LATEST change per key wins, a winning
  * delete removes the key.
  */
class MergeUpsertSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import org.apache.spark.sql.functions._

  test("mergeUpsert applies last-write-wins with delete semantics") {
    import spark.implicits._
    val base = Seq(
      ("a", 1L, 100L), // untouched → survives as-is
      ("b", 2L, 100L), // overwritten by one change
      ("c", 3L, 100L), // two changes → latest wins
      ("d", 4L, 999L)  // deleted (base is NEWER than the delete —
                       //   changes must still outrank the snapshot)
    ).toDF("k", "v", "seq")
    val changes = Seq(
      ("b", 20L, 200L, "upsert"),
      ("c", 30L, 200L, "upsert"),
      ("c", 31L, 300L, "upsert"),
      ("c", 29L, 250L, "upsert"),
      ("d", 0L, 500L, "delete")
    ).toDF("k", "v", "seq", "op")
    val got = ops.Relational.mergeUpsert(base, changes, Seq("k"), Seq("seq"))
      .orderBy("k").select("k", "v").as[(String, Long)].collect().toSeq
    assert(got === Seq(("a", 1L), ("b", 20L), ("c", 31L)))
  }

  test("mergeUpsert with an empty change batch is the identity") {
    import spark.implicits._
    val base = Seq(("a", 1L, 1L), ("b", 2L, 2L)).toDF("k", "v", "seq")
    val changes = Seq.empty[(String, Long, Long, String)].toDF("k", "v", "seq", "op")
    val got = ops.Relational.mergeUpsert(base, changes, Seq("k"), Seq("seq"))
    assert(got.orderBy("k").collect().toSeq === base.orderBy("k").collect().toSeq)
  }
}

/** Tensor-boundary invariants for the declared q60 (the reference's
  * x/y contract, my_dbt_flow.py:319-340): x is always exactly maxLen
  * ids, 0 only as left pad; y is the 0-based class index ≥ 0.
  */
class PipelineTensorsSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import org.apache.spark.sql.functions._

  test("q60 emits fixed-length x and shifted non-negative y") {
    val r = ops.Features.q60PipelineTensors(spark, SharedSpark.sfTiny)
      .withColumn("xa", split(col("x"), "\\|").cast("array<int>"))
      .cache()
    assert(r.count() > 0)
    assert(r.filter(size(col("xa")) =!= 20).count() === 0)
    assert(r.filter(col("y") < 0).count() === 0)
    // pad (0) never appears AFTER a real id: the first non-zero
    // position starts the un-padded suffix
    val badPad = r.filter(exists(
      zip_with(col("xa"), slice(concat(col("xa"), array(lit(1))), 2, 20),
        (a, b) => a =!= 0 && b === 0),
      x => x)).count()
    assert(badPad === 0)
    r.unpersist()
  }
}

/** dbt-style data-quality checks (Quality.scala) re-expressing the
  * reference's schema tests as engine ops returning violation rows.
  */
class QualitySpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import org.apache.spark.sql.functions._
  import graft.ops.Quality
  val sf = SharedSpark.sfTiny

  test("reference schema tests hold on the sessionized output") {
    val sessions = ops.Features.sessionize(Tables.events(spark, sf), minSize = 0)
      .withColumn("session_id", concat(col("user_id"), lit("-"), col("session_idx")))
    val results = Quality.runChecks(
      "session_id_unique" -> Quality.expectUnique(sessions, Seq("session_id")),
      "session_id_not_null" -> Quality.expectNotNull(sessions, Seq("session_id")),
      "interactions_nonempty" -> Quality.expectTrue(sessions, size(col("interactions")) > 0))
    results.foreach { case (name, n) => assert(n === 0L, name) }
  }

  test("violations are actually reported") {
    import spark.implicits._
    val df = Seq((1, "a"), (1, "b"), (2, null)).toDF("k", "v")
    assert(Quality.expectUnique(df, Seq("k")).count() === 1)
    assert(Quality.expectNotNull(df, Seq("v")).count() === 1)
    assert(Quality.expectAcceptedValues(df.filter(col("v").isNotNull), "v", Seq("a")).count() === 1)
    val parent = Seq(1).toDF("k")
    assert(Quality.expectRelationship(df, "k", parent, "k").count() === 1)
  }
}

/** Sketch-vs-exact tolerance for the scale path of q53. */
class SketchSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import org.apache.spark.sql.functions._
  val sf = SharedSpark.sfTiny

  test("approx_percentile tracks exact percentile within 2%") {
    val li = Tables.lineitem(spark, sf)
    val r = li.agg(
      expr("percentile(l_quantity, 0.5)").as("exact"),
      expr("approx_percentile(l_quantity, 0.5, 1000)").as("approx")).collect()(0)
    val exact = r.getDouble(0)
    val approx = r.getAs[Number](1).doubleValue()
    assert(math.abs(approx - exact) / exact <= 0.02, s"$approx vs $exact")
  }

  test("q54 corr agrees with Spark's own corr to 1e-6") {
    val got = graft.ops.Scalars.q54CorrCovar(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val ref = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    got.foreach { case (k, v) => assert(math.abs(v - ref(k)) < 1e-4, s"$k: $v vs ${ref(k)}") }
  }

  test("q54 covar_samp agrees with Spark's own covar_samp (relative 1e-4)") {
    // Guards the cents-scaling: x and y are each *100, so the scaled
    // covariance must be divided by 1e4 exactly once.
    val got = graft.ops.Scalars.q54CorrCovar(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val ref = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(covar_samp(col("l_quantity"), col("l_extendedprice")).as("c")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    got.foreach { case (k, v) =>
      assert(math.abs(v - ref(k)) / math.max(1.0, math.abs(ref(k))) < 1e-4,
        s"$k: $v vs ${ref(k)}")
    }
  }

  test("q62 tfidf matches a hand-computed fixture") {
    import spark.implicits._
    // 3 docs, 'b' in all (idf=0), 'x' only in doc 1 (idf=ln 3, tf=2)
    val tmp = java.nio.file.Files.createTempDirectory("graft_tfidf").toString
    Seq((1L, "x x b", "en", "s", 5L), (2L, "y b", "en", "s", 3L),
        (3L, "z b", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.ops.LlmOps.q62Tfidf(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getDouble(3))).toMap
    assert(got((1L, 1)) === ("x", BigDecimal(2.0 * math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    // zero-idf token ranks below informative ones, ties break by token
    assert(got((1L, 2)) === ("b", 0.0))
    assert(got((2L, 1))._1 === "y" && got((3L, 1))._1 === "z")
  }

  test("q72 anomaly laws: every flag exceeds 3 sigma and points at a real event") {
    val flags = graft.ops.Scalars.q72AnomalyFlags(spark, sf).collect()
      .map(r => (r.getLong(1), r.getDouble(3)))
    assert(flags.nonEmpty)
    flags.foreach { case (_, z) => assert(math.abs(z) > 3.0, s"z=$z") }
    val ids = Tables.events(spark, sf).select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(flags.map(_._1).toSet.subsetOf(ids))
  }

  test("q63 sample is deterministic, a subset, and near the declared rates") {
    val s1 = Relational.q63DeterministicSample(spark, sf).collect()
    val s2 = Relational.q63DeterministicSample(spark, sf).collect()
    assert(s1.toSeq === s2.toSeq)
    val keys = Tables.orders(spark, sf).select("o_orderkey")
      .collect().map(_.getLong(0)).toSet
    assert(s1.map(_.getLong(0)).toSet.subsetOf(keys))
    val byStatus = Tables.orders(spark, sf).groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = s1.groupBy(_.getString(2)).map { case (k, v) => k -> v.size.toLong }
    byStatus.foreach { case (st, tot) =>
      val rate = sampled.getOrElse(st, 0L).toDouble / tot
      val expect = if (st == "P") 128.0 / 256 else 64.0 / 256
      assert(math.abs(rate - expect) < 0.12, s"$st: $rate vs $expect")
    }
  }

  test("q110 negative sampling == md5 recomputation; negatives valid and collision-free") {
    import spark.implicits._
    val rows = Features.q110NegativeSampling(spark, sf)
      .as[(Long, Long, Int, Int, Int)].collect().toSeq
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .as[(Long, Long, String, Int)].collect()
    val n = ev.map(_._4).max.toLong + 1
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expected = ev.filter(_._3 == "purchase").sortBy(_._1).flatMap {
      case (eid, uid, _, pos) => (0 until 4).map { j =>
        val draw = java.lang.Long.parseLong(md5hex(s"${eid}_$j").take(4), 16) % n
        val neg = if (draw == pos) (draw + 1) % n else draw
        (eid, uid, pos, j, neg.toInt)
      }
    }.toSeq
    assert(rows === expected)
    // laws: a negative never equals its positive; draws land in the
    // item universe; every purchase contributes exactly k rows
    rows.foreach { case (_, _, pos, _, neg) =>
      assert(neg != pos && neg >= 0 && neg < n)
    }
    assert(rows.groupBy(_._1).values.forall(_.size == 4))
  }
}
