package graft

import graft.ops.Streaming
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming/batch equivalence (SURVEY §5): each §2.10 op run as a
  * Trigger.AvailableNow stream must equal its batch twin, and the
  * session-window gap boundary must match the declared oracle
  * semantics (gap >= 30 min starts a new session).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  val sf = SharedSpark.sfTiny

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("q32 tumbling: stream == batch") {
    val batch = Streaming.tumbling(Tables.events(spark, sf))
    val stream = Streaming.runAvailableNow(spark, sf, Streaming.tumbling, "t_tumbling")
    assert(asSet(stream) === asSet(batch))
  }

  test("q33 sliding: stream == batch") {
    val batch = Streaming.sliding(Tables.events(spark, sf))
    val stream = Streaming.runAvailableNow(spark, sf, Streaming.sliding, "t_sliding")
    assert(asSet(stream) === asSet(batch))
  }

  test("q34 session_window: stream == batch") {
    val batch = Streaming.sessionWindow(Tables.events(spark, sf))
    val stream = Streaming.runAvailableNow(spark, sf, Streaming.sessionWindow, "t_session")
    assert(asSet(stream) === asSet(batch))
  }

  test("streamToPartitionedSink: exactly-once under restart and batch replay") {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_stream_sink_test"
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rm)
      p.delete(); ()
    }
    rm(new java.io.File(out)); rm(new java.io.File(out + "__checkpoint"))
    val expected = Tables.events(spark, sf).count()
    Streaming.streamToPartitionedSink(Streaming.eventsStream(spark, sf), out)
      .awaitTermination()
    assert(spark.read.parquet(out).count() === expected)
    // restart with the checkpoint intact: AvailableNow finds no new
    // files, writes nothing, count unchanged
    Streaming.streamToPartitionedSink(Streaming.eventsStream(spark, sf), out)
      .awaitTermination()
    assert(spark.read.parquet(out).count() === expected)
    // simulate a batch REPLAY (crash after write, before commit): wipe
    // the checkpoint so batch 0 re-runs over the same input — the
    // dynamic (date, batch) overwrite must replace, never duplicate
    rm(new java.io.File(out + "__checkpoint"))
    Streaming.streamToPartitionedSink(Streaming.eventsStream(spark, sf), out)
      .awaitTermination()
    assert(spark.read.parquet(out).count() === expected)
    // partition pruning works on the landed layout
    val dates = spark.read.parquet(out).select("event_date").distinct().count()
    assert(dates > 1)
  }

  test("q65 stateful top-k: stream emits finalized per-day rankings == batch") {
    val batch = graft.ops.StatefulTopK.topkBatch(spark, Tables.events(spark, sf)).toDF()
    val stream = Streaming.runAvailableNow(spark, sf,
      df => graft.ops.StatefulTopK.topkStream(spark, df).toDF(), "t_topk",
      watermark = None, outputMode = "append")
    // the final watermark equals the max event time, which never
    // passes the LAST day's boundary — that day stays open (correct
    // streaming semantics); compare the closed days
    val lastDay = Tables.events(spark, sf)
      .agg(max(to_date(col("ts")))).collect()(0).getDate(0)
    def closed(df: org.apache.spark.sql.DataFrame): Set[String] =
      asSet(df.filter(col("day") < lit(lastDay)))
    assert(closed(stream) === closed(batch))
    assert(closed(batch).nonEmpty)
    // every closed day emitted exactly once: (day, rnk) keys unique
    val dup = stream.groupBy("day", "rnk").count().filter(col("count") > 1).count()
    assert(dup === 0)
  }

  test("q65 stateful top-k survives a checkpointed restart: no dup, no loss") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Files.createTempDirectory("graft_topk_restart").toString
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("ts"), col("ts_ms")).cache()
    val mid = ev.agg(percentile_approx(col("ts_ms"), lit(0.5), lit(100))).collect()(0).getLong(0)
    val maxMs = ev.agg(max("ts_ms")).collect()(0).getLong(0)
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$base/stage_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$base/in_$name.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("event_type STRING, ts TIMESTAMP, ts_ms LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(base)
      val q = graft.ops.StatefulTopK.topkStream(spark, src).toDF()
        .writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // phase 1: only the first half exists; the query checkpoints and stops
    writeOne(ev.filter(col("ts_ms") <= mid), "b1")
    runOnce()
    // phase 2: the rest + a far-future sentinel arrive; the RESTARTED
    // query must resume from state (open days keep their counts) and
    // flush every real day exactly once
    writeOne(ev.filter(col("ts_ms") > mid), "b2")
    writeOne(Seq(("zz_sentinel", new java.sql.Timestamp(maxMs + 86400L * 1000 * 10), maxMs + 86400L * 1000 * 10))
      .toDF("event_type", "ts", "ts_ms"), "b3")
    Seq("b1", "b2", "b3").zipWithIndex.foreach { case (n, i) =>
      Files.setLastModifiedTime(Paths.get(s"$base/in_$n.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + i * 2000))
    }
    runOnce()
    val got = spark.read.parquet(out)
      .filter(col("event_type") =!= "zz_sentinel")
      .collect().map(_.mkString("|")).toSet
    val want = graft.ops.StatefulTopK.topkBatch(spark, ev).toDF()
      .collect().map(_.mkString("|")).toSet
    assert(got === want)
    // exactly-once: a day that closed after the restart emitted one
    // ranking, and no (day, rnk) appears twice
    val dup = spark.read.parquet(out).groupBy("day", "rnk").count()
      .filter(col("count") > 1).count()
    assert(dup === 0)
  }

  test("sketched top-k: tail beyond capacity still yields the exact ranking") {
    // heavy hitters separated by far more than the MG slack, plus a
    // singleton tail an order of magnitude wider than the capacity —
    // the configuration the sketched variant exists for
    def burst(d: String, n: Int, t: String) =
      (1 to n).map(_ => (t, java.sql.Timestamp.valueOf(s"$d 12:00:00")))
    val rows =
      burst("2024-01-01", 500, "hot_a") ++ burst("2024-01-01", 300, "hot_b") ++
        burst("2024-01-01", 100, "hot_c") ++
        (1 to 200).map(i => (f"tail_$i%04d", java.sql.Timestamp.valueOf("2024-01-01 13:00:00"))) ++
      burst("2024-01-02", 400, "hot_b") ++ burst("2024-01-02", 250, "hot_a") ++
        burst("2024-01-02", 120, "hot_c") ++
        (1 to 150).map(i => (f"tl2_$i%04d", java.sql.Timestamp.valueOf("2024-01-02 09:00:00")))
    val ev = rows.toDF("event_type", "ts")
      .withColumn("ts_ms", unix_millis(col("ts")))
    val capacity = 16
    val exact = graft.ops.StatefulTopK.topkBatch(spark, ev, k = 3).toDF().cache()
    val sk = graft.ops.StatefulTopK.topkSketchedBatch(spark, ev, k = 3, capacity = capacity)
      .toDF().cache()
    // the RANKING is exact: count gaps (>=100) clear the slack (<=65)
    def triples(df: org.apache.spark.sql.DataFrame) =
      df.select("day", "rnk", "event_type").collect().map(_.mkString("|")).toSet
    assert(triples(sk) === triples(exact))
    assert(triples(exact).size === 6) // 2 days x k=3
    // counts are lower bounds within the per-day MG slack n/(cap+1)
    val dayTotals = ev.groupBy(to_date(col("ts")).as("day")).count()
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val exactN = exact.collect()
      .map(r => (r.getDate(0).toString, r.getString(2)) -> r.getLong(3)).toMap
    sk.collect().foreach { r =>
      val key = (r.getDate(0).toString, r.getString(2))
      val slack = dayTotals(key._1) / (capacity + 1) + 1
      assert(r.getLong(3) <= exactN(key))
      assert(exactN(key) - r.getLong(3) <= slack,
        s"$key off by ${exactN(key) - r.getLong(3)} > $slack")
    }
  }

  test("sketched top-k: exactly-once across a checkpointed restart") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // the q65 restart harness with Misra-Gries state: distinct types
    // stay under capacity here so the sketch is exact and equality is
    // strict — what this proves is that the MG map round-trips the
    // state checkpoint and open days resume their counts
    val base = Files.createTempDirectory("graft_topk_sk_restart").toString
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"
    val types = Seq("a", "b", "c", "d", "e")
    val rows = for {
      d <- 1 to 3
      (t, i) <- types.zipWithIndex
      _ <- 1 to (10 - 2 * i + d)
    } yield (t, java.sql.Timestamp.valueOf(f"2024-02-0$d%d ${8 + i}%02d:00:00"))
    val ev = rows.toDF("event_type", "ts")
      .withColumn("ts_ms", unix_millis(col("ts"))).cache()
    val mid = ev.agg(percentile_approx(col("ts_ms"), lit(0.5), lit(100))).collect()(0).getLong(0)
    val maxMs = ev.agg(max("ts_ms")).collect()(0).getLong(0)
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$base/stage_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$base/in_$name.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("event_type STRING, ts TIMESTAMP, ts_ms LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(base)
      val q = graft.ops.StatefulTopK.topkSketchedStream(spark, src,
          k = 2, capacity = 8).toDF()
        .writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    writeOne(ev.filter(col("ts_ms") <= mid), "b1")
    runOnce()
    writeOne(ev.filter(col("ts_ms") > mid), "b2")
    writeOne(Seq(("zz_sentinel", new java.sql.Timestamp(maxMs + 86400L * 1000 * 10), maxMs + 86400L * 1000 * 10))
      .toDF("event_type", "ts", "ts_ms"), "b3")
    Seq("b1", "b2", "b3").zipWithIndex.foreach { case (n, i) =>
      Files.setLastModifiedTime(Paths.get(s"$base/in_$n.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + i * 2000))
    }
    runOnce()
    val got = spark.read.parquet(out)
      .filter(col("event_type") =!= "zz_sentinel")
      .collect().map(_.mkString("|")).toSet
    val want = graft.ops.StatefulTopK.topkSketchedBatch(spark, ev, k = 2, capacity = 8)
      .toDF().collect().map(_.mkString("|")).toSet
    assert(got === want)
    assert(want.nonEmpty)
    val dup = spark.read.parquet(out).groupBy("day", "rnk").count()
      .filter(col("count") > 1).count()
    assert(dup === 0)
  }

  test("streaming dedup ingest: cross/within-batch dups dropped, replay-safe") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Files.createTempDirectory("graft_dedup_ingest").toString
    val idx = s"$base/index"
    val out = s"$base/clean"
    val srcDir = s"$base/src"
    Files.createDirectories(Paths.get(srcDir))
    // 40 distinct tokens; a near-copy changes the last token ->
    // 3 of 38 shingles differ, J = 35/41 ~ 0.854 >= 0.8
    def text(tag: String, last: String = "end") =
      ((0 until 39).map(i => s"${tag}_t$i") :+ last).mkString(" ")
    def nearCopy(tag: String) = text(tag, "CHANGED")
    val batches = Seq(
      // batch 0: d2 is a near-copy of d1 (within-batch); d3 distinct
      Seq((1L, text("a")), (2L, nearCopy("a")), (3L, text("b"))),
      // batch 1: d4 duplicates history (d1); d5 distinct
      Seq((4L, nearCopy("a")), (5L, text("c"))),
      // batch 2: d6 dups history (d5); d7/d8 near-copies of each
      // other (within-batch); d9 distinct
      Seq((6L, nearCopy("c")), (7L, text("d")), (8L, nearCopy("d")), (9L, text("e"))))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = s"$base/stage_$i"
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$srcDir/b$i.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(Paths.get(s"$srcDir/b$i.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + i * 2000))
    }
    def runOnce(): Unit = {
      val src = spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.ops.Streaming.dedupIngest(src, idx, out)
      q.awaitTermination()
    }
    runOnce()
    val admitted = spark.read.parquet(out)
    assert(admitted.select("doc_id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 3L, 5L, 7L, 9L))
    // index state covers exactly the admitted docs
    assert(spark.read.parquet(s"$idx/hs").select("doc_id").as[Long]
      .collect().sorted.toSeq === Seq(1L, 3L, 5L, 7L, 9L))
    // a probe of a fresh near-copy of an admitted doc still matches it
    val probe = Seq((100L, nearCopy("b"))).toDF("doc_id", "text")
    val hit = graft.ops.LlmOps.dedupIncremental(spark, probe, idx)
    assert(hit.select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq ===
      Seq((3L, 100L)))
    // replay safety: re-running with no new files changes nothing
    runOnce()
    assert(spark.read.parquet(out).count() === 5)
    assert(spark.read.parquet(out).select("doc_id").distinct().count() === 5)
  }

  test("streaming takedown tick: mid-stream delete unblocks re-arriving content; sink compacts; emptied partition removed") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Files.createTempDirectory("graft_takedown").toString
    val idx = s"$base/index"
    val out = s"$base/clean"
    val srcDir = s"$base/src"
    Files.createDirectories(Paths.get(srcDir))
    def text(tag: String, last: String = "end") =
      ((0 until 39).map(i => s"${tag}_t$i") :+ last).mkString(" ")
    def nearCopy(tag: String) = text(tag, "CHANGED")
    def stage(name: String, rows: Seq[(Long, String)], offsetMs: Long): Unit = {
      val tmp = s"$base/stage_$name"
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$srcDir/$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(Paths.get(s"$srcDir/$name.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() + offsetMs))
    }
    def runOnce(): Unit = {
      val src = spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      graft.ops.Streaming.dedupIngest(src, idx, out).awaitTermination()
    }
    // batch 0: d2 near-copy of d1 (dropped), d3 distinct -> {1, 3}
    stage("b0", Seq((1L, text("a")), (2L, nearCopy("a")), (3L, text("b"))), 0)
    runOnce()
    assert(spark.read.parquet(out).select("doc_id").as[Long]
      .collect().sorted.toSeq === Seq(1L, 3L))
    // WITHOUT a takedown, a re-arrival of d1's content is blocked —
    // the ghost-suppression baseline
    val rearrival = Seq((10L, nearCopy("a")))
    assert(graft.ops.LlmOps.dedupIncremental(spark,
      rearrival.toDF("doc_id", "text"), idx).count() === 1L)
    // mid-stream takedown of d1 (between triggers — the declared
    // single-writer discipline)
    assert(graft.ops.Streaming.takedownTick(spark, out,
      Seq(1L).toDF("doc_id"), dedupIndexPath = Some(idx)) === 1L)
    // batch 1: the SAME content re-arrives under a new id — now
    // ADMITTED (q131's tombstone-probe answer), plus a distinct doc
    stage("b1", rearrival ++ Seq((11L, text("c"))), 2000)
    runOnce()
    assert(spark.read.parquet(out).filter(col("__batch_id") === 1)
      .select("doc_id").as[Long].collect().sorted.toSeq === Seq(10L, 11L))
    // physical sink compaction: batch 0's partition is rewritten
    // without d1; tombstones drop; re-apply is a no-op
    assert(graft.ops.Streaming.applySinkDeletes(spark, out))
    assert(spark.read.parquet(out).select("doc_id").as[Long]
      .collect().sorted.toSeq === Seq(3L, 10L, 11L))
    assert(!graft.ops.Streaming.applySinkDeletes(spark, out))
    // a takedown that empties a whole batch partition removes the
    // directory (dynamic overwrite can't — zero rows never rewrite)
    graft.ops.Streaming.takedownTick(spark, out, Seq(3L).toDF("doc_id"))
    assert(graft.ops.Streaming.applySinkDeletes(spark, out))
    assert(!new java.io.File(s"$out/__batch_id=0").exists())
    assert(spark.read.parquet(out).select("doc_id").as[Long]
      .collect().sorted.toSeq === Seq(10L, 11L))
    // a takedown that empties the ENTIRE sink: every partition dir
    // drops and the count-validated read-back accepts the file-less
    // directory (expected == 0) instead of crashing on schema
    // inference — the legit right-to-be-forgotten endgame
    graft.ops.Streaming.takedownTick(spark, out, Seq(10L, 11L).toDF("doc_id"))
    assert(graft.ops.Streaming.applySinkDeletes(spark, out))
    assert(!new java.io.File(s"$out/__batch_id=1").exists())
    assert(!graft.ops.Streaming.applySinkDeletes(spark, out)) // tombstones dropped
  }

  test("release tick masks sink takedown tombstones; compaction preserves the release") {
    val base = java.nio.file.Files.createTempDirectory("graft_rel_tomb").toString
    val out = s"$base/out"
    val rel = s"$base/release"
    val surv = Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").filter(col("doc_id") < 60)
    // batch-stamped sink, the ingest writers' layout
    surv.withColumn("__batch_id", pmod(col("doc_id"), lit(2)))
      .repartition(2, col("doc_id"))
      .write.partitionBy("__batch_id").parquet(out)
    val dels = surv.select("doc_id").filter(pmod(col("doc_id"), lit(5)) === 2)
    graft.ops.Streaming.takedownTick(spark, out, dels)
    // the tick's release == the batch release tail over survivors
    // MINUS the takedown — q129's rebuild-without-deleted shape
    val v1 = graft.ops.Streaming.releaseTick(spark, out, rel).get
    def releaseRows(v: Long) =
      spark.read.parquet(graft.ops.Sinks.versionDir(rel, v))
        .select(col("kind"), col("name"), col("doc_id"),
          col("shard").cast("int"), col("pos"))
        .as[(String, String, Long, Int, Long)].collect().toSeq.sorted
    val got = releaseRows(v1)
    val (want, _) = Pipeline.releaseTail(
      surv.join(dels, Seq("doc_id"), "left_anti"))
    assert(got === want.select(col("kind"), col("name"), col("doc_id"),
        col("shard").cast("int"), col("pos"))
      .as[(String, String, Long, Int, Long)].collect().toSeq.sorted)
    assert(got.nonEmpty)
    // physical compaction changes nothing the release can observe
    assert(graft.ops.Streaming.applySinkDeletes(spark, out))
    val v2 = graft.ops.Streaming.releaseTick(spark, out, rel).get
    assert(releaseRows(v2) === got)
    // right-to-be-forgotten END STATE (the full composition):
    // takedownTick -> releaseTick -> pruneVersions leaves NO
    // taken-down doc in ANY on-disk version directory — v1 (committed
    // pre-takedown masking, so already clean) and every older
    // artifact are gone, and the surviving live version carries none
    // of the deleted ids
    graft.ops.Sinks.pruneVersions(spark, rel)
    val vdirs = new java.io.File(rel).listFiles().map(_.getName)
      .filter(_.startsWith("v=")).toSeq
    assert(vdirs === Seq(s"v=$v2"))
    val delIds = dels.as[Long].collect().toSet
    val ghosts = spark.read.parquet(graft.ops.Sinks.versionDir(rel, v2))
      .filter(col("doc_id").isin(delIds.toSeq: _*)).count()
    assert(ghosts === 0L)
  }

  test("takedownTick ANN id-space guard: defaulted vecIds missing the whole index warn loud; replay stays idempotent") {
    val base = java.nio.file.Files.createTempDirectory("graft_vec_guard").toString
    val idx = s"$base/ann"
    val out = s"$base/clean"
    // a vec-keyed id space DISJOINT from doc ids — the footgun case
    val emb = Tables.embeddings(spark, sf)
      .withColumn("vec_id", col("vec_id") + 1000)
    graft.ops.LlmOps.annIndexWrite(spark, emb, idx)
    def tick(ids: Seq[Long], vec: Option[Seq[Long]] = None): (Long, String) = {
      val buf = new java.io.ByteArrayOutputStream
      val n = Console.withErr(buf) {
        graft.ops.Streaming.takedownTick(spark, out, ids.toDF("doc_id"),
          annIndexPath = Some(idx),
          vecIds = vec.map(v => v.toDF("vec_id")))
      }
      (n, buf.toString("UTF-8"))
    }
    // defaulted vecIds that miss the WHOLE index: loud warning naming
    // the remedy, but the tick COMPLETES and records tombstones —
    // throwing here would break takedown replay (see next block)
    val (n1, w1) = tick(Seq(1L, 2L))
    assert(n1 === 2L)
    assert(w1.contains("vecIds"), w1)
    assert(new java.io.File(s"$idx/deletes").exists()) // recorded anyway
    // an explicit vecIds set is trusted SILENTLY
    val (n2, w2) = tick(Seq(3L), vec = Some(Seq(1001L)))
    assert(n2 === 1L && w2.isEmpty, w2)
    // a defaulted set that DOES intersect the index passes silently
    val (n3, w3) = tick(Seq(1002L))
    assert(n3 === 1L && w3.isEmpty, w3)
    // REPLAY idempotence — the reason the guard cannot throw: apply
    // the deletes physically (1002's vector drops out), then replay
    // the same takedown; its ids now intersect NOTHING, the warning
    // fires again, and the tick still succeeds (re-recording is the
    // replay-safety contract)
    assert(graft.ops.LlmOps.annIndexApplyDeletes(spark, idx))
    val (n4, w4) = tick(Seq(1002L))
    assert(n4 === 0L) // sink tombstone already present: idempotent
    assert(w4.contains("vecIds"), w4)
  }

  test("streaming paragraph takedown: deleted doc's paragraphs re-admit under a new id") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Files.createTempDirectory("graft_para_takedown").toString
    val idx = s"$base/index"
    val out = s"$base/clean"
    val srcDir = s"$base/src"
    Files.createDirectories(Paths.get(srcDir))
    // one paragraph = 20 tokens; P is d1's sole (and d2's leading)
    def para(tag: String) = (0 until 20).map(i => s"${tag}_w$i").mkString(" ")
    def stage(name: String, rows: Seq[(Long, String)], offsetMs: Long): Unit = {
      val tmp = s"$base/stage_$name"
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$srcDir/$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(Paths.get(s"$srcDir/$name.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() + offsetMs))
    }
    def runOnce(): Unit = {
      val src = spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      graft.ops.Streaming.paraDedupIngest(src, idx, out).awaitTermination()
    }
    stage("b0", Seq((1L, para("P")), (2L, para("Q"))), 0)
    runOnce()
    // takedown d1: its admitted paragraph P must stop reading as seen
    graft.ops.Streaming.takedownTick(spark, out, Seq(1L).toDF("doc_id"),
      paraIndexPath = Some(idx))
    stage("b1", Seq((30L, para("P") + " " + para("Q"))), 2000)
    runOnce()
    // P re-admits under doc 30 (ghost suppressed); Q still blocks
    // (its keeper d2 survives) — q132's tombstone-probe answer
    val row = spark.read.parquet(out).filter(col("doc_id") === 30L)
      .select("n_paras", "n_kept", "clean_text")
      .as[(Long, Long, String)].collect().toSeq
    assert(row === Seq((2L, 1L, para("P"))))
  }

  test("streaming paragraph ingest: cross/within-batch paragraph dups stripped, == q86 global, replay-safe") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Files.createTempDirectory("graft_para_ingest").toString
    val idx = s"$base/index"
    val out = s"$base/clean"
    val srcDir = s"$base/src"
    Files.createDirectories(Paths.get(srcDir))
    // each tag is one exact 20-token paragraph under the q86 rule
    def para(tag: String) = (0 until 20).map(i => s"${tag}_$i").mkString(" ")
    def doc(tags: String*) = tags.map(para).mkString(" ")
    val batches = Seq(
      // batch 0: B repeats within the batch (d1 first)
      Seq((1L, doc("A", "B")), (2L, doc("B", "C"))),
      // batch 1: A duplicates history (d1)
      Seq((3L, doc("A", "D"))),
      // batch 2: D dups history; E repeats within the batch
      Seq((4L, doc("D", "E")), (5L, doc("E"))))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = s"$base/stage_$i"
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$srcDir/b$i.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(Paths.get(s"$srcDir/b$i.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + i * 2000))
    }
    def runOnce(): Unit = {
      val src = spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.ops.Streaming.paraDedupIngest(src, idx, out)
      q.awaitTermination()
    }
    runOnce()
    val got = spark.read.parquet(out)
      .select("doc_id", "n_paras", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val expect = Seq(
      (1L, 2L, 2L, doc("A", "B")),
      (2L, 2L, 1L, para("C")),
      (3L, 2L, 1L, para("D")),
      (4L, 2L, 1L, para("E")),
      (5L, 1L, 0L, ""))
    assert(got === expect)
    // the incremental result IS the global q86 answer over the union
    val global = graft.ops.LlmOps.dedupParagraphs(
        batches.flatten.toDF("doc_id", "text"))
      .select("doc_id", "n_paras", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got === global)
    // replay safety: re-running with no new files changes nothing
    runOnce()
    assert(spark.read.parquet(out).count() === 5)
    assert(spark.read.parquet(out).select("doc_id").distinct().count() === 5)
    // a direct batch replay (same batch id) re-admits its own
    // paragraphs bit-identically instead of self-colliding
    val replay = graft.ops.LlmOps.paraIngestBatch(spark,
        batches(2).toDF("doc_id", "text"), idx, 2L)
      .select("doc_id", "n_paras", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(replay === expect.filter(r => r._1 == 4L || r._1 == 5L))
  }

  test("streaming inverted-index ingest: stream-built index serves q104's exact answer, replay-safe") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Files.createTempDirectory("graft_inv_ingest").toString
    val idx = s"$base/index"
    val srcDir = s"$base/src"
    Files.createDirectories(Paths.get(srcDir))
    // feed the real tiny corpus in 3 files → 3 micro-batches
    val docs = Tables.documents(spark, SharedSpark.sfTiny)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
      .sortBy(_._1)
    val groups = docs.grouped((docs.size + 2) / 3).toSeq
    groups.zipWithIndex.foreach { case (rows, i) =>
      val tmp = s"$base/stage_$i"
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$srcDir/b$i.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(Paths.get(s"$srcDir/b$i.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + i * 2000))
    }
    def runOnce(): Unit = {
      val src = spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      Streaming.bm25IndexIngest(src, idx).awaitTermination()
    }
    runOnce()
    val toks = Tables.documents(spark, SharedSpark.sfTiny)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val queries = toks.filter(col("doc_id") % 97 === 0)
      .orderBy("doc_id").limit(8)
      .select(col("doc_id").as("query_id"),
        explode(slice(col("toks"), 1, 4)).as("tok"))
      .distinct()
    val direct = graft.ops.Retrieval.q104Bm25TopK(spark, SharedSpark.sfTiny)
      .as[(Long, Long, Int, Long)].collect().toSeq
    val streamed = graft.ops.Retrieval.bm25Indexed(spark, queries, idx)
      .as[(Long, Long, Int, Long)].collect().toSeq
    assert(streamed === direct)
    // replay safety: re-running the stream with no new files (and a
    // direct same-batch re-append) leaves the probe answer unchanged
    runOnce()
    graft.ops.Retrieval.invIndexAppendBatch(
      toks.filter(col("doc_id") <= groups(0).last._1), idx, 0L)
    val replayed = graft.ops.Retrieval.bm25Indexed(spark, queries, idx)
      .as[(Long, Long, Int, Long)].collect().toSeq
    assert(replayed === direct)
    // quiesce-time seal: batch dirs collapse, the probe answer and
    // the summed-at-read corpus stats are unchanged
    graft.ops.Retrieval.invIndexSeal(spark, idx)
    val tbDirs = new java.io.File(s"$idx/postings").listFiles()
      .filter(_.getName.startsWith("tb="))
    assert(tbDirs.nonEmpty)
    assert(!tbDirs.exists(_.listFiles().exists(
      _.getName.startsWith("__batch_id="))), "postings still stamped")
    val sealedProbe = graft.ops.Retrieval.bm25Indexed(spark, queries, idx)
      .as[(Long, Long, Int, Long)].collect().toSeq
    assert(sealedProbe === direct)
  }

  test("streaming ANN-index ingest: stream-built index == batch-twin index, replay-safe") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Files.createTempDirectory("graft_ann_ingest").toString
    val idx = s"$base/index"
    val srcDir = s"$base/src"
    Files.createDirectories(Paths.get(srcDir))
    // feed the embeddings in 3 vec_id-ordered files → 3 micro-batches
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val maxId = emb.agg(max("vec_id")).head().getLong(0)
    val bSize = math.max(1L, maxId / 3 + 1)
    def batch(b: Int) = emb.filter(expr(s"vec_id DIV $bSize") === b)
    (0 until 3).foreach { b =>
      val tmp = s"$base/stage_$b"
      batch(b).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$srcDir/b$b.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(Paths.get(s"$srcDir/b$b.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + b * 2000))
    }
    def runOnce(): Unit = {
      val src = spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      Streaming.annIndexIngest(src, idx).awaitTermination()
    }
    runOnce()
    // twin index built directly through the identical per-batch core
    val twinIdx = s"$base/twin"
    (0 until 3).foreach(b =>
      graft.ops.LlmOps.annIndexAppendBatch(spark, batch(b), twinIdx, b.toLong))
    val queries = emb.filter(col("vec_id") < 8)
    val streamed = graft.ops.LlmOps.annIncremental(spark, queries, idx,
      k = 5, nProbe = 4).collect().map(_.toString).toSeq
    val twin = graft.ops.LlmOps.annIncremental(spark, queries, twinIdx,
      k = 5, nProbe = 4).collect().map(_.toString).toSeq
    assert(streamed.nonEmpty)
    assert(streamed === twin)
    // replay safety: re-running the stream with no new files AND a
    // direct seed-batch re-append both leave the answer unchanged
    runOnce()
    graft.ops.LlmOps.annIndexAppendBatch(spark, batch(0), idx, 0L)
    val replayed = graft.ops.LlmOps.annIncremental(spark, queries, idx,
      k = 5, nProbe = 4).collect().map(_.toString).toSeq
    assert(replayed === streamed)
    // quiesce-time seal: per-batch directories collapse into the flat
    // layout, the probe answer is unchanged
    graft.ops.LlmOps.annIndexSeal(spark, idx)
    Seq("vectors", "codes").foreach { sub =>
      val cellDirs = new java.io.File(s"$idx/$sub").listFiles()
        .filter(_.getName.startsWith("cell="))
      assert(cellDirs.nonEmpty, sub)
      assert(!cellDirs.exists(_.listFiles().exists(
        _.getName.startsWith("__batch_id="))), s"$sub still stamped")
    }
    val sealedProbe = graft.ops.LlmOps.annIncremental(spark, queries, idx,
      k = 5, nProbe = 4).collect().map(_.toString).toSeq
    assert(sealedProbe === streamed)
  }

  test("ANN stream ingest + seal killed between park and install: next seal recovers, checkpointed replay is a no-op, probe exact") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Files.createTempDirectory("graft_ann_sealcrash").toString
    val idx = s"$base/index"
    val srcDir = s"$base/src"
    Files.createDirectories(Paths.get(srcDir))
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val maxId = emb.agg(max("vec_id")).head().getLong(0)
    val bSize = math.max(1L, maxId / 2 + 1)
    def batch(b: Int) = emb.filter(expr(s"vec_id DIV $bSize") === b)
    (0 until 2).foreach { b =>
      val tmp = s"$base/stage_$b"
      batch(b).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$srcDir/b$b.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(Paths.get(s"$srcDir/b$b.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + b * 2000))
    }
    def runStream(): Unit = {
      val src = spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      Streaming.annIndexIngest(src, idx).awaitTermination()
    }
    runStream()
    val queries = emb.filter(col("vec_id") < 8)
    def probe() = graft.ops.LlmOps.annIncremental(spark, queries, idx,
      k = 5, nProbe = 4).collect().map(_.toString).toSeq
    val baseline = probe()
    assert(baseline.nonEmpty)
    // ---- simulate a seal killed BETWEEN its two renames on the
    // vectors relation (Sinks.sealBatchStamped): the live directory
    // is parked at __seal_old, the validated flat rewrite sits at
    // __seal_tmp, dst is GONE — the exact crash window the entry
    // recovery exists for. (codes untouched: the crash hit the first
    // relation's swap.)
    val vecs = Paths.get(s"$idx/vectors")
    Files.move(vecs, Paths.get(s"$idx/vectors__seal_old"))
    Files.createDirectories(Paths.get(s"$idx/vectors__seal_tmp"))
    Files.write(Paths.get(s"$idx/vectors__seal_tmp/garbage"),
      Array[Byte](1, 2, 3))
    assert(!Files.exists(vecs))
    // ---- restart: the quiesce-time seal is called UNCONDITIONALLY
    // by contract; its entry recovery restores the parked relation,
    // clears the stale tmp, and the re-seal completes both relations
    graft.ops.LlmOps.annIndexSeal(spark, idx)
    Seq("vectors", "codes").foreach { sub =>
      assert(Files.exists(Paths.get(s"$idx/$sub")), sub)
      assert(!Files.exists(Paths.get(s"$idx/${sub}__seal_old")), sub)
      assert(!Files.exists(Paths.get(s"$idx/${sub}__seal_tmp")), sub)
      val cellDirs = new java.io.File(s"$idx/$sub").listFiles()
        .filter(_.getName.startsWith("cell="))
      assert(cellDirs.nonEmpty, sub)
      assert(!cellDirs.exists(_.listFiles().exists(
        _.getName.startsWith("__batch_id="))), s"$sub still stamped")
    }
    assert(probe() === baseline)
    // ---- the streaming checkpoint survived the crash + recovery
    // untouched: restarting the stream with no new files delivers
    // zero batches (sealing RETIRES the checkpoint — nothing replays
    // onto the flat layout) and the sealed answer does not move
    runStream()
    assert(probe() === baseline)
    // ---- and the retrain rotation's own crash window: park the
    // WHOLE index root as a killed-between-renames swapInstall would,
    // then call annIndexRetrain — recoverInterrupted at entry
    // restores the root before rotating, and rotation preserves the
    // exhaustive answer's content
    val n = emb.count()
    def exhaustiveProbe() = graft.ops.LlmOps.annIncremental(spark, queries,
      idx, k = 5, nProbe = 16, candFactor = (((n + 4) / 5).toInt).max(1))
      .collect().map(_.toString).toSeq
    val exhaustiveBefore = exhaustiveProbe()
    Files.move(Paths.get(idx), Paths.get(idx + "__retrain_old"))
    graft.ops.LlmOps.annIndexRetrain(spark, idx)
    assert(Files.exists(Paths.get(s"$idx/vectors")))
    assert(!Files.exists(Paths.get(idx + "__retrain_old")))
    assert(exhaustiveProbe() === exhaustiveBefore && exhaustiveBefore.nonEmpty)
  }

  test("inverted-index stream ingest + seal killed between park and install: next seal recovers, replay is a no-op, probe exact") {
    // q116's seal driven through the SAME crash window the ANN spec
    // pins: the live postings relation parked at __seal_old, a
    // half-written flat rewrite at __seal_tmp, dst GONE — the state a
    // kill between sealBatchStamped's two renames leaves behind.
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Files.createTempDirectory("graft_inv_sealcrash").toString
    val idx = s"$base/index"
    val srcDir = s"$base/src"
    Files.createDirectories(Paths.get(srcDir))
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
      .sortBy(_._1)
    docs.grouped((docs.size + 1) / 2).toSeq.zipWithIndex.foreach {
      case (rows, i) =>
        val tmp = s"$base/stage_$i"
        rows.toDF("doc_id", "text").coalesce(1)
          .write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        Files.move(part.toPath, Paths.get(s"$srcDir/b$i.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(Paths.get(s"$srcDir/b$i.parquet"),
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() + i * 2000))
    }
    def runStream(): Unit = {
      val src = spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      Streaming.bm25IndexIngest(src, idx).awaitTermination()
    }
    runStream()
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val queries = toks.filter(col("doc_id") % 97 === 0)
      .orderBy("doc_id").limit(8)
      .select(col("doc_id").as("query_id"),
        explode(slice(col("toks"), 1, 4)).as("tok"))
      .distinct()
    def probe() = graft.ops.Retrieval.bm25Indexed(spark, queries, idx)
      .as[(Long, Long, Int, Long)].collect().toSeq
    val baseline = probe()
    assert(baseline.nonEmpty)
    // ---- the crash: postings parked, garbage tmp, dst gone (stats
    // untouched — the kill hit the first relation's swap)
    val postings = Paths.get(s"$idx/postings")
    Files.move(postings, Paths.get(s"$idx/postings__seal_old"))
    Files.createDirectories(Paths.get(s"$idx/postings__seal_tmp"))
    Files.write(Paths.get(s"$idx/postings__seal_tmp/garbage"),
      Array[Byte](1, 2, 3))
    assert(!Files.exists(postings))
    // ---- restart: the quiesce-time seal is called UNCONDITIONALLY
    // by contract; entry recovery restores the parked relation,
    // clears the stale tmp, and the re-seal flattens both relations
    graft.ops.Retrieval.invIndexSeal(spark, idx)
    Seq("postings", "stats").foreach { sub =>
      assert(Files.exists(Paths.get(s"$idx/$sub")), sub)
      assert(!Files.exists(Paths.get(s"$idx/${sub}__seal_old")), sub)
      assert(!Files.exists(Paths.get(s"$idx/${sub}__seal_tmp")), sub)
    }
    val tbDirs = new java.io.File(s"$idx/postings").listFiles()
      .filter(_.getName.startsWith("tb="))
    assert(tbDirs.nonEmpty)
    assert(!tbDirs.exists(_.listFiles().exists(
      _.getName.startsWith("__batch_id="))), "postings still stamped")
    assert(probe() === baseline)
    // ---- the streaming checkpoint survived the crash + recovery:
    // restarting with no new files delivers zero batches and the
    // sealed answer does not move
    runStream()
    assert(probe() === baseline)
  }

  test("dedup stream ingest + seal killed between park and install: next seal recovers, index content and admitted set preserved") {
    // q119's seal (dedupIndexSeal: banded buckets + hs) through the
    // identical kill-between-park-and-install window.
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Files.createTempDirectory("graft_dedup_sealcrash").toString
    val idx = s"$base/index"
    val out = s"$base/admitted"
    val srcDir = s"$base/src"
    Files.createDirectories(Paths.get(srcDir))
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
      .sortBy(_._1)
    docs.grouped((docs.size + 1) / 2).toSeq.zipWithIndex.foreach {
      case (rows, i) =>
        val tmp = s"$base/stage_$i"
        rows.toDF("doc_id", "text").coalesce(1)
          .write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        Files.move(part.toPath, Paths.get(s"$srcDir/b$i.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(Paths.get(s"$srcDir/b$i.parquet"),
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() + i * 2000))
    }
    def runStream(): Unit = {
      val src = spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      Streaming.dedupIngest(src, idx, out).awaitTermination()
    }
    runStream()
    def admittedSet() = spark.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet
    def indexContent() = Seq(s"$idx/buckets", s"$idx/hs").map { rel =>
      val df = spark.read.parquet(rel)
      val flat = if (df.columns.contains("__batch_id"))
        df.drop("__batch_id") else df
      flat.select(flat.columns.sorted.map(col): _*)
        .collect().map(_.mkString("|")).sorted.toSeq
    }
    val admittedBefore = admittedSet()
    val contentBefore = indexContent()
    assert(admittedBefore.nonEmpty)
    // ---- the crash on the banded buckets relation
    val buckets = Paths.get(s"$idx/buckets")
    Files.move(buckets, Paths.get(s"$idx/buckets__seal_old"))
    Files.createDirectories(Paths.get(s"$idx/buckets__seal_tmp"))
    Files.write(Paths.get(s"$idx/buckets__seal_tmp/garbage"),
      Array[Byte](1, 2, 3))
    assert(!Files.exists(buckets))
    // ---- restart + unconditional seal: recover, then flatten
    graft.ops.LlmOps.dedupIndexSeal(spark, idx)
    Seq("buckets", "hs").foreach { sub =>
      assert(Files.exists(Paths.get(s"$idx/$sub")), sub)
      assert(!Files.exists(Paths.get(s"$idx/${sub}__seal_old")), sub)
      assert(!Files.exists(Paths.get(s"$idx/${sub}__seal_tmp")), sub)
    }
    val bandDirs = new java.io.File(s"$idx/buckets").listFiles()
      .filter(_.getName.startsWith("band="))
    assert(bandDirs.nonEmpty)
    assert(!bandDirs.exists(_.listFiles().exists(
      _.getName.startsWith("__batch_id="))), "buckets still stamped")
    // the seal moved bytes, never answers: identical row multisets
    assert(indexContent() === contentBefore)
    // ---- replay: no new files → zero batches, nothing moves
    runStream()
    assert(indexContent() === contentBefore)
    assert(admittedSet() === admittedBefore)
  }

  test("streaming corpus-prep ingest: stream == direct per-batch loop, gates bite, replay is a no-op") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Files.createTempDirectory("graft_corpusprep").toString
    val srcDir = s"$base/src"
    Files.createDirectories(Paths.get(srcDir))
    val full = Tables.documents(spark, sf)
    val docs = full.select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    docs.grouped((docs.size + 2) / 3).toSeq.zipWithIndex.foreach {
      case (rows, i) =>
        val tmp = s"$base/stage_$i"
        rows.toDF("doc_id", "lang", "text").coalesce(1)
          .write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        Files.move(part.toPath, Paths.get(s"$srcDir/b$i.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(Paths.get(s"$srcDir/b$i.parquet"),
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() + i * 2000))
    }
    // the artifact tier: LM fit on the src0 slice, eval shingle set
    val (lm, oov) = graft.ops.LlmOps.fitUnigramLm(
      full.filter(col("source") === "src0").select("text"), 4096)
    val lmB = lm.localCheckpoint()
    val evalSh = graft.ops.LlmOps.shingles(
        full.filter(col("doc_id") % 13 === 0).select("doc_id", "text"))
      .select("shingle").distinct().localCheckpoint()
    def runStream(): Unit = {
      val src = spark.readStream
        .schema("doc_id LONG, lang STRING, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      Streaming.corpusPrepIngest(src, s"$base/idx_stream",
        s"$base/out_stream", lmB, oov, evalSh).awaitTermination()
    }
    runStream()
    def streamed() = spark.read.parquet(s"$base/out_stream")
      .select("doc_id").as[Long].collect().toSet
    // direct twin: the SAME per-batch core over the same ordered
    // ranges against a fresh index root — proves the stream plumbing
    // (checkpointing, stamped sink) adds/loses nothing
    val twin = docs.grouped((docs.size + 2) / 3).toSeq.zipWithIndex
      .flatMap { case (rows, i) =>
        Streaming.corpusPrepBatch(rows.toDF("doc_id", "lang", "text"),
            i.toLong, s"$base/idx_twin", lmB, oov, evalSh,
            nearThreshold = 0.5, paraTokens = 20, minTokens = 5,
            dupMilliMax = 300, topMilliMax = 200,
            pplHeadBits = 4910000L, pplMidBits = 4940000L,
            contaminationMilli = 700)
          .select("doc_id").as[Long].collect()
      }.toSet
    val got = streamed()
    assert(got.nonEmpty)
    assert(got === twin)
    // the composition GATES: survivors are a strict subset, and the
    // model gates demonstrably bit (this corpus has LM-tail docs and
    // eval near-copies by construction — the q125 stage counters)
    assert(got.size < docs.size)
    // replay: restarting with no new files delivers zero batches and
    // moves nothing — sink and indexes are batch-stamped
    runStream()
    assert(streamed() === got)
    // direct same-batch re-run against the STREAM's index: admission
    // is replay-idempotent for the whole composition, so the kept set
    // of batch 0 reproduces exactly
    val b0 = docs.grouped((docs.size + 2) / 3).toSeq.head
    val replayKept = Streaming.corpusPrepBatch(
        b0.toDF("doc_id", "lang", "text"), 0L, s"$base/idx_stream",
        lmB, oov, evalSh, nearThreshold = 0.5, paraTokens = 20,
        minTokens = 5, dupMilliMax = 300, topMilliMax = 200,
        pplHeadBits = 4910000L, pplMidBits = 4940000L,
        contaminationMilli = 700)
      .select("doc_id").as[Long].collect().toSet
    assert(replayKept === (got intersect b0.map(_._1).toSet))
  }

  test("gate refresh mid-stream: converges to the direct chain under the refreshed model; unseeded root fails loud") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Files.createTempDirectory("graft_gateretrain").toString
    val srcDir = s"$base/src"
    Files.createDirectories(Paths.get(srcDir))
    val full = Tables.documents(spark, sf)
    val docs = full.select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    val batches = docs.grouped((docs.size + 3) / 4).toSeq
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = s"$base/stage_$i"
      rows.toDF("doc_id", "lang", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$srcDir/b$i.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(Paths.get(s"$srcDir/b$i.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() + i * 2000))
    }
    val (lm0, oov0) = graft.ops.LlmOps.fitUnigramLm(
      full.filter(col("source") === "src0").select("text"), 4096)
    val evalSh = graft.ops.LlmOps.shingles(
        full.filter(col("doc_id") % 13 === 0).select("doc_id", "text"))
      .select("shingle").distinct().localCheckpoint()
    // seed the artifact root with the offline fit; refresh every 2
    // batches — 4 batches means refits after batch 1 and batch 3
    val art = s"$base/artifacts"
    assert(Streaming.lmArtifactCommit(spark, art, lm0, oov0) === 1L)
    val src = spark.readStream
      .schema("doc_id LONG, lang STRING, text STRING")
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    Streaming.corpusPrepIngestRefreshing(src, s"$base/idx_stream",
      s"$base/out_stream", art, evalSh, retrainEvery = 2)
      .awaitTermination()
    val got = spark.read.parquet(s"$base/out_stream")
      .select("doc_id").as[Long].collect().toSet
    assert(got.nonEmpty)
    // the refresh HAPPENED: seed v1 + two refits
    assert(graft.ops.Sinks.liveVersion(spark, art) === Some(3L))
    // direct twin: the same per-batch core with the same
    // resolve-live-artifact + refit-at-cadence lifecycle against
    // fresh roots — stream plumbing adds/loses nothing, and batches
    // AFTER a refresh provably scored under the refreshed model
    val art2 = s"$base/artifacts_twin"
    assert(Streaming.lmArtifactCommit(spark, art2, lm0, oov0) === 1L)
    val twin = batches.zipWithIndex.flatMap { case (rows, i) =>
      val (lmI, oovI) = Streaming.lmArtifactRead(spark, art2).get
      val kept = Streaming.corpusPrepBatch(rows.toDF("doc_id", "lang", "text"),
        i.toLong, s"$base/idx_twin", lmI, oovI, evalSh,
        nearThreshold = 0.5, paraTokens = 20, minTokens = 5,
        dupMilliMax = 300, topMilliMax = 200,
        pplHeadBits = 4910000L, pplMidBits = 4940000L,
        contaminationMilli = 700)
      if (!kept.isEmpty)
        kept.withColumn("__batch_id", lit(i.toLong))
          .repartition(8, col("doc_id"))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch_id").parquet(s"$base/out_twin")
      if ((i + 1) % 2 == 0)
        Streaming.gateRetrain(spark, s"$base/out_twin", art2)
      kept.select("doc_id").as[Long].collect()
    }.toSet
    assert(got === twin)
    // the refreshed artifact is genuinely different from the seed
    // (fit on accumulated survivors, not the src0 reference slice),
    // so the convergence above proves the refresh PATH, not a no-op
    val seedLm = lm0.as[(String, Long)].collect().toMap
    val liveLm = Streaming.lmArtifactRead(spark, art).get._1
      .as[(String, Long)].collect().toMap
    assert(seedLm !== liveLm)
    // an unseeded artifact root fails loud, not silently ungated
    val src2 = spark.readStream
      .schema("doc_id LONG, lang STRING, text STRING")
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      Streaming.corpusPrepIngestRefreshing(src2, s"$base/idx_unseeded",
        s"$base/out_unseeded", s"$base/artifacts_unseeded", evalSh)
        .awaitTermination()
    }
    assert(e.getMessage.contains("lmArtifactCommit")
      || String.valueOf(e.getCause).contains("lmArtifactCommit"))
  }

  test("streaming release tick: live release == q125 tail over the accumulated survivors; flip per tick; re-tick idempotent") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Files.createTempDirectory("graft_reltick").toString
    val srcDir = s"$base/src"
    Files.createDirectories(Paths.get(srcDir))
    val full = Tables.documents(spark, sf)
    val docs = full.select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    docs.grouped((docs.size + 2) / 3).toSeq.zipWithIndex.foreach {
      case (rows, i) =>
        val tmp = s"$base/stage_$i"
        rows.toDF("doc_id", "lang", "text").coalesce(1)
          .write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        Files.move(part.toPath, Paths.get(s"$srcDir/b$i.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(Paths.get(s"$srcDir/b$i.parquet"),
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() + i * 2000))
    }
    val (lm, oov) = graft.ops.LlmOps.fitUnigramLm(
      full.filter(col("source") === "src0").select("text"), 4096)
    val lmB = lm.localCheckpoint()
    val evalSh = graft.ops.LlmOps.shingles(
        full.filter(col("doc_id") % 13 === 0).select("doc_id", "text"))
      .select("shingle").distinct().localCheckpoint()
    val rel = s"$base/release"
    val src = spark.readStream
      .schema("doc_id LONG, lang STRING, text STRING")
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    Streaming.corpusReleaseIngest(src, s"$base/idx", s"$base/out", rel,
      lmB, oov, evalSh).awaitTermination()
    // the LIVE release equals the batch-declared q125 tail over the
    // SAME accumulated survivors (one shared releaseTail definition)
    val live = graft.ops.Sinks.liveVersion(spark, rel).get
    def releaseRows(v: Long) =
      spark.read.parquet(graft.ops.Sinks.versionDir(rel, v))
        .select(col("kind"), col("name"), col("doc_id"),
          col("shard").cast("int"), col("pos"))
        .as[(String, String, Long, Int, Long)].collect().toSeq.sorted
    val got = releaseRows(live)
    assert(got.nonEmpty)
    val surv = spark.read.parquet(s"$base/out")
      .select("doc_id", "lang", "text")
    val (want, _) = Pipeline.releaseTail(surv)
    assert(got === want
      .select(col("kind"), col("name"), col("doc_id"),
        col("shard").cast("int"), col("pos"))
      .as[(String, String, Long, Int, Long)].collect().toSeq.sorted)
    // one flip per tick (releaseEvery = 1, three batches): superseded
    // versions still on disk until pruned, the manifest names the last
    val fs = graft.ops.Sinks.fsFor(spark, rel)
    val versions = fs.listStatus(new org.apache.hadoop.fs.Path(rel))
      .map(_.getPath.getName).filter(_.startsWith("v=")).sorted.toSeq
    assert(versions.size === 3, versions.mkString(","))
    graft.ops.Sinks.pruneVersions(spark, rel)
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(rel))
      .map(_.getPath.getName).filter(_.startsWith("v=")).toSeq
    assert(after === Seq(s"v=$live"))
    // re-tick over unchanged survivors: a NEW version with IDENTICAL
    // content flips in (replayed-trigger idempotence by determinism)
    val v2 = Streaming.releaseTick(spark, s"$base/out", rel).get
    assert(v2 > live)
    assert(releaseRows(v2) === got)
  }

  test("release root absorbs additive schema change across versions; pinned reads keep each version's own schema") {
    // round-16 verdict missing #3, the declared closure: the release
    // root is replace-semantics versioning, so a column the release
    // tail starts emitting mid-deployment appears from the next
    // version on (no evolution machinery, no stranded root), while
    // time travel reads superseded versions under THEIR schema. The
    // survivors sink itself is fixed-schema by the corpusPrepIngest
    // contract — this pins the boundary where schema change enters.
    val rel = java.nio.file.Files.createTempDirectory("graft_relschema")
      .resolve("release").toString
    // an "older deployment's" release version: no `pos` column yet
    val v1 = graft.ops.Sinks.commitVersion(spark, rel,
      Seq(("doc", "d1", 1L, 0), ("doc", "d2", 2L, 1))
        .toDF("kind", "name", "doc_id", "shard"),
      partCol = Some("shard"))
    // the current tail emits `pos` — the next tick commits fine
    val v2 = graft.ops.Sinks.commitVersion(spark, rel,
      Seq(("doc", "d1", 1L, 0, 0L), ("doc", "d2", 2L, 1, 0L),
        ("doc", "d3", 3L, 1, 1L))
        .toDF("kind", "name", "doc_id", "shard", "pos"),
      partCol = Some("shard"))
    assert(v2 > v1)
    val liveCols = graft.ops.Sinks.readVersioned(spark, rel).columns.toSet
    assert(liveCols.contains("pos"))
    assert(graft.ops.Sinks.readVersioned(spark, rel).count() === 3L)
    // pinned read of the superseded version: old schema, old rows
    val pinned = graft.ops.Sinks.readVersionedAt(spark, rel, v1)
    assert(!pinned.columns.contains("pos"))
    assert(pinned.count() === 2L)
  }

  test("q56 interval join: stream-stream == batch") {
    val batch = Streaming.intervalJoinBatch(Tables.events(spark, sf))
    val stream = Streaming.runAvailableNow(spark, sf,
      Streaming.intervalJoinStream(_), "t_ivjoin",
      watermark = None, outputMode = "append")
    assert(asSet(stream) === asSet(batch))
    assert(batch.count() > 0)
  }

  test("interval join leftOuter: null-padded rows emit on watermark expiry, == batch") {
    val batch = Streaming.intervalJoinBatch(Tables.events(spark, sf),
      joinType = "left_outer")
    val stream = Streaming.runAvailableNow(spark, sf,
      Streaming.intervalJoinStream(_, joinType = "leftOuter"), "t_ivjoin_lo",
      watermark = None, outputMode = "append")
    // A purchase at the stream's tail can never emit its outer row —
    // the final watermark equals the max event time and never passes
    // it (correct streaming semantics, not a bug). Compare only
    // watermark-safe purchases: those the final watermark cleared.
    val ev = Tables.events(spark, sf)
    val maxMs = ev.agg(max("ts_ms")).collect()(0).getLong(0)
    val safe = ev.filter(col("event_type") === "purchase" &&
        col("ts_ms") < maxMs - 2 * 30 * 60 * 1000L)
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    def safeSet(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().filter(r => safe(r.getAs[Long]("purchase_id")))
        .map(_.mkString("|")).toSet
    assert(safeSet(stream) === safeSet(batch))
    // the outer half is non-trivial: some safe purchases have no view
    assert(safeSet(batch.filter(col("view_id") === -1L)).nonEmpty)
  }

  test("session_window boundary: exact-gap event merges; strictly greater splits") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val df = Seq(
      (1L, new java.sql.Timestamp(t0.getTime)),
      (2L, new java.sql.Timestamp(t0.getTime + 30 * 60 * 1000L)), // exactly the gap -> merges
      (3L, new java.sql.Timestamp(t0.getTime + 90 * 60 * 1000L)) // 60 min after #2 -> new session
    ).toDF("event_id", "ts").withColumn("user_id", lit(1L))
    val sessions = Streaming.sessionWindow(df).collect()
      .map(_.getAs[Long]("n")).sorted.toSeq
    // This pins the oracle semantics (q34 uses strict > at µs): the
    // event at exactly last_ts+gap still belongs to the session.
    assert(sessions === Seq(1L, 2L))
  }

  test("stateful sessionize: late event beyond the open session's reach becomes its own session") {
    import graft.ops.StatefulSessionize.{Ev, State, transition}
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def ev(ts: Long, id: Long) = Ev(1L, id, ts, new java.sql.Timestamp(ts))
    val gap = 30L
    // open session [200, 200]; a watermark window admits ts=150 —
    // 150 < 200 − gap, so it must NOT merge (the unbounded
    // `e.ts − last <= gap` rule would have dragged startMs to 150)
    val st = TestGroupState.create[State](
      org.apache.spark.api.java.Optional.of(State(200L, 200L, List((200L, 9L)))),
      GroupStateTimeout.EventTimeTimeout, 0L,
      org.apache.spark.api.java.Optional.of(120L), hasTimedOut = false)
    val out = transition(gap, flushTrailing = false)(1L, Iterator(ev(150L, 2L)), st).toSeq
    assert(out.map(s => (s.session_start_ms, s.interactions)) === Seq((150L, Seq(2L))))
    assert(st.get === State(200L, 200L, List((200L, 9L))))
    // a late event INSIDE the session's backward reach merges and
    // extends startMs (correct gap semantics, not corruption)
    val st2 = TestGroupState.create[State](
      org.apache.spark.api.java.Optional.of(State(200L, 210L, List((200L, 9L), (210L, 10L)))),
      GroupStateTimeout.EventTimeTimeout, 0L,
      org.apache.spark.api.java.Optional.of(120L), hasTimedOut = false)
    val out2 = transition(gap, flushTrailing = false)(1L, Iterator(ev(180L, 3L)), st2).toSeq
    assert(out2.isEmpty)
    assert(st2.get.startMs === 180L && st2.get.lastMs === 210L)
    assert(st2.get.events.map(_._2).toSet === Set(9L, 10L, 3L))
  }

  test("stateful sessionize (flatMapGroupsWithState): batch == declarative flagship") {
    val ev = Tables.events(spark, sf)
    val stateful = graft.ops.StatefulSessionize.sessionizeBatch(spark, ev)
      .filter(col("interactions").isNotNull)
    val flagship = graft.ops.Features.sessionize(
      ev.filter(lit(true)), minSize = 0, eventTypes = Seq("click", "view", "purchase", "error", "signup"))
    val a = stateful.collect().map(s => (s.user_id, s.interactions.mkString(","))).toSet
    val b = flagship.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](3).mkString(","))).toSet
    assert(a === b)
  }

  test("stateful sessionize streams across micro-batches with event-time timeouts") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Files.createTempDirectory("graft_stateful").toString
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("ts_ms")).cache()
    val mid = ev.agg(percentile_approx(col("ts_ms"), lit(0.5), lit(100))).collect()(0).getLong(0)
    val maxMs = ev.agg(max("ts_ms")).collect()(0).getLong(0)
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$base/stage_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$base/$name.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    writeOne(ev.filter(col("ts_ms") <= mid), "b1")
    writeOne(ev.filter(col("ts_ms") > mid), "b2")
    // sentinel advances the watermark far past every real session
    import spark.implicits._
    writeOne(Seq((-1L, -1L, new java.sql.Timestamp(maxMs + 86400L * 1000 * 10), maxMs + 86400L * 1000 * 10))
      .toDF("user_id", "event_id", "ts", "ts_ms"), "b3")
    // modification times define the micro-batch order
    (Seq("b1", "b2", "b3").zipWithIndex).foreach { case (n, i) =>
      Files.setLastModifiedTime(Paths.get(s"$base/$n.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + i * 2000))
    }
    val src = spark.readStream
      .schema("user_id LONG, event_id LONG, ts TIMESTAMP, ts_ms LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(base)
    val q = graft.ops.StatefulSessionize.sessionizeStream(spark, src)
      .writeStream.outputMode("append").format("memory").queryName("t_stateful")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("t_stateful").filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](2).mkString(","))).toSet
    val want = graft.ops.StatefulSessionize.sessionizeBatch(spark, ev)
      .collect().map(s => (s.user_id, s.interactions.mkString(","))).toSet
    assert(got === want)
  }

  test("incremental nep_session_events: batch twin matches the declarative model") {
    val fixtures = new PipelineSpec
    val exploded = Pipeline.explodeEvents(fixtures.raw)
      .filter(col("event_type") === "event_product" &&
        col("product_action").isin("detail", "add", "purchase"))
      .select(col("session_id"), col("api_key"), col("session_date"),
        col("event_epoch_timestamp").as("epoch_ms"), col("sku"),
        timestamp_millis(col("event_epoch_timestamp")).as("ts"))
    val stateful = graft.ops.StatefulSessionize.sessionEventsBatch(spark, exploded)
      .collect().map(r => (r.session_id, r.api_key, r.session_date.toString,
        r.interactions.mkString(","))).toSet
    val declarative = Pipeline.sessionEvents(Pipeline.explodeEvents(fixtures.raw))
      .collect().map(r => (r.getString(0), r.getString(1), r.get(2).toString,
        r.getSeq[String](3).mkString(","))).toSet
    assert(stateful === declarative)
  }

  test("incremental nep_session_events streams with session-close timeouts") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val fixtures = new PipelineSpec
    val exploded = Pipeline.explodeEvents(fixtures.raw)
      .filter(col("event_type") === "event_product" &&
        col("product_action").isin("detail", "add", "purchase"))
      .select(col("session_id"), col("api_key"), col("session_date"),
        col("event_epoch_timestamp").as("epoch_ms"), col("sku"),
        timestamp_millis(col("event_epoch_timestamp")).as("ts")).cache()
    val base = Files.createTempDirectory("graft_nep_stream").toString
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String, offsetMs: Long): Unit = {
      val tmp = s"$base/stage_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$base/$name.parquet"), StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(Paths.get(s"$base/$name.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + offsetMs))
    }
    writeOne(exploded.filter(col("epoch_ms") <= 40), "b1", 0)
    writeOne(exploded.filter(col("epoch_ms") > 40), "b2", 2000)
    import spark.implicits._
    writeOne(Seq(("__sentinel", "k0", java.sql.Date.valueOf("2020-01-01"),
      10_000_000_000L, "s", new java.sql.Timestamp(10_000_000_000L)))
      .toDF("session_id", "api_key", "session_date", "epoch_ms", "sku", "ts"), "b3", 4000)
    val src = spark.readStream
      .schema("session_id STRING, api_key STRING, session_date DATE, epoch_ms LONG, sku STRING, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1").parquet(base)
    val q = graft.ops.StatefulSessionize.sessionEventsStream(spark, src)
      .writeStream.outputMode("append").format("memory").queryName("t_nep")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("t_nep").filter(col("session_id") =!= "__sentinel")
      .collect().map(r => (r.getString(0), r.getSeq[String](3).mkString(","))).toSet
    val want = graft.ops.StatefulSessionize.sessionEventsBatch(spark, exploded)
      .collect().map(r => (r.session_id, r.interactions.mkString(","))).toSet
    assert(got === want)
  }

  test("incremental nep_session_events: cross-batch events merge into one session row") {
    // Multi-batch invariant for the custom-state path: a session
    // whose events span micro-batches (watermark still below the
    // close timeout) emits exactly ONE row with the merged ordered
    // interactions, flushed once the watermark passes its timeout.
    // (The exact-boundary duplicate the +1 timeout guards against is
    // unobservable through the public API on Spark 4: within a batch
    // input is processed before timeouts, and in later batches the
    // late-event filter drops boundary rows — the +1 keeps the state
    // transition consistent with transition() regardless.)
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import spark.implicits._
    val closeMs = 60000L
    val base = Files.createTempDirectory("graft_nep_boundary").toString
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String, offsetMs: Long): Unit = {
      val tmp = s"$base/stage_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$base/$name.parquet"), StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(Paths.get(s"$base/$name.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + offsetMs))
    }
    def ev(sid: String, ms: Long, sku: String) =
      (sid, "k1", java.sql.Date.valueOf("2020-01-01"), ms, sku, new java.sql.Timestamp(ms))
    val cols = Seq("session_id", "api_key", "session_date", "epoch_ms", "sku", "ts")
    writeOne(Seq(ev("S", 1000L, "sku_a")).toDF(cols: _*), "b1", 0)
    // second event for S in a LATER batch, inside the close window
    // (watermark after b1 = 1000 < 1000 + closeMs: state still open)
    writeOne(Seq(ev("S", 31000L, "sku_b")).toDF(cols: _*), "b2", 2000)
    // far-future sentinel advances the watermark past S's timeout;
    // the trailing no-data batch evicts and emits S exactly once
    writeOne(Seq(ev("__sentinel", 10_000_000_000L, "s")).toDF(cols: _*), "b3", 4000)
    val src = spark.readStream
      .schema("session_id STRING, api_key STRING, session_date DATE, epoch_ms LONG, sku STRING, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1").parquet(base)
    val q = graft.ops.StatefulSessionize.sessionEventsStream(spark, src, closeAfterMs = closeMs)
      .writeStream.outputMode("append").format("memory").queryName("t_nep_boundary")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val s = spark.table("t_nep_boundary").filter(col("session_id") === "S").collect()
    assert(s.length === 1, s"expected one merged session row, got ${s.toSeq}")
    assert(s.head.getSeq[String](3) === Seq("sku_a", "sku_b"))
  }

  test("transition: late-but-within-watermark event never regresses lastMs") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import graft.ops.StatefulSessionize.{Ev, State, transition}
    val gap = 1000L
    val st = TestGroupState.create[State](
      org.apache.spark.api.java.Optional.of(State(1000L, 1000L, List((1000L, 1L)))),
      GroupStateTimeout.EventTimeTimeout, 0L,
      org.apache.spark.api.java.Optional.of(400L), hasTimedOut = false)
    // late event at t=500 merges (gap from lastMs=1000 is negative)
    val out = transition(gap, flushTrailing = false)(7L,
      Iterator(Ev(7L, 2L, 500L, new java.sql.Timestamp(500L))), st)
    assert(out.isEmpty)
    val s = st.get
    assert(s.lastMs === 1000L, "late event must not regress lastMs")
    assert(s.startMs === 500L, "late event extends the session start")
    // next on-time event at 1600 still merges: 1600 - 1000 <= gap
    val st2 = TestGroupState.create[State](org.apache.spark.api.java.Optional.of(s),
      GroupStateTimeout.EventTimeTimeout, 0L,
      org.apache.spark.api.java.Optional.of(400L), hasTimedOut = false)
    val out2 = transition(gap, flushTrailing = false)(7L,
      Iterator(Ev(7L, 3L, 1600L, new java.sql.Timestamp(1600L))), st2)
    assert(out2.isEmpty, "1600 is within gap of true lastMs=1000 — no split")
    assert(st2.get.events.length === 3)
  }

  test("streaming quality gate: pre-fit LM, tail docs dropped per batch, == batch twin, replay-safe") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Files.createTempDirectory("graft_quality_gate").toString
    val out = s"$base/clean"
    val srcDir = s"$base/src"
    Files.createDirectories(Paths.get(srcDir))
    // reference distribution: docs of in-vocab tokens; "zz*" is OOV
    val ref = Seq.fill(30)("alpha beta gamma delta").toDF("text")
    val (lm, oov) = graft.ops.LlmOps.fitUnigramLm(ref, 4096)
    // thresholds chosen so in-vocab docs land below them and all-OOV
    // docs land in tail: oov bits/token is strictly larger
    val inBits = lm.agg(max("bits")).head().getLong(0)
    val (head, mid) = (inBits + 1, inBits + 2)
    val batches = Seq(
      Seq((1L, "en", "alpha beta gamma"), (2L, "en", "zz1 zz2 zz3")),
      Seq((3L, "en", "delta alpha"), (4L, "en", "zz4 zz5")))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = s"$base/stage_$i"
      rows.toDF("doc_id", "lang", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$srcDir/b$i.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(Paths.get(s"$srcDir/b$i.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + i * 2000))
    }
    def runOnce(): Unit = {
      val src = spark.readStream.schema("doc_id LONG, lang STRING, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      graft.ops.Streaming.qualityGateIngest(src, lm, oov, out, head, mid)
        .awaitTermination()
    }
    runOnce()
    val got = spark.read.parquet(out).select("doc_id").as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 3L), "only in-vocab docs pass the gate")
    // == the batch twin over the union of batches
    val all = batches.flatten.toDF("doc_id", "lang", "text")
    val want = graft.ops.LlmOps.scoreWithLm(all, lm, oov, head, mid)
      .filter(col("ppl_bucket") =!= "tail")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got === want)
    // replay safety: re-running with no new files changes nothing
    runOnce()
    assert(spark.read.parquet(out).count() === 2)
  }

  test("q35 streaming dedup within watermark drops re-sent event ids") {
    import org.apache.spark.sql.streaming.Trigger
    val src = Streaming.eventsStream(spark, sf)
      // simulate at-least-once delivery: every event arrives twice
      .union(Streaming.eventsStream(spark, sf))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = src.select("event_id").writeStream
      .outputMode("append").format("memory").queryName("t_dedup")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val n = spark.table("t_dedup").count()
    val expected = Tables.events(spark, sf).count()
    assert(n === expected)
  }
}
