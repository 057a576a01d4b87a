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
