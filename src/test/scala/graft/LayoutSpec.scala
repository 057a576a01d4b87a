package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: curve correctness against a reference Morton
  * encoder, and the actual file-skipping effect — per-file min/max
  * footer ranges narrow in BOTH dimensions, vs a single-column sort
  * that stripes one dimension and leaves the other full-width.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  val sf = SharedSpark.sfTiny

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches a reference Morton encoder (incl. bit masking)") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (1023L, 1023L),
      (1500L, 70000L)) // above 2^10: high bits must be ignored
    val got = cases.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 10).as("z"))
      .collect().map(_.getLong(0))
    val want = cases.map { case (x, y) => mortonRef(x & 1023, y & 1023, 10) }
    assert(got.toSeq === want)
  }

  /** Per-file normalized [min,max] ranges of both key columns. */
  private def fileRanges(path: String): Array[(Double, Double)] = {
    val df = spark.read.parquet(path)
    val Array(xLo, xHi, yLo, yHi) = df
      .agg(min("o_custkey"), max("o_custkey"), min("o_orderkey"), max("o_orderkey"))
      .head().toSeq.map(_.asInstanceOf[Long].toDouble).toArray
    df.groupBy(input_file_name().as("f"))
      .agg(min("o_custkey").as("xmin"), max("o_custkey").as("xmax"),
        min("o_orderkey").as("ymin"), max("o_orderkey").as("ymax"))
      .collect().map { r =>
        ((r.getLong(2) - r.getLong(1)).toDouble / math.max(1.0, xHi - xLo),
          (r.getLong(4) - r.getLong(3)).toDouble / math.max(1.0, yHi - yLo))
      }
  }

  test("z-order files are narrow in BOTH dims; a single sort stripes one") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    Layout.zorderWrite(orders, "o_custkey", "o_orderkey", s"$tmp/zorder", 16)
    orders.repartitionByRange(16, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(s"$tmp/striped")

    val zr = fileRanges(s"$tmp/zorder")
    val sr = fileRanges(s"$tmp/striped")
    def mean(v: Array[Double]): Double = v.sum / v.length
    // z-order: bounded in both dims (ideal quadrant = 0.25 of range)
    assert(mean(zr.map(_._1)) < 0.6, s"custkey ranges: ${zr.map(_._1).toSeq}")
    assert(mean(zr.map(_._2)) < 0.6, s"orderkey ranges: ${zr.map(_._2).toSeq}")
    // single sort: tight on the sort key, full-width on the other
    assert(mean(sr.map(_._1)) < 0.3, s"striped custkey: ${sr.map(_._1).toSeq}")
    assert(mean(sr.map(_._2)) > 0.8, s"striped orderkey: ${sr.map(_._2).toSeq}")
  }

  test("a 10% orderkey window skips most z-order files but no striped files") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout_skip").toString
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    Layout.zorderWrite(orders, "o_custkey", "o_orderkey", s"$tmp/zorder", 16)
    orders.repartitionByRange(16, col("o_custkey"))
      .write.mode("overwrite").parquet(s"$tmp/striped")

    def filesOverlapping(path: String, lo: Double, hi: Double): (Int, Int) = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("o_orderkey").as("mn"), max("o_orderkey").as("mx"))
        .collect()
      val Array(gLo, gHi) = Tables.orders(spark, sf)
        .agg(min("o_orderkey"), max("o_orderkey")).head()
        .toSeq.map(_.asInstanceOf[Long].toDouble).toArray
      val (wLo, wHi) = (gLo + lo * (gHi - gLo), gLo + hi * (gHi - gLo))
      (perFile.count(r => r.getLong(1) <= wHi && r.getLong(2) >= wLo),
        perFile.length)
    }
    val (zHit, zTot) = filesOverlapping(s"$tmp/zorder", 0.40, 0.50)
    val (sHit, sTot) = filesOverlapping(s"$tmp/striped", 0.40, 0.50)
    // min/max footer pruning on the NON-sorted dim: z-order skips
    // most files, the stripe layout can skip none
    assert(zHit.toDouble / zTot <= 0.65, s"zorder hit $zHit/$zTot")
    assert(sHit.toDouble / sTot >= 0.9, s"striped hit $sHit/$sTot")
  }

  test("q102 training shards equal the single-window rank rule; positions dense per shard") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    val hex = "0123456789abcdef"
    val expected = ids.map { id =>
      val gate = md5hex(id.toString).take(4)
      (id, gate, (hex.indexOf(gate(0)) * 16 + hex.indexOf(gate(1))) % 8)
    }.groupBy(_._3).toSeq.flatMap { case (shard, xs) =>
      xs.sortBy(x => (x._2, x._1)).zipWithIndex
        .map { case ((id, _, _), i) => (id, shard, i.toLong) }
    }.sortBy(_._1)
    val got = Layout.q102TrainingShards(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got === expected)
    // dense 0..n-1 positions within every shard, all shards populated
    val byShard = got.groupBy(_._2)
    assert(byShard.size === 8, s"expected all 8 shards, got ${byShard.keySet}")
    byShard.foreach { case (s, xs) =>
      assert(xs.map(_._3).sorted.toSeq === (0L until xs.size).toSeq, s"shard $s not dense")
    }
  }

  test("shardPositionsOf == the plain per-shard window rank; invariant under input partitioning") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select("doc_id")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Layout.shardPositionsOf(d, 8)
        .select("doc_id", "shard", "pos")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val got = run(docs)
    // Scala mirror of the declared semantics: shard = first two gate
    // hex digits mod 8; pos = rank within shard by (gate, doc_id)
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val rows = docs.as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSeq.map { id =>
        val gate = md5hex(id.toString).take(4)
        (id, gate, Integer.parseInt(gate.take(2), 16) % 8)
      }
    val expected = rows.groupBy(_._3).toSeq.flatMap { case (shard, xs) =>
      xs.sortBy(x => (x._2, x._1)).zipWithIndex.map { case (x, i) =>
        (x._1, shard, i.toLong)
      }
    }.sortBy(_._1)
    assert(got === expected)
    // the two-phase bucketed rank must not depend on how the input
    // happened to be partitioned
    assert(run(docs.repartition(7)) === expected)
  }
}
