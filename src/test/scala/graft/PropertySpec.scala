package graft

import graft.ops.{Features, LlmOps, Scalars}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the operator laws SURVEY §5 calls out:
  * pad-length invariant, HR@k bounds + merge associativity (pure —
  * no Spark job per case), dedup idempotence and session coverage.
  * (scalatestplus bridge isn't in the offline cache, so cases are
  * drawn from Gen with a fixed seed.)
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("HitRateAtK: result always in [0,1]; merge split point never matters") {
    val row = for {
      preds <- Gen.listOfN(5, Gen.chooseNum(0, 9))
      label <- Gen.chooseNum(0, 9)
    } yield (preds, label)
    val agg = new Features.HitRateAtK(3)
    samples(Gen.listOf(row), 50).foreach { rows =>
      val total = rows.foldLeft(agg.zero)((b, r) => agg.reduce(b, r))
      val hr = agg.finish(total)
      assert(hr >= 0.0 && hr <= 1.0)
      (0 to rows.length).foreach { cut =>
        val (l, r) = rows.splitAt(cut)
        val merged = agg.merge(
          l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
        assert(agg.finish(merged) === hr)
      }
    }
  }

  test("padTo: output length always n; original tail preserved; pad value fills") {
    val listGen = for {
      len <- Gen.chooseNum(1, 30)
      l <- Gen.listOfN(len, Gen.chooseNum(0L, 999L))
    } yield l
    val ls = samples(listGen, 60)
    val df = ls.zipWithIndex.map { case (l, i) => (i, l) }.toDF("id", "a")
    val got = df.select(col("id"), Scalars.padTo(col("a"), 20, lit(-7L)).as("p"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    ls.zipWithIndex.foreach { case (l, i) =>
      val p = got(i)
      assert(p.length === 20)
      val kept = l.takeRight(20)
      assert(p.takeRight(kept.length) === kept)
      assert(p.dropRight(kept.length).forall(_ === -7L))
    }
  }

  test("sessionize (minSize=0) partitions the filtered event set exactly") {
    val sf = SharedSpark.sfTiny
    val ev = Tables.events(spark, sf)
    val sessions = Features.sessionize(ev, minSize = 0)
    val collected = sessions.select(explode(col("interactions")).as("event_id"))
    val filtered = ev.filter(col("event_type").isin("click", "view", "purchase"))
      .select("event_id")
    // no event lost, none duplicated
    assert(collected.count() === filtered.count())
    assert(collected.distinct().count() === filtered.count())
  }

  test("exact dedup is idempotent: dedup(dedup(X)) == dedup(X)") {
    val sf = SharedSpark.sfTiny
    val once = LlmOps.q36DedupExact(spark, sf)
    val docs = Tables.documents(spark, sf)
    val keepers = docs.join(once.select(col("keep_id").as("doc_id")), "doc_id")
    val twice = keepers
      .groupBy(sha2(col("text"), 256).as("content_sha"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
    assert(twice.count() === once.count())
    assert(twice.filter(col("n") > 1).count() === 0)
  }

  test("twoPhaseTimeSplit == global percent_rank split on random data") {
    import org.apache.spark.sql.expressions.Window
    val gen = for {
      n <- Gen.chooseNum(1, 400)
      days <- Gen.chooseNum(1, 12)
      frac <- Gen.oneOf(0.5, 0.9, 0.99)
    } yield (n, days, frac)
    samples(gen, 6).foreach { case (n, days, frac) =>
      // keys 0..n-1 hashed over `days` distinct dates; (date, key)
      // unique by construction
      val df = spark.range(n.toLong)
        .withColumn("d", date_add(lit("2024-01-01").cast("date"),
          pmod(xxhash64(col("id")), lit(days.toLong)).cast("int")))
      val twoPhase = Features.twoPhaseTimeSplit(df, "d", "id", frac)
        .select("id", "split")
      val direct = df.withColumn("split",
        when(percent_rank().over(Window.orderBy("d", "id")) < frac, "train")
          .otherwise("test"))
        .select("id", "split")
      assert(twoPhase.exceptAll(direct).count() === 0
        && direct.exceptAll(twoPhase).count() === 0,
        s"n=$n days=$days frac=$frac")
    }
  }

  test("globalRowNumber == row_number over a global window on random data") {
    import org.apache.spark.sql.expressions.Window
    val gen = for {
      n <- Gen.chooseNum(1, 500)
      buckets <- Gen.oneOf(1, 3, 8, 32)
    } yield (n, buckets)
    samples(gen, 6).foreach { case (n, buckets) =>
      // non-contiguous, hash-shuffled sort key; unique by construction
      val df = spark.range(n.toLong)
        .withColumn("k", xxhash64(col("id")))
      val twoPhase = Features.globalRowNumber(df, "rk", buckets, desc("k"))
        .select("k", "rk")
      val direct = df.withColumn("rk",
        row_number().over(Window.orderBy(desc("k"))).cast("long"))
        .select("k", "rk")
      assert(twoPhase.exceptAll(direct).count() === 0
        && direct.exceptAll(twoPhase).count() === 0, s"n=$n buckets=$buckets")
    }
  }

  test("PQ: encode picks the true nearest subspace centroids; ADC == exact reconstruction dot (pure)") {
    // random codebooks + vectors: the packed code must agree with a
    // brute-force nearest-centroid search per subspace, and the ADC
    // table-lookup sum must reproduce <q, reconstruction> exactly
    // (subspaces are disjoint coordinates — no approximation beyond
    // the quantization itself)
    val m = 4; val k = 8; val subDim = 4; val dims = m * subDim
    val floats = Gen.chooseNum(-1000, 1000).map(_ / 250.0f)
    val cbGen = Gen.listOfN(m * k * subDim, floats).map(_.toArray)
    val vecGen = Gen.listOfN(dims, floats).map(_.toArray)
    samples(Gen.zip(cbGen, vecGen, vecGen), 40).foreach { case (flat, x, q) =>
      val cb = new graft.functions.Pq.Codebooks(m, k, subDim, flat)
      val code = {
        val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(x)
        graft.functions.Pq.encode(arr, cb)
      }
      // brute-force nearest centroid per subspace (ties: lowest id)
      var expected = 0
      for (mi <- 0 until m) {
        val best = (0 until k).minBy { ki =>
          val d = (0 until subDim).map { di =>
            val diff = x(mi * subDim + di).toDouble - cb.centroid(mi, ki, di)
            diff * diff
          }.sum
          (d, ki)
        }
        expected |= best << (4 * mi)
      }
      assert(code === expected)
      // ADC identity: table built from q, summed over the code's slots
      val table = new Array[Float](m * k)
      for (mi <- 0 until m; ki <- 0 until k) {
        var s = 0.0
        for (di <- 0 until subDim)
          s += q(mi * subDim + di).toDouble * cb.centroid(mi, ki, di)
        table(mi * k + ki) = s.toFloat
      }
      val adc = graft.functions.Pq.adc(code,
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(table), m, k)
      val recon = (0 until m).flatMap { mi =>
        val ki = (code >>> (4 * mi)) & 0xF
        (0 until subDim).map(di => cb.centroid(mi, ki, di))
      }.toArray
      val exact = (0 until m).map { mi =>
        val ki = (code >>> (4 * mi)) & 0xF
        (0 until subDim).map(di =>
          q(mi * subDim + di).toDouble * cb.centroid(mi, ki, di)).sum.toFloat.toDouble
      }.sum
      assert(math.abs(adc - exact) < 1e-9, s"adc $adc != $exact")
      // reconstruction norm identity
      val nsq = graft.functions.Pq.reconNormSq(code, cb)
      val directNsq = recon.map(v => v.toDouble * v).sum
      assert(math.abs(nsq - directNsq) < 1e-6 * math.max(1.0, directNsq))
    }
  }

  test("MisraGries: retention guarantee holds on random skewed corpora (pure)") {
    val corpusGen = for {
      nDistinct <- Gen.chooseNum(5, 60)
      counts <- Gen.listOfN(nDistinct, Gen.chooseNum(1, 40))
    } yield counts.zipWithIndex.flatMap { case (c, i) => Seq.fill(c)(s"t$i") }
    samples(corpusGen, 25).foreach { corpus =>
      val k = 8
      val agg = new graft.ops.Sketches.MisraGries(k)
      val n = corpus.size.toLong
      // split into 4 partial summaries then merge — exercises the
      // mergeable path, not just sequential reduce
      val parts = corpus.grouped(math.max(1, corpus.size / 4)).toSeq
        .map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = parts.foldLeft(agg.zero)(agg.merge)
      val cand = agg.finish(merged).toSet
      assert(cand.size <= k)
      val exact = corpus.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      exact.foreach { case (t, c) =>
        if (c > n / (k + 1)) assert(cand(t), s"dropped $t ($c of $n)")
      }
    }
  }

  test("Media BMP: encode/decode round-trips arbitrary dims and pixels (pure)") {
    val img = for {
      w <- Gen.chooseNum(1, 13) // odd widths exercise row padding
      h <- Gen.chooseNum(1, 9)
      px <- Gen.listOfN(w * h * 3, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield (w, h, px.toArray)
    samples(img, 60).foreach { case (w, h, px) =>
      val decoded = graft.ops.Media.decodeBmp(graft.ops.Media.encodeBmp(w, h, px))
      assert((decoded.width, decoded.height) === ((w, h)))
      assert(decoded.rgb.toSeq === px.toSeq, s"pixels differ at ${w}x$h")
    }
  }

  test("Media WAV: encode/decode round-trips arbitrary rates/channels/samples (pure)") {
    val wav = for {
      rate <- Gen.oneOf(8000, 16000, 44100)
      ch <- Gen.chooseNum(1, 4)
      n <- Gen.chooseNum(0, 50)
      s <- Gen.listOfN(n * ch,
        Gen.chooseNum(Short.MinValue.toInt, Short.MaxValue.toInt).map(_.toShort))
    } yield (rate, ch, s.toArray)
    samples(wav, 60).foreach { case (rate, ch, s) =>
      val w = graft.ops.Media.decodeWav(graft.ops.Media.encodeWav(rate, ch, s))
      assert((w.sampleRate, w.channels) === ((rate, ch)))
      assert(w.samples.toSeq === s.toSeq)
      assert(graft.ops.Media.rmsMicro(w) >= 0)
    }
  }

  test("connectedComponents == union-find on random graphs (varied seeds)") {
    val edgeGen = for {
      nNodes <- Gen.chooseNum(2, 60)
      nEdges <- Gen.chooseNum(0, 80)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.chooseNum(0, nNodes - 1)
        b <- Gen.chooseNum(0, nNodes - 1)
      } yield (a.toLong, b.toLong))
    } yield edges.filter { case (a, b) => a != b }
    samples(edgeGen, 6).foreach { edges =>
      val got = graft.ops.Graph.connectedComponents(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(k => k -> find(k)).toMap
      assert(got === want, s"edges=$edges")
    }
  }
}
