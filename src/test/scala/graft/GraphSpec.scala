package graft

import graft.ops.{Graph, LlmOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connected components (alternating large-star/small-star) against
  * brute-force transitive closure on hand-built graphs, plus the
  * q61 dedup-cluster contract on the real corpus.
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  val sf = SharedSpark.sfTiny

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Driver-side union-find ground truth (test-only). */
  private def truth(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chain graph collapses to its minimum in O(log n) rounds") {
    val chain = (1L until 64L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got.values.toSet === Set(1L))
    assert(got.keySet === (1L to 64L).toSet)
  }

  test("multiple components each label to their own minimum") {
    val edges = Seq((10L, 11L), (11L, 12L), (20L, 25L), (30L, 31L), (31L, 30L))
    assert(cc(edges) === truth(edges))
  }

  test("random graph matches union-find ground truth") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    assert(cc(edges) === truth(edges))
  }

  test("empty edge set yields empty labels") {
    assert(cc(Seq.empty) === Map.empty)
  }

  test("q61: every near-dup pair shares a cluster rooted at its min member") {
    val pairs = LlmOps.q40DedupNgramJaccard(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val labels = LlmOps.q61DedupClusters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // complete doc domain, pairs co-clustered, singletons self-labeled
    assert(labels.size === Tables.documents(spark, sf).count())
    pairs.foreach { case (a, b) => assert(labels(a) === labels(b)) }
    val clustered = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    labels.foreach { case (d, c) =>
      if (clustered(d)) assert(c <= d) else assert(c === d)
    }
    // cluster id is a member of its own cluster (the canonical doc)
    labels.values.toSet.foreach { c: Long => assert(labels(c) === c) }
  }

  test("q75: uncapped LSH-pair clustering equals q61 where the cap doesn't bite") {
    // sf0.001 has 500 docs, all under q61's maxDocs=5000 cap, so the
    // two detectors see the same corpus; at J>=0.5 the test corpus's
    // near-dup pairs are all found by the banded LSH (q37 spec pins
    // LSH == brute force), so the component structures must agree
    val exact = LlmOps.q61DedupClusters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lsh = LlmOps.q75DedupClustersLsh(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lsh === exact)
  }
}
