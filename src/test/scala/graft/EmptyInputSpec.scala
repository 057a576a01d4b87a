package graft

import org.scalatest.funsuite.AnyFunSuite

/** Robustness sweep: every declared query must run (not necessarily
  * return rows) against a corpus of EMPTY tables — at lake scale an
  * empty day, partition, or split is routine input, and an operator
  * that throws on it (schema inference over a file-less sink dir,
  * k-means over zero vectors, a typed expression over a zero-length
  * centroid array) takes down a whole pipeline run. This sweep is
  * what caught q03/q49/annIncremental in round 5.
  */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("every declared query runs on all-empty tables") {
    val dst = java.nio.file.Files.createTempDirectory("graft_empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tables.foreach { t =>
      spark.read.parquet(s"${SharedSpark.sfTiny}/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { fn(spark, dst).count(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    assert(failures.isEmpty, s"queries failing on empty input:\n${failures.mkString("\n")}")
  }
}
