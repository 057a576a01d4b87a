package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-audit dump: writes every declared query's FORMATTED physical
  * plan to one file per query, so plan-shape review (pushed filters,
  * pruned schemas, exchange counts, join strategies — the evidence
  * PLANS.md summarizes) is a directory listing away instead of a
  * hand-driven spark-shell session.
  *
  *   sbt "runMain graft.Plans /root/testdata/sf0.01 /tmp/plans"
  *
  * Plans are built, not executed — except the handful of queries
  * whose CONSTRUCTION runs bounded jobs by design (two-phase ranks,
  * k-means, sketch candidates; each documents that cost).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("/tmp/graft_plans")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"$name.txt"), plan)
      } catch {
        case e: Throwable =>
          System.err.println(s"[plans] $name failed: ${e.getMessage}")
      }
    }
    println(s"""{"plans_dir":"$outDir","n":${SparkEntry.queries.size}}""")
    spark.stop()
  }
}
