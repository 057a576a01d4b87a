package graft

/** Scratch selective-verify harness (not part of the library
  * surface): dump named SparkEntry queries + their oracle SQL for
  * scripts/local_verify.py, without paying the full 131-query run.
  * Usage: runMain graft.Prof <sfDir> <outDir> <q1,q2,...>
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    val Array(sfDir, outDir, names) = args.take(3)
    val picked = names.split(",").toSeq
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime; val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime - s) / 1e9}%.2f s"); r
    }
    picked.foreach { q =>
      t(q) {
        SparkEntry.queries(q)(spark, sfDir)
          .write.mode("overwrite").parquet(s"$outDir/$q")
      }
    }
    val oracles = SparkEntry.oracleSql.filter(x => picked.contains(x._1))
    val json = oracles.map { case (k, v) =>
      "\"" + k + "\": \"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n") + "\""
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
