package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // Optional subset filter for local iteration (comma-separated full
    // names or qNN prefixes). Unset = all queries — the driver's path.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries.filter { case (name, _) =>
      only.forall(s => s.contains(name) || s.contains(name.takeWhile(_ != '_')))
    }.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // Harness contract: declared outputs are scalar-only — the
        // external comparator sorts rows by every column and errors
        // on array/map/struct cells. Fail loudly here, not there.
        import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
        val complex = df.schema.fields.filter(f => f.dataType match {
          case _: ArrayType | _: MapType | _: StructType => true
          case _ => false
        })
        if (complex.nonEmpty)
          System.err.println(s"[verify] $name emits non-atomic columns " +
            s"${complex.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")} " +
            "— the driver's sort-compare will error on these")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
