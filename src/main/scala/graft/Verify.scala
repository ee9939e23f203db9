package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg: only run queries whose name contains the substring
    // (local iteration aid; the driver always passes exactly 2 args)
    val nameFilter = args.lift(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Manifest of every query this run ATTEMPTED (name → "ok" | error).
    // A crashed query leaves no result dir; without the manifest a local
    // checker can't tell "crashed" from "filtered out" and would silently
    // under-count failures (round-2 ADVICE).
    val attempted = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Per-query structured record (VERDICT r16 task #1): rounds 15/16 lost
    // the driver's correctness artifact to driver-side failures, so Verify
    // itself now leaves a machine-readable summary (status, row count,
    // schema) beside the parquet dumps — a correctness record exists even
    // when nothing downstream of Verify runs.
    val summary = scala.collection.mutable.LinkedHashMap.empty[String, (String, Long, String)]
    SparkEntry.queries
      .filter { case (name, _) => nameFilter.forall(name.contains) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        attempted(name) = "ok"
        val back = spark.read.parquet(s"$outDir/$name")
        summary(name) = ("ok", back.count(),
          back.schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}")
            .mkString(","))
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        attempted(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        summary(name) = (attempted(name), -1L, "")
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
    // Per-run oracle-artifact root (VERDICT r17 task #4): the saved-index
    // oracles read parquet this run wrote under a pid-keyed root (no
    // cross-JVM clobbering); record the root beside the dump so a human
    // debugging a mismatch can find the exact files the SQL names.
    Files.writeString(Paths.get(s"$outDir/artifact_root.json"),
      s"{${q("artifact_root")}: ${q(graft.queries.Q.oracleArtifactRoot)}}")
    val manifest = attempted
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/manifest.json"), manifest)
    val summaryJson = summary.map { case (k, (st, rows, schema)) =>
      s"${q(k)}: {${q("status")}: ${q(st)}, ${q("rows")}: $rows, " +
        s"${q("schema")}: ${q(schema)}, ${q("has_oracle")}: " +
        s"${SparkEntry.oracleSql.contains(k)}}"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/summary.json"), summaryJson)
    spark.stop()
  }
}
