package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // local iteration aid: bench only queries whose name contains the
    // substring (driver sets no filter and benches everything)
    val nameFilter = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
    val results = SparkEntry.queries
      .filter { case (name, _) => nameFilter.forall(name.contains) }
      .map { case (name, fn) =>
      // noop sink: materializes every output column (count() would let the
      // optimizer prune projection work away and flatter the numbers).
      // min of 2 runs: first-run JIT/codegen warmup otherwise dominates
      // sub-second queries in a fresh JVM.
      // A crashed query reports -1, never a small-looking elapsed time.
      def once(): Double = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case t: Throwable =>
            System.err.println(s"bench: $name FAILED: ${t.getClass.getName}: ${t.getMessage}")
            -1.0
        }
      }
      val (a, b) = (once(), once())
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => k }
    val total = results.values.filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
