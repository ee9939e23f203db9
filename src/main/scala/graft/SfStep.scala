package graft

import org.apache.spark.sql.SparkSession

/** Scale-step runner (VERDICT r17 task #3): time a fixed query list at
  * one SF dir with the Bench methodology (noop sink, min of 2 runs per
  * query, inter-query cache/RDD/GC isolation) in ONE JVM, printing one
  * JSON line. Run it once per SF dir and divide — the per-(query, SF)
  * JVM of the r15 script cost more wall than the measurements.
  * Local tooling; the driver never runs it.
  *
  *   sbt "runMain graft.SfStep /tmp/sf1 q01_ q03_ ..."
  */
object SfStep {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val wanted = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries.filter { case (n, _) => wanted.exists(n.startsWith) }
    val results = qs.map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case t: Throwable =>
            System.err.println(s"sfstep: $name FAILED: ${t.getMessage}"); -1.0
        }
      }
      val r1 = once()
      val r2 = if (r1 < 0) -1.0 else once()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
      val v = if (r1 < 0 || r2 < 0) -1.0 else math.min(r1, r2)
      println(f"[sfstep] $name%-40s $v%8.2f  (runs $r1%.2f, $r2%.2f)")
      name -> v
    }
    println("{\"sf\":\"" + sfDir + "\",\"queries\":{" +
      results.map { case (k, v) => "\"" + k + "\":" + v }.mkString(",") + "}}")
    spark.stop()
  }
}
