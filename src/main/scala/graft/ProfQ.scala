package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Measurement harness (guide §1): run named declared queries with a
  * job-level listener that prints every Spark job's wall time and call
  * site, so a composite query's bill (fixture commits, per-round
  * checkpoint actions, index build vs probe) decomposes into its actual
  * jobs. Two passes per query — read the second (warm) one.
  *
  *   sbt "runMain graft.ProfQ /root/testdata/sf0.1 q251_txtable_join_view"
  */
object ProfQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        starts.put(j.jobId, (System.nanoTime(),
          if (desc.nonEmpty) s"$site | $desc" else site))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = starts.remove(e.jobId)
        if (s != null)
          println(f"JOB ${e.jobId}%5d ${(System.nanoTime() - s._1) / 1e9}%8.3f  ${s._2}")
      }
    })
    val byName = SparkEntry.queries.toMap
    names.foreach { n =>
      val fn = byName.getOrElse(n, sys.error(s"unknown query $n"))
      (1 to 2).foreach { p =>
        println(s"=== $n pass $p")
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"=== $n pass $p TOTAL ${(System.nanoTime() - t0) / 1e9}%8.3f s")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        System.gc()
      }
    }
    spark.stop()
  }
}
