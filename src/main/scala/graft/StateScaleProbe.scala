package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** State-store posture probe (VERDICT r13 task #4): the stateful
  * operators are spec-correct at toy key counts; at 100 TB the question
  * is STATE GROWTH, not throughput. This main drives three stateful
  * shapes — latestPerTagTws (transformWithState, one value per key),
  * holtStream (fMGWS, one (n, l, b) per key) and watermarked
  * dropDuplicates — against the ROCKSDB state store with >= 1M distinct
  * keys, and prints per-trigger latency plus the state-operator metrics
  * Spark reports (rows, memory, RocksDB SST sizes). Results → NOTES.md.
  *
  * Source: rate-micro-batch (deterministic row counts per trigger), key
  * = value % nKeys, so the first ceil(nKeys/rowsPerBatch) triggers grow
  * state and later ones update in place — both phases are visible in
  * the per-trigger series. Local tooling; the driver never runs it.
  *
  * Usage: StateScaleProbe [nKeys] [rowsPerBatch] [nBatches]
  */
object StateScaleProbe {

  def main(args: Array[String]): Unit = {
    val nKeys = args.lift(0).map(_.toLong).getOrElse(1200000L)
    val rowsPerBatch = args.lift(1).map(_.toLong).getOrElse(300000L)
    val nBatches = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def rateSource(): DataFrame = spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch)
      .option("numPartitions", 32)
      .load()

    /** rate rows → the normalized OpcValue shape, key cardinality nKeys */
    def asReadings(rate: DataFrame): DataFrame = rate.select(
      lit("srv1").as("serverName"),
      concat(lit("tag"), pmod(col("value"), lit(nKeys))).as("tag"),
      lit("Double").as("dataType"),
      (col("value") % 1000).cast("double").as("doubleValue"),
      lit(false).as("boolValue"),
      lit("").as("stringValue"),
      col("timestamp").as("sourceTimestamp"),
      col("timestamp").as("serverTimestamp"),
      lit(192).as("quality"))

    def drive(name: String)(out: DataFrame): Unit = {
      val ckpt = java.nio.file.Files.createTempDirectory(s"state-probe-$name").toString
      val q = out.writeStream
        .outputMode("update")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.format("noop").mode("overwrite").save(); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      // wait until nBatches committed
      val deadline = System.currentTimeMillis() + 15 * 60 * 1000
      while (q.recentProgress.count(_.numInputRows > 0) < nBatches &&
          System.currentTimeMillis() < deadline && q.isActive) {
        Thread.sleep(500)
      }
      q.stop(); q.awaitTermination()
      val ps = q.recentProgress.toIndexedSeq.filter(_.numInputRows > 0)
      ps.zipWithIndex.foreach { case (p, i) =>
        val so = p.stateOperators.headOption
        val trig = Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(-1L)
        val rows = so.map(_.numRowsTotal).getOrElse(-1L)
        val mem = so.map(_.memoryUsedBytes).getOrElse(-1L)
        val sst = so.flatMap(s => Option(s.customMetrics.get("rocksdbSstFileSize")))
          .map(_.longValue).getOrElse(-1L)
        println(f"[state-probe] $name%-12s batch $i%2d: trigger ${trig}%6d ms, " +
          f"stateRows $rows%9d, mem ${mem / 1048576.0}%8.1f MiB, sst ${sst / 1048576.0}%8.1f MiB")
      }
      ps.lastOption.flatMap(_.stateOperators.headOption).foreach { so =>
        println(s"[state-probe] $name final custom metrics: " +
          so.customMetrics.entrySet().toArray.mkString(", "))
      }
    }

    drive("latest_tws") {
      graft.streaming.StreamingPipeline.latestPerTagTws(asReadings(rateSource()))
    }
    drive("holt_fmgws") {
      graft.streaming.StreamingPipeline.holtStream(
        rateSource().select(
          concat(lit("k"), pmod(col("value"), lit(nKeys))).as("k"),
          col("timestamp").as("t"),
          (col("value") % 1000).cast("double").as("y")),
        alpha = 0.5, beta = 0.25)
    }
    drive("dedup_wm") {
      asReadings(rateSource())
        .withWatermark("sourceTimestamp", "10 minutes")
        .dropDuplicates("serverName", "tag")
    }
    spark.stop()
  }
}
