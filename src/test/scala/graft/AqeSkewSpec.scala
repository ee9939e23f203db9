package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Runtime skew handling: AQE must detect a hot join key's oversized
  * shuffle partition and split it (OptimizeSkewedJoin), the engine's
  * second line of defense behind explicit salting (OperatorsSpec covers
  * the salted-aggregation variant). Thresholds are lowered so local-scale
  * data triggers the same replanning a hot tag would at 100 TB.
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed shuffle partition in a sort-merge join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.shuffle.partitions",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // enough initial partitions that the cold-partition median is tiny
      // next to the hot key's partition (skew test compares to the median)
      conf.set("spark.sql.shuffle.partitions", "16")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16KB")

      // hot key 0: 50k rows with a fat payload; 99 cold keys: 50 rows each
      val fact = spark.range(0, 50000).select(lit(0L).as("k"),
          concat(lit("x" * 100), col("id").cast("string")).as("payload"))
        .unionAll(spark.range(0, 99 * 50).select(
          (col("id") % 99 + 1).as("k"),
          concat(lit("y"), col("id").cast("string")).as("payload")))
      val dim = spark.range(0, 100).select(col("id").as("k"),
        concat(lit("d"), col("id").cast("string")).as("attr"))

      val joined = fact.join(dim, "k")
      // materialize THIS queryExecution (count() would build its own plan
      // and leave joined's adaptive plan unexecuted)
      assert(joined.collect().length === 50000 + 99 * 50)

      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"AQE must mark the skewed join side as split:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
