package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.{Checkpoints, Dedup}

/** A/B probe for dupClusters' round structure (r18, guide §1: measure
  * before touching the operator): CURRENT = hook materialized, then
  * jump∘jump materialized (2 checkpoint actions/round) vs FUSED = one
  * plan hook→jump→jump materialized once per round (the hook subtree
  * appears 4×; ReusedExchange is expected to dedupe its exchange).
  * Prints per-variant wall and the label sums so result equality is
  * visible. Local tooling; run alone.
  */
object DupFuseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    def pairs: DataFrame = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("id2"),
        lag("o_orderkey", 1).over(w).as("id1"))
      .filter(col("id1").isNotNull)
      .select("id1", "id2")

    def fused(p: DataFrame, maxIters: Int): DataFrame = {
      val e0 = p.select(col("id1").cast("long").as("src"), col("id2").cast("long").as("dst"))
      val sym = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      val edges = sym
        .unionByName(sym.select(col("src"), col("src").as("dst")).distinct())
        .distinct().persist()
      def cws(df: DataFrame) = Checkpoints.truncateWithSum(df, "cluster")
      var (labels, curSum) = cws(
        edges.groupBy("src")
          .agg(least(col("src"), min(col("dst"))).as("cluster"))
          .withColumnRenamed("src", "id"))
      var prevSum = Long.MinValue
      var it = 0
      def jump(m: DataFrame): DataFrame = m.as("a")
        .join(m.select(col("id").as("cid"), col("cluster").as("cc")).as("b"),
          col("a.cluster") === col("cid"), "left")
        .select(col("a.id").as("id"),
          least(col("a.cluster"), coalesce(col("cc"), col("a.cluster"))).as("cluster"))
      while (curSum != prevSum && it < maxIters) {
        prevSum = curSum
        val hooked = edges.join(labels.withColumnRenamed("id", "dst"), "dst")
          .groupBy("src").agg(min("cluster").as("cluster"))
          .withColumnRenamed("src", "id")
        val (jumped, jumpedSum) = cws(jump(jump(hooked)))
        curSum = jumpedSum
        Checkpoints.free(labels)
        labels = jumped
        it += 1
        println(f"[fused] round $it sum=$curSum")
      }
      edges.unpersist(blocking = false)
      labels
    }

    def time(name: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = f
      r.write.format("noop").mode("overwrite").save()
      println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%8.2f s sum=" +
        r.agg(sum(col("cluster"))).head.getLong(0))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    // interleave A/B twice to cancel drift
    time("current1")(Dedup.dupClusters(pairs))
    time("fused1")(fused(pairs, 25))
    time("current2")(Dedup.dupClusters(pairs))
    time("fused2")(fused(pairs, 25))
    spark.stop()
  }
}
