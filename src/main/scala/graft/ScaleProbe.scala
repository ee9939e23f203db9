package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level scale probe for the heavy dedup path (round-13 scale-step
  * follow-up): times each stage of the MinHash-LSH pipeline separately at
  * a given SF dir so a superlinear total can be attributed to a stage
  * instead of guessed at. Local tooling; the driver never runs it.
  *
  * Usage: ScaleProbe <sfDir> [shufflePartitions]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val parts = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    val docs = graft.queries.Q.t(spark, sfDir, "documents")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // warm the input scan once so stage times don't include first-touch IO
    docs.write.format("noop").mode("overwrite").save()
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    time("shingles")(sh.write.format("noop").mode("overwrite").save())
    val sig = Dedup.minhashSignatures(sh, "doc_id", 12)
    time("signatures")(sig.write.format("noop").mode("overwrite").save())
    val bands = Dedup.bandKeys(sig, "doc_id", 4)
    time("bandKeys")(bands.write.format("noop").mode("overwrite").save())
    val cand = Dedup.lshCandidates(sig, "doc_id", 4)
    time("candidates")(cand.write.format("noop").mode("overwrite").save())
    val full = Dedup.nearDupPairsMinHash(docs, "doc_id", "text",
      shingleK = 3, numHashes = 12, rowsPerBand = 4, threshold = 0.5)
    time("full (re-derived)")(full.write.format("noop").mode("overwrite").save())
    // the exact bench-query shape: + round + global orderBy (range
    // partitioner sampling re-executes lineage) — run TWICE like bench
    val benchShaped = full
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id1", "id2")
    time("bench shape run1")(benchShaped.write.format("noop").mode("overwrite").save())
    time("bench shape run2")(benchShaped.write.format("noop").mode("overwrite").save())
    def reuseStats(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      def cnt(s: String) = s.r.findAllIn(p).length
      println(s"[probe] $name plan: exchanges=${cnt("Exchange")} " +
        s"reused=${cnt("ReusedExchange")} aqe=${cnt("AdaptiveSparkPlan")} " +
        s"sorts=${cnt("(?m)^.*Sort ")}")
    }
    reuseStats("full", full)
    reuseStats("benchShaped", benchShaped)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("bench shape AQE off")(benchShaped.write.format("noop").mode("overwrite").save())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // isolate re-derivation cost: materialize sig, run bandKeys from disk
    val tmp = java.nio.file.Files.createTempDirectory("graft-probe").toString
    sig.write.mode("overwrite").parquet(s"$tmp/sig")
    val sigP = spark.read.parquet(s"$tmp/sig")
    time("bandKeys from parquet")(Dedup.bandKeys(sigP, "doc_id", 4)
      .write.format("noop").mode("overwrite").save())
    Dedup.bandKeys(sigP, "doc_id", 4).write.mode("overwrite").parquet(s"$tmp/bands")
    val bandsP = spark.read.parquet(s"$tmp/bands")
    time("candidates from parquet") {
      val a = bandsP.select(col("doc_id").as("id1"), col("band"), col("bkey"))
      val b = bandsP.select(col("doc_id").as("id2"), col("band"), col("bkey"))
      a.join(b, Seq("band", "bkey")).filter(col("id1") < col("id2"))
        .select("id1", "id2").distinct()
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
