package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.Dedup

/** linkageBlocked scale-step (VERDICT r16 task #3 "Done" bar): the q286
  * name fixture at a given SF dir, scored at threshold 0.9, with the
  * prefix length passed explicitly — 0 = AUTO (the operator default,
  * sized from the measured dictionary via [[Dedup.choosePrefixK]]).
  * Times the full pair-aggregation and prints one JSON line; run it
  * alone (never beside a bench). r16 measured the FIXED k=4 default at
  * 780 s on the sf1 (11.1M-value) dictionary — prefix-space saturation,
  * 522M candidates; auto-k picks 5 there (85M candidates).
  *
  * Usage: runMain graft.LinkageScaleStep [k] with SPARK_GRAFT_SF_DIR.
  */
object LinkageScaleStep {
  def main(args: Array[String]): Unit = {
    val k = args.lift(0).map(_.toInt).getOrElse(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    val lower = "abcdefghijklmnopqrstuvwxyz"
    // the q286 fixture verbatim (PipelineQueries) — 8 deterministic name
    // variants per order key, dictionary cardinality growing with SF
    val names = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").cast("long").as("key"))
      .withColumn("g", expr("key div 3"))
      .withColumn("b", concat(
        expr("substring('klmnopqrstuvwxy', cast(g % 15 as int) + 1, 1)"),
        expr(s"substring('$lower', cast((g div 15) % 26 as int) + 1, 1)"),
        expr(s"substring('$lower', cast((g div 390) % 26 as int) + 1, 1)"),
        expr(s"substring('$lower', cast((g div 10140) % 26 as int) + 1, 1)"),
        translate(reverse(lpad(col("key").cast("string"), 7, "0")),
          "0123456789", "abcdefghij")))
      .select(col("key"), posexplode(array(
        col("b"),
        concat(col("b"), lit("s")),
        concat(substring(col("b"), 1, 4),
          translate(substring(col("b"), 5, 1), "abcdefghij", "bcdefghija"),
          expr("substring(b, 6)")),
        concat(lit("z"), expr("substring(b, 2)")),
        concat(col("b"), lit("qq")),
        substring(col("b"), 1, 10),
        concat(substring(col("b"), 1, 10), lit("z")),
        concat(substring(col("b"), 1, 3),
          translate(substring(col("b"), 4, 1), lower, lower.tail + lower.head),
          expr("substring(b, 5)")))).as(Seq("j", "name")))
      .select((col("key") * 8 + col("j")).as("rid"), col("name"))
    val t0 = System.nanoTime()
    val out = Dedup.linkageBlocked(names, "rid", "name",
        GraftFunctions.jaroWinkler, threshold = 0.9, k = k)
      .groupBy((col("id1") % 8).as("ja"), (col("id2") % 8).as("jb"))
      .agg(count(lit(1)).as("n_pairs"))
      .agg(sum("n_pairs")).head().getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"k":$k,"sf":"$sfDir","pairs":$out,"sec":${f"$sec%.1f"}}""")
    spark.stop()
  }
}
