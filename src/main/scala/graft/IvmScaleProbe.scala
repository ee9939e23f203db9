package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-step probe for the JOIN-VIEW IVM family (VERDICT r13 task #3):
  * the family's whole point is refresh cost O(Δ·fanout) + O(affected
  * groups), never a base rescan — so the right measurement is a
  * FIXED-SIZE feed against a 10× base, where the claim predicts
  * near-FLAT wall-clock, not merely linear. The bench queries (q250,
  * q253–q255, q265) cannot show this: their fixtures derive the feeds
  * from the base tables by modulus, so feeds scale 10× with the base
  * and the measurement is dominated by fixture construction.
  *
  * What it measures, per SF dir, min over `passes` passes:
  *  - `inner_unpruned`: refreshJoinSumCount with snapshots read as plain
  *    parquet — the L ⋈ ΔR term scans ALL of L per refresh; expected to
  *    scale with the base (the honest cost of an UNBUCKETED layout).
  *  - `inner_pruned`: the same refresh with the orders snapshot laid out
  *    partitioned by pmod(o_custkey, 64) and the scan filtered to the
  *    feed's touched buckets — the layout the scaladoc prescribes
  *    ("partition-pruned / co-located for free when the snapshots are
  *    bucketed on their join keys"); expected near-flat.
  *  - `full_outer_pruned`: the full-outer variant on the same pruned
  *    layout (its extra anti-join terms probe the same two snapshots).
  *  - `star_pruned`: refreshStarSumCount, fact = pruned orders, one
  *    customer dimension feed.
  *  - `apply_merge`: refreshSumCount of the feed's deltas against a
  *    materialized state (no snapshot probes at all) — the floor.
  *
  * The feed is IDENTICAL at every SF: changes to the 40 smallest
  * custkeys' orders (sf1 is key-shifted copies of sf0.1's keys, so the
  * base-copy keys exist at both SFs with the SAME order fan-out).
  * Local tooling; the driver never runs it. Usage:
  *   IvmScaleProbe <sfDir> [passes] [scratchDir]
  */
object IvmScaleProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(6)
    val scratch = args.lift(2).getOrElse(
      java.nio.file.Files.createTempDirectory("ivm-probe").toString)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.IncrementalAgg

    // ---------------- setup (untimed): snapshots + state + fixed feed
    val orders = graft.queries.Q.t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
    val customer = graft.queries.Q.t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("seg"))

    // snapshot layouts: plain, and partitioned by the join-key bucket
    val plainL = s"$scratch/orders_plain"
    val bucketedL = s"$scratch/orders_bucketed"
    val plainR = s"$scratch/customer_plain"
    orders.write.mode("overwrite").parquet(plainL)
    orders.withColumn("bkt", pmod(col("o_custkey"), lit(64)))
      .write.mode("overwrite").partitionBy("bkt").parquet(bucketedL)
    customer.write.mode("overwrite").parquet(plainR)

    // fixed-size feed: all orders of the 40 smallest custkeys get a
    // +1.00 reprice (update pre+post pairs), plus those customers churn
    // segment (update pre+post) — identical rows at every SF
    // keys confined to 4 of the 64 buckets, so pruning is a real 16×
    // read reduction (40 arbitrary keys would touch ~40 buckets)
    val touched = customer.select(col("c_custkey"))
      .filter(pmod(col("c_custkey"), lit(64)) <= 3)
      .orderBy("c_custkey").limit(40).collect().map(_.getLong(0)).toSeq
    val touchedBkts = touched.map(k => (k % 64).toInt).distinct.sorted
    val changedOrders = orders.filter(col("o_custkey").isin(touched: _*))
    val cdfL = changedOrders
      .withColumn("change_type", lit("update_preimage"))
      .unionByName(changedOrders
        .withColumn("p", (col("p") + lit(1.0)).cast("decimal(18,2)"))
        .withColumn("change_type", lit("update_postimage")))
      .localCheckpoint(true)
    val changedCust = customer.filter(col("c_custkey").isin(touched: _*))
    val cdfR = changedCust
      .withColumn("change_type", lit("update_preimage"))
      .unionByName(changedCust
        .withColumn("seg", concat(lit("MOVED_"), col("seg")))
        .withColumn("change_type", lit("update_postimage")))
      .localCheckpoint(true)
    println(s"[ivm-probe] feed: ${cdfL.count()} order rows, " +
      s"${cdfR.count()} customer rows, ${touchedBkts.size} buckets, sf=$sfDir")

    // maintained state γ_seg(L ⋈ R) — materialized once (the view)
    val prevAgg = orders.join(customer,
        col("o_custkey") === col("c_custkey"))
      .groupBy("seg")
      .agg(count(lit(1)).as("n"), sum(col("p")).as("p"))
      .localCheckpoint(true)

    def readPlainL() = spark.read.parquet(plainL)
    def readPrunedL() = spark.read.parquet(bucketedL)
      .filter(col("bkt").isin(touchedBkts: _*)).drop("bkt")
    def readPlainR() = spark.read.parquet(plainR)

    def time(name: String)(f: => DataFrame): Unit = {
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[ivm-probe] $name%-18s min ${times.min}%7.3f s  " +
        s"runs ${times.map(t => f"$t%.2f").mkString("[", ",", "]")}")
    }

    // the right feed's post-image segment values join against R′ = the
    // post-change customer snapshot; build it from the plain snapshot +
    // feed so both SFs use the same construction (cheap: one small anti
    // join — included in the timed body deliberately, a real refresh
    // derives R′ the same way or reads the table's new version)
    def newR() = readPlainR()
      .join(cdfR.filter(col("change_type") === "update_postimage")
        .select(col("c_custkey")), Seq("c_custkey"), "left_anti")
      .unionByName(cdfR.filter(col("change_type") === "update_postimage")
        .drop("change_type"))

    // correctness first (untimed): the pruned refresh must equal the
    // from-scratch recompute γ(L′ ⋈ R′) before its timings mean anything
    val newL = readPlainL()
      .join(cdfL.select(col("o_orderkey")).distinct(), Seq("o_orderkey"), "left_anti")
      .unionByName(cdfL.filter(col("change_type") === "update_postimage")
        .drop("change_type"))
    val expect = newL.join(newR(), col("o_custkey") === col("c_custkey"))
      .groupBy("seg").agg(count(lit(1)).as("n"), sum(col("p")).as("p"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).toPlainString)).toSet
    val got = IncrementalAgg.refreshJoinSumCount(prevAgg, cdfL, readPrunedL(),
        cdfR, newR(), "o_custkey", "c_custkey", Seq("seg"), "n", Seq("p"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).toPlainString)).toSet
    require(got == expect,
      s"pruned refresh diverges from recompute:\n got=$got\n exp=$expect")
    println("[ivm-probe] pruned refresh == from-scratch recompute: OK")

    time("apply_merge") {
      IncrementalAgg.refreshSumCount(prevAgg,
        cdfL.join(customer, col("o_custkey") === col("c_custkey"))
          .select(col("seg"), col("p"), col("change_type")),
        Seq("seg"), "n", Seq("p"))
    }
    time("inner_unpruned") {
      IncrementalAgg.refreshJoinSumCount(prevAgg, cdfL, readPlainL(),
        cdfR, newR(), "o_custkey", "c_custkey", Seq("seg"), "n", Seq("p"))
    }
    time("inner_pruned") {
      IncrementalAgg.refreshJoinSumCount(prevAgg, cdfL, readPrunedL(),
        cdfR, newR(), "o_custkey", "c_custkey", Seq("seg"), "n", Seq("p"))
    }
    // full-outer state: γ over L ⟗ R, with the <c>_nn non-null counters
    // the outer variants maintain beside each sum
    val prevAggFull = orders.join(customer,
        col("o_custkey") === col("c_custkey"), "full_outer")
      .groupBy("seg")
      .agg(count(lit(1)).as("n"), sum(col("p")).as("p"),
        count(col("p")).as("p_nn"))
      .localCheckpoint(true)
    time("full_outer_pruned") {
      IncrementalAgg.refreshFullJoinSumCount(prevAggFull, cdfL, readPrunedL(),
        readPrunedL(), cdfR, readPlainR(), newR(),
        "o_custkey", "c_custkey", Seq("seg"), "n", Seq("p"))
    }
    time("star_pruned") {
      IncrementalAgg.refreshStarSumCount(prevAgg, cdfL, readPrunedL(),
        Seq(IncrementalAgg.DimFeed(cdfR, readPlainR(), newR(),
          "o_custkey", "c_custkey")),
        Seq("seg"), "n", Seq("p"))
    }
    spark.stop()
  }
}
