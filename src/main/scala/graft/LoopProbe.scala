package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measurement probe (guide §1, r19): where does the iterative family's
  * wall-clock go at local[32]? ProfQ showed wall ≈ 2× jobs-sum on
  * q58/q275 with per-job times of 0.1–0.3 s for 32 tiny tasks — this
  * probe A/Bs the candidate fixed costs on the real q58 pipeline
  * (lag-pairs → dupClusters → orderBy), interleaved in one JVM:
  *
  *   A: session defaults (AQE on, shuffle.partitions = cpus)
  *   B: AQE off for the whole query
  *   C: AQE on, shuffle.partitions = 8
  *   D: AQE off, shuffle.partitions = 8
  *
  * Each config runs `reps` times interleaved A,B,C,D,A,B,... so JIT and
  * ambient load hit all arms equally. Prints per-rep and min wall.
  */
object LoopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def q58(): Unit = {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      val pairs = queries.Q.t(spark, sfDir, "orders")
        .select(col("o_orderkey").as("id2"),
          lag("o_orderkey", 1).over(w).as("id1"))
        .filter(col("id1").isNotNull)
        .select("id1", "id2")
      operators.Dedup.dupClusters(pairs)
        .select(col("id").as("id"), col("cluster").as("cluster"))
        .orderBy("id")
        .write.format("noop").mode("overwrite").save()
    }

    val arms = Seq(
      ("A_default_aqe32", () => { spark.conf.set("spark.sql.adaptive.enabled", "true");
        spark.conf.set("spark.sql.shuffle.partitions", cpus) }),
      ("D_noaqe_8", () => { spark.conf.set("spark.sql.adaptive.enabled", "false");
        spark.conf.set("spark.sql.shuffle.partitions", "8") }),
      ("E_noaqe_4", () => { spark.conf.set("spark.sql.adaptive.enabled", "false");
        spark.conf.set("spark.sql.shuffle.partitions", "4") }),
      ("F_noaqe_2", () => { spark.conf.set("spark.sql.adaptive.enabled", "false");
        spark.conf.set("spark.sql.shuffle.partitions", "2") }),
      ("G_noaqe_16", () => { spark.conf.set("spark.sql.adaptive.enabled", "false");
        spark.conf.set("spark.sql.shuffle.partitions", "16") }))

    val walls = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (r <- 1 to reps; (name, set) <- arms) {
      set()
      val t0 = System.nanoTime()
      q58()
      val s = (System.nanoTime() - t0) / 1e9
      walls(name) = walls(name) :+ s
      println(f"PROBE rep$r $name%-16s $s%7.3f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    walls.toSeq.sortBy(_._1).foreach { case (n, ws) =>
      println(f"PROBE MIN $n%-16s ${ws.min}%7.3f s  runs=${ws.map(w => f"$w%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
