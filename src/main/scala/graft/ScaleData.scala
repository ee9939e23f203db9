package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ×N scale-up of a driver testdata directory — the
  * scale-STEP measurement tool (VERDICT r12 item 3): every O() claim in
  * this repo is proven by plan audits at sf0.1; this main materializes a
  * 10× directory so the heavy families (dedup, ANN, graph, spatial) can
  * be MEASURED at two scales and their empirical scaling exponents
  * recorded in NOTES.md. Local tooling only — the driver's gates never
  * read its output.
  *
  * Construction: `factor` key-shifted copies of each base table, with
  * strides derived from each table's own max key so copies never
  * collide and every FK (orders→customer, lineitem→orders/part/supplier,
  * copy-local) lands in the matching copy — join fan-out per key stays
  * EXACTLY the base table's, which is what "same workload, more of it"
  * means. Two content columns are deliberately NOT cloned verbatim:
  *   - `documents.text` is letter-rotated per copy (translate(), a
  *     codegen Column op; length/whitespace/shingle structure preserved)
  *     — verbatim copies would hand the near-dup family ×10 duplicate
  *     clusters that exist nowhere in the base data and would bend the
  *     measured exponent with candidate-pair work that is a fixture
  *     artifact, not an algorithm property.
  *   - `embeddings.embedding` is circularly rotated by the copy index —
  *     a norm- and intra-copy-distance-preserving permutation, so each
  *     copy is an isometric clone of the base corpus and the union's
  *     ANN workload scales in size without degenerate zero-distance
  *     cross-copy neighbors.
  * `region`/`nation` stay as-is (dimension constants, as at any SF);
  * `events.ts` keeps its time range — ×10 density in the same window is
  * the realistic shape of a busier bus, and window/watermark work scales
  * with rows either way.
  */
object ScaleData {

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$srcDir/$t.parquet")

    // stride = max(key)+1, computed once per keyed table — copies shift
    // by i*stride so key spaces are disjoint and FK arithmetic is exact
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    val customer = read("customer"); val supplier = read("supplier")
    val part = read("part"); val orders = read("orders")
    val lineitem = read("lineitem"); val events = read("events")
    val documents = read("documents"); val embeddings = read("embeddings")

    val cStride = stride(customer, "c_custkey")
    val sStride = stride(supplier, "s_suppkey")
    val pStride = stride(part, "p_partkey")
    val oStride = stride(orders, "o_orderkey")
    val eStride = stride(events, "event_id")
    val uStride = stride(events, "user_id")
    val dStride = stride(documents, "doc_id")
    val vStride = stride(embeddings, "vec_id")

    def copies(base: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => shift(base, i)).reduce(_ unionByName _)

    def shifted(df: DataFrame, i: Int, shifts: (String, Long)*): DataFrame =
      shifts.foldLeft(df) { case (d, (c, s)) =>
        d.withColumn(c, col(c) + lit(i * s))
      }

    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    def rot(s: String, i: Int): String =
      s.substring(i % 26) + s.substring(0, i % 26)

    val out = Map(
      "region" -> read("region"),
      "nation" -> read("nation"),
      "customer" -> copies(customer)((d, i) => shifted(d, i, "c_custkey" -> cStride)),
      "supplier" -> copies(supplier)((d, i) => shifted(d, i, "s_suppkey" -> sStride)),
      "part" -> copies(part)((d, i) => shifted(d, i, "p_partkey" -> pStride)),
      "orders" -> copies(orders)((d, i) =>
        shifted(d, i, "o_orderkey" -> oStride, "o_custkey" -> cStride)),
      "lineitem" -> copies(lineitem)((d, i) =>
        shifted(d, i, "l_orderkey" -> oStride, "l_partkey" -> pStride,
          "l_suppkey" -> sStride)),
      "events" -> copies(events)((d, i) =>
        shifted(d, i, "event_id" -> eStride, "user_id" -> uStride)),
      "documents" -> copies(documents) { (d, i) =>
        shifted(d, i, "doc_id" -> dStride)
          .withColumn("text",
            translate(col("text"), lower + upper, rot(lower, i) + rot(upper, i)))
      },
      "embeddings" -> copies(embeddings) { (d, i) =>
        val r = i % 64 // dim-safe rotation amount; 0 for the base copy
        shifted(d, i, "vec_id" -> vStride)
          .withColumn("embedding",
            if (r == 0) col("embedding")
            else concat(
              slice(col("embedding"), r + 1, 100000),
              slice(col("embedding"), 1, r)))
      }
    )
    out.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scaledata] wrote $name")
    }
    spark.stop()
  }
}
