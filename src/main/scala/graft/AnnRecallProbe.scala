package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall-at-scale probe for the ANN family (VERDICT r13 task #8): the
  * 0.6 recall floors are asserted at sf0.01/sf0.1; this measures
  * recall@10 of IVF / IVF-PQ / binary-Hamming / SRP-LSH against brute
  * force at ANY SF dir — in particular /tmp/sf1 (20k vectors, the scale
  * where q163 starts amortizing), so retrieval quality is pinned where
  * the throughput numbers are. Queries = every 100th vector; ground
  * truth = exact cosine top-10. Local tooling; results go to NOTES.md.
  *
  * Usage: AnnRecallProbe <sfDir>
  */
object AnnRecallProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.SimilaritySearch
    val emb = graft.queries.Q.t(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val n = emb.count(); val nq = queries.count()
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    println(s"[ann-recall] corpus $n vectors (dim $dim), $nq queries, sf=$sfDir")
    val k = 10

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(SimilaritySearch.bruteForceTopK(
      emb, queries, "vec_id", "embedding", k))

    def recall(name: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val got = pairs(f)
      val r = (exact & got).size.toDouble / exact.size
      println(f"[ann-recall] $name%-14s recall@$k ${r}%.4f  " +
        f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    // parameters = the q40-family bench/spec defaults at each family's
    // documented operating point
    recall("ivf") {
      SimilaritySearch.ivfTopK(emb, queries, "vec_id", "embedding", k,
        nCells = 16, nProbe = 4, iters = 3)
    }
    recall("ivf_pq") {
      SimilaritySearch.ivfPqTopK(emb, queries, "vec_id", "embedding", k,
        nCells = 16, m = 8, ksub = 16, nProbe = 4, refine = 4, iters = 3)
    }
    recall("binary") {
      SimilaritySearch.binaryHammingTopK(emb, queries, "vec_id", "embedding",
        dims = math.min(dim, 64), shortlist = 4 * k, k = k)
    }
    recall("srp_lsh") {
      SimilaritySearch.lshTopK(emb, queries, "vec_id", "embedding", k,
        nPlanes = 8, nTables = 4)
    }
    // second operating point: candidate volume scaled to hold the
    // probed FRACTION as the corpus grows (the knob a production
    // deployment turns; the defaults above pin the bench/spec configs)
    recall("ivf_hi") {
      SimilaritySearch.ivfTopK(emb, queries, "vec_id", "embedding", k,
        nCells = 16, nProbe = 8, iters = 3)
    }
    recall("ivf_pq_hi") {
      SimilaritySearch.ivfPqTopK(emb, queries, "vec_id", "embedding", k,
        nCells = 16, m = 8, ksub = 16, nProbe = 8, refine = 8, iters = 3)
    }
    recall("binary_hi") {
      SimilaritySearch.binaryHammingTopK(emb, queries, "vec_id", "embedding",
        dims = math.min(dim, 64), shortlist = 16 * k, k = k)
    }
    recall("srp_lsh_hi") {
      SimilaritySearch.lshTopK(emb, queries, "vec_id", "embedding", k,
        nPlanes = 5, nTables = 8)
    }
    // third point: candidate volume proportional to CORPUS (the restore
    // knob for the shortlist-bound families — a fixed shortlist dilutes
    // as distractors grow, the documented Hamming/ADC behavior)
    val prop = math.max(4 * k, (n / 50L).toInt)
    recall("ivf_pq_prop") {
      SimilaritySearch.ivfPqTopK(emb, queries, "vec_id", "embedding", k,
        nCells = 16, m = 8, ksub = 16, nProbe = 8,
        refine = math.max(8, prop / k), iters = 3)
    }
    recall("binary_prop") {
      SimilaritySearch.binaryHammingTopK(emb, queries, "vec_id", "embedding",
        dims = math.min(dim, 64), shortlist = prop, k = k)
    }
    spark.stop()
  }
}
