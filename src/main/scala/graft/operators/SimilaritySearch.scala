package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.cosineSim

/** Approximate/exact nearest-neighbor search over an `ARRAY<FLOAT>`
  * embedding column (SURVEY.md §2.11 — no reference analog).
  *
  * Cosine similarity is the codegen'd Catalyst expression
  * [[graft.functions.CosineSimilarity]] — the pair stream stays inside
  * WholeStageCodegen with zero boxing.
  *
  * 100 TB posture:
  *   - `bruteForceTopK` broadcasts the (small) query set, so the corpus is
  *     scanned once with no shuffle of the corpus itself; per-query top-k
  *     is a window over (query × corpus) — at cluster scale swap the final
  *     window for per-partition top-k + merge (the REPOSE-style local
  *     pruning of PAPERS.md) once k × |queries| outgrows one node.
  *   - `nearDupPairsBlocked` never forms the n² cross product: candidates
  *     come from an equi-join on a blocking key (here a semantic label; in
  *     general any coarse quantization), then exact cosine verifies.
  *   - `lshTopK` is the scale path: sign-random-projection buckets (seeded
  *     deterministic hyperplanes derived from md5, so results are stable
  *     across runs/executors), candidates share a bucket, exact cosine
  *     re-ranks. Recall is tunable via nPlanes/nTables.
  */
object SimilaritySearch {

  /** Exact top-k neighbors for each query row against the corpus.
    * Both inputs need (idCol, vecCol); query ids are excluded from their
    * own result. Output: (query_id, rank, neighbor_id, cosine).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cvec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineSim(col("__qvec"), col("__cvec")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Near-duplicate pairs within blocking buckets: only rows sharing
    * `blockCol` are compared (equi-join, no cross product), then exact
    * cosine ≥ threshold. Output: (id1, id2, cosine), id1 < id2.
    */
  def nearDupPairsBlocked(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(blockCol).as("__blk"), col(idCol).as("id1"), col(vecCol).as("__v1"))
    val b = df.select(col(blockCol).as("__blk"), col(idCol).as("id2"), col(vecCol).as("__v2"))
    a.join(b, "__blk")
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), cosineSim(col("__v1"), col("__v2")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Deterministic pseudo-random hyperplane component for (table, plane,
    * dim): a 60-bit md5 hash mapped to (-1, 1). Computed ONCE on the
    * driver — the planes are data-independent constants, so they ship to
    * executors as array literals (no per-row hashing, no RNG state).
    */
  private[operators] def planeComponent(table: Int, plane: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    graft.functions.HashExpressions.md5Prefix60(md, s"$table:$plane:$dim")
      .toDouble / (1L << 59).toDouble - 1.0
  }

  /** Sign-random-projection LSH bucket id for each vector: one bit per
    * hyperplane, `nPlanes` planes, for LSH table `table`. The projection
    * dot(v, plane_p) runs as `aggregate(zip_with(vec, litPlane, *), +)` —
    * a codegen-friendly built-in pipeline against a constant plane array.
    *
    * @param dim vector dimensionality (plane literals are fixed-length)
    */
  def srpBucket(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      table: Int,
      nPlanes: Int,
      dim: Int): DataFrame = {
    val bitCols = (0 until nPlanes).map { p =>
      val plane = typedLit((0 until dim).map(d => planeComponent(table, p, d)))
      val dot = aggregate(
        zip_with(col(vecCol), plane, (v, w) => v.cast("double") * w),
        lit(0.0d), (acc, x) => acc + x)
      when(dot > 0d, lit(1L << p)).otherwise(lit(0L))
    }
    df.select(col(idCol), col(vecCol),
      bitCols.reduce(_ + _).cast("long").as("bucket"))
  }

  /** LSH-accelerated top-k: bucket corpus and queries with `nTables`
    * independent SRP tables, candidate = same (table, bucket), exact cosine
    * re-rank, per-query top-k. Output schema matches [[bruteForceTopK]];
    * recall < 1 by construction (verified ≥ target in the test suite).
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int = 8,
      nTables: Int = 4): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    // cosine is computed inside each table branch so the union/dedup only
    // carries (long, long, double): the dedup stays a hash aggregate and
    // the shuffle never moves the embedding arrays. A pair found by m
    // tables costs m dot products — cheaper than shuffling vectors.
    val cand = (0 until nTables).map { t =>
      val cb = srpBucket(corpus, idCol, vecCol, t, nPlanes, dim)
        .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cvec"), col("bucket"))
      val qb = srpBucket(queries, idCol, vecCol, t, nPlanes, dim)
        .select(col(idCol).as("query_id"), col(vecCol).as("__qvec"), col("bucket"))
      cb.join(qb, "bucket")
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          cosineSim(col("__qvec"), col("__cvec")).as("cosine"))
    }.reduce(_ unionByName _)
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }
}
