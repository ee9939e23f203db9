package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking-quality metrics for retrieval and embedding-search evaluation
  * (SURVEY.md §2.11 — no reference analog): the step that turns an ANN /
  * BM25 run into numbers a pipeline can gate on. Binary relevance,
  * cutoff k: recall@k, MRR, nDCG@k per query.
  *
  * Scale shape: the run is pre-cut to rank ≤ k (O(k · queries) rows), so
  * every stage is keyed on query_id — one equi-join of the cut run
  * against the gold set, two keyed aggregations, one join of the two
  * per-query frames. No windows, no driver collects, no cross products;
  * the gold set is touched once.
  *
  * nDCG uses NATURAL-log discounts: 1/ln(rank+1). This is the same
  * ranking functional as the textbook 1/log2(rank+1) — every term of
  * dcg AND idcg scales by the constant ln 2, which cancels in the ratio
  * — and ln is the safer cross-engine choice (DuckDB's log2 and the
  * JVM's may round the last bit differently; both engines' ln of small
  * integers agrees).
  */
object RetrievalEval {

  /** Per-query binary-relevance metrics of a ranked `run` at cutoff `k`.
    *
    * @param run  ranked results: (queryCol, rankCol, itemCol); ranks
    *             1-based within each query (rows with rank > k are
    *             ignored, so passing a deeper run is fine). Duplicate
    *             (query, item) rows inside the top-k are collapsed to
    *             their best (minimum) rank — a malformed run that lists
    *             an item twice cannot inflate hits/dcg past recall = 1
    *             or ndcg = 1
    * @param gold relevant items: (queryCol, itemCol); duplicates are
    *             collapsed
    * @return one row per query WITH relevant items: (queryCol, n_rel,
    *         hits, recall, mrr, ndcg) — hits = relevant in top-k,
    *         recall = hits/n_rel, mrr = 1/first-relevant-rank (0 when
    *         nothing relevant ranked), ndcg in [0,1]. Queries absent
    *         from `gold` have no denominator and are not emitted —
    *         filter them upstream if "no relevant documents" should
    *         score as zero rather than be unmeasurable.
    */
  def binaryMetrics(
      run: DataFrame,
      gold: DataFrame,
      queryCol: String,
      itemCol: String,
      rankCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val g = gold.select(col(queryCol).as("__q"), col(itemCol).as("__item"))
      .distinct()
    val nRel = g.groupBy(col("__q"))
      .agg(count(lit(1)).as("n_rel"))
    val runK = run.select(col(queryCol).as("__q"), col(itemCol).as("__item"),
        col(rankCol).cast("long").as("__r"))
      .filter(col("__r") <= k)
      // collapse duplicate (query, item) rows to the best rank: each
      // relevant item contributes at most one hit / one dcg term
      .groupBy(col("__q"), col("__item"))
      .agg(min(col("__r")).as("__r"))
    // relevant hits with their ranks: one equi-join on (query, item)
    val hits = runK.join(g, Seq("__q", "__item"))
      .groupBy(col("__q"))
      .agg(
        count(lit(1)).as("hits"),
        sum(lit(1.0d) / log(col("__r") + 1)).as("__dcg"),
        min(col("__r")).as("__first"))
    // ideal DCG from n_rel alone: the best possible top-k places
    // min(n_rel, k) relevant items at ranks 1..; tiny codegen fold, k terms
    val idcg = aggregate(
      sequence(lit(1L), least(col("n_rel"), lit(k.toLong))),
      lit(0.0d), (a, i) => a + lit(1.0d) / log(i + 1))
    nRel.join(hits, Seq("__q"), "left")
      .select(
        col("__q").as(queryCol),
        col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") / col("n_rel")).as("recall"),
        coalesce(lit(1.0d) / col("__first"), lit(0.0d)).as("mrr"),
        coalesce(col("__dcg") / idcg, lit(0.0d)).as("ndcg"))
  }
}
