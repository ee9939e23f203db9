package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 document ranking — the standard lexical relevance score used to
  * retrieve / filter web-scale training corpora against a query (quality
  * filtering, topic targeting, retrieval-based decontamination).
  *
  *   score(d, q) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1-b+b·|d|/avgdl))
  *   idf(t)      = ln( (N - df(t) + 0.5) / (df(t) + 0.5) + 1 )
  *
  * Plan shape (all hash aggregations + one broadcast, no window over the
  * corpus): tokenize+explode once; per-doc length and per-(doc,term) tf are
  * map-side-combining aggregates; corpus constants (N, avgdl) and the
  * per-term df for the handful of query terms collapse to a one-row /
  * |terms|-row table that broadcasts. At 100 TB the only big shuffles are
  * the two content-keyed aggregations — the same shape DuckDB/Trino plan
  * for this query.
  *
  * Float determinism (the q70/q49 lessons): the per-term partial scores are
  * summed in a FIXED order — one `max(CASE term)` column per query term,
  * added left-to-right — never a float `sum()` over rows, so the result is
  * bit-reproducible across engines and partitionings; ranking is over the
  * ROUNDED score with an id tiebreak.
  */
object Ranking {

  val DefaultK1 = 1.2
  val DefaultB = 0.75

  /** Top-k docs by BM25 against `terms`. Output: (idCol, score, n_terms_hit),
    * ordered by (score desc, idCol), `topK` rows. `terms` must be distinct
    * lowercase tokens.
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = DefaultK1,
      b: Double = DefaultB,
      topK: Int = 20): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms)
    val id = col(idCol)

    val toks = docs.select(id, explode(Dedup.tokens(col(textCol))).as("__tok"))
    // per-doc length (long-exact) — docs with zero tokens score nothing,
    // matching the oracle which derives lengths from the token stream
    val dl = toks.groupBy(idCol).agg(count(lit(1)).as("__dl"))
    // corpus constants: N docs and average doc length. sum(long)/count is
    // exact integer arithmetic followed by ONE division — deterministic,
    // unlike avg() whose accumulation order floats.
    val consts = dl.agg(
      count(lit(1)).cast("double").as("__n"),
      (sum("__dl").cast("double") / count(lit(1)).cast("double")).as("__avgdl"))
    val tf = toks
      .filter(col("__tok").isin(terms: _*))
      .groupBy(id, col("__tok"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    val dfreq = tf.groupBy("__tok").agg(count(lit(1)).cast("double").as("__df"))

    val partial = tf
      .join(broadcast(dfreq), "__tok")
      .join(dl, idCol)
      .crossJoin(broadcast(consts))
      .withColumn("__s",
        log((col("__n") - col("__df") + 0.5) / (col("__df") + 0.5) + 1.0) *
          (col("__tf") * (k1 + 1.0)) /
          (col("__tf") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))

    // fixed-order summation: one pivoted column per term, added as written
    val termCols = terms.map(t =>
      coalesce(max(when(col("__tok") === t, col("__s"))), lit(0.0)))
    val score = round(termCols.reduceLeft(_ + _), 6)
    partial
      .groupBy(idCol)
      .agg(score.as("score"), count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score").desc, id)
      .limit(topK)
  }

  /** Inverted index over the corpus: one row per term with its document
    * frequency and the head of its sorted posting list — the
    * retrieval-side artifact BM25 (and any lexical search) is served
    * from. Sub-`minDf` terms are dropped (hapax noise); posting lists are
    * TRUNCATED to `postingsCap` entries, because a stopword's full
    * posting list is the whole corpus — the skew hazard a production
    * index tiers or elides. df stays exact even where postings truncate,
    * so scoring (idf) is unaffected by the cap.
    *
    * Plan shape: distinct (term, doc) pairs (one hash aggregate), then
    * one term-keyed aggregate building df + postings together. At 100 TB
    * the un-truncated collect_list of a stopword would be the one
    * unbounded per-key state here; production shape is a two-level
    * aggregate (partial sorted runs, merge-take-cap) — at this scale the
    * single collect + slice keeps the same output contract. Postings are
    * emitted as a comma-joined sorted string (the cross-engine-comparable
    * form; at scale the array column would be kept as-is). The
    * transform() lambda is interpreted but runs once per TERM over a
    * ≤postingsCap slice — post-aggregation, not on the corpus scan (the
    * q76 lesson applies to per-row hot paths).
    *
    * Returns (term, df, postings), ordered by term.
    */
  def invertedIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Int,
      postingsCap: Int): DataFrame =
    docs
      .select(col(idCol).as("__id"),
        explode(array_distinct(Dedup.tokens(col(textCol)))).as("term"))
      .filter(length(col("term")) >= 1)
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        expr(s"array_join(transform(slice(array_sort(collect_list(__id)), 1, " +
          s"$postingsCap), x -> cast(x AS string)), ',')").as("postings"))
      .filter(col("df") >= minDf)
      .orderBy("term")

  /** The DuckDB-SQL twin of [[bm25TopK]] (same arithmetic, same fixed-order
    * summation) for oracle pairing.
    */
  def bm25Sql(
      terms: Seq[String],
      k1: Double = DefaultK1,
      b: Double = DefaultB,
      topK: Int = 20): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    val termSum = terms
      .map(t => s"coalesce(max(CASE WHEN __tok = '$t' THEN __s END), 0.0)")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS __tok
       |  FROM documents),
       |dl AS (SELECT doc_id, count(*) AS __dl FROM toks GROUP BY doc_id),
       |consts AS (
       |  SELECT count(*)::DOUBLE AS __n,
       |    sum(__dl)::DOUBLE / count(*)::DOUBLE AS __avgdl FROM dl),
       |tf AS (
       |  SELECT doc_id, __tok, count(*)::DOUBLE AS __tf FROM toks
       |  WHERE __tok IN ($inList) GROUP BY doc_id, __tok),
       |dfreq AS (SELECT __tok, count(*)::DOUBLE AS __df FROM tf GROUP BY __tok),
       |partial AS (
       |  SELECT tf.doc_id, tf.__tok,
       |    ln((__n - __df + 0.5) / (__df + 0.5) + 1.0) *
       |      (__tf * ($k1 + 1.0)) /
       |      (__tf + $k1 * (1.0 - $b + $b * __dl / __avgdl)) AS __s
       |  FROM tf JOIN dfreq USING (__tok) JOIN dl USING (doc_id), consts)
       |SELECT doc_id, round($termSum, 6) AS score, count(*) AS n_terms_hit
       |FROM partial GROUP BY doc_id
       |ORDER BY score DESC, doc_id LIMIT $topK""".stripMargin
  }

  /** Document-as-query BM25: every document selected by `queryPred` is a
    * QUERY whose terms are its own distinct tokens, ranked against the
    * rest of the corpus — the retrieval shape behind "find training docs
    * like these seeds" curation and the lexical leg of hybrid search.
    *
    * Scale shape: per-(doc,term) tf and per-doc length are the same two
    * content-keyed aggregates as [[bm25TopK]]; the query term table
    * (|queries| × terms-per-doc rows) broadcasts into the tf join, so the
    * corpus-side candidate generation is ONE broadcast-joined scan of tf
    * — no shuffle keyed on the (skewed) term. Stopword elision is
    * structural, not cosmetic: a term appearing in more than
    * `maxDfFrac`·N docs would alone make the candidate set O(corpus) per
    * query (its posting list IS the corpus), exactly the skew a
    * production engine removes with impact-ordered/WAND pruning; the cap
    * is a deterministic integer rule the oracle replays. The final
    * per-query cut rides [[SimilaritySearch.rankTopK]]'s bounded
    * partial-top-k aggregate, not a window over the candidate stream.
    *
    * Float determinism: per-(query,doc) scores sum a VARIABLE number of
    * terms, so fixed-column addition (the [[bm25TopK]] recipe) doesn't
    * apply; instead the per-term partials are folded left-to-right from a
    * first-element seed in TERM order (the q99 `seededFold` recipe —
    * DuckDB `list_reduce(list(s ORDER BY term), ..)` is bit-identical),
    * then ROUNDED to 6 dp before ranking with a doc-id tiebreak.
    *
    * Returns (query_id, rank, doc_id, score), `topK` rows per query; the
    * query doc itself is excluded from its own candidates.
    */
  def bm25QueryDocTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryPred: Column,
      k1: Double = DefaultK1,
      b: Double = DefaultB,
      topK: Int = 20,
      maxDfFrac: Double = 0.5): DataFrame = {
    val toks = docs.select(col(idCol), explode(Dedup.tokens(col(textCol))).as("__tok"))
    val dl = toks.groupBy(idCol).agg(count(lit(1)).as("__dl"))
    val consts = dl.agg(
      count(lit(1)).cast("double").as("__n"),
      (sum("__dl").cast("double") / count(lit(1)).cast("double")).as("__avgdl"))
    val tf = toks.groupBy(col(idCol), col("__tok"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    val dfreq = tf.groupBy("__tok").agg(count(lit(1)).cast("double").as("__df"))

    // query term sets = the query docs' own tf rows (distinct by design)
    val qt = tf.filter(queryPred).select(col(idCol).as("query_id"), col("__tok"))
    // df for query terms only (small), with the stopword-elision cap
    val keep = dfreq
      .join(broadcast(qt.select("__tok").distinct()), "__tok")
      .crossJoin(broadcast(consts))
      .filter(col("__df") <= lit(maxDfFrac) * col("__n"))
      .select(col("__tok"), col("__df"))
    val qtk = qt.join(broadcast(keep), "__tok")

    val cand = tf
      .join(broadcast(qtk), "__tok")
      .filter(col(idCol) =!= col("query_id"))
      .join(dl, idCol)
      .crossJoin(broadcast(consts))
      .withColumn("__s",
        log((col("__n") - col("__df") + 0.5) / (col("__df") + 0.5) + 1.0) *
          (col("__tf") * (k1 + 1.0)) /
          (col("__tf") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))

    // seeded left-fold in term order (bit-identical to DuckDB list_reduce
    // over list(s ORDER BY term) — the shared cross-engine fold recipe)
    val termScores = transform(
      array_sort(collect_list(struct(col("__tok").as("t"), col("__s").as("s")))),
      x => x.getField("s"))
    val folded = aggregate(
      slice(termScores, lit(2), greatest(size(termScores) - 1, lit(0))),
      element_at(termScores, 1), (a, x) => a + x)
    val scored = cand
      .groupBy(col("query_id"), col(idCol))
      .agg(round(folded, 6).as("cosine"))
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("cosine"))
    SimilaritySearch.rankTopK(scored, topK)
      .select(col("query_id"), col("rank"),
        col("neighbor_id").as("doc_id"), col("cosine").as("score"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher 2009) of a lexical
    * and a dense run: rrf(d) = Σ_runs 1/(rrfK + rank_run(d)), summed in
    * fixed run order (lexical + dense — two coalesced terms, never a
    * float `sum()`), so the fused score is a pure function of the two
    * integer ranks and bit-identical on any engine. Inputs are ALREADY
    * top-k-cut per system, so the fusion join and the per-query re-rank
    * window touch ≤ 2k rows per query — bounded at any corpus size; the
    * scale cost lives entirely in the upstream runs.
    *
    * `lex`/`dense`: (query_id, rank, doc_id, …). Returns (query_id, rank,
    * doc_id, rrf_score, lex_rank, dense_rank) with `topK` rows per query,
    * ranked by (exact rrf desc, doc_id); absent-in-one-run docs carry a
    * null rank on that side.
    */
  def rrfFuse(
      lex: DataFrame,
      dense: DataFrame,
      rrfK: Int = 60,
      topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = lex.select(col("query_id"), col("doc_id"), col("rank").as("lex_rank"))
    val d = dense.select(col("query_id"), col("doc_id"), col("rank").as("dense_rank"))
    val fused = l.join(d, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("__rrf",
        coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("dense_rank")), lit(0.0)))
    val w = Window.partitionBy("query_id").orderBy(col("__rrf").desc, col("doc_id"))
    fused
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("__rrf"), 6).as("rrf_score"),
        col("lex_rank"), col("dense_rank"))
  }

  /** DuckDB oracle for the q206 hybrid pipeline: [[bm25QueryDocTopK]]
    * (doc_id % `queryMod` = 0 queries over `documents`) fused by
    * [[rrfFuse]] with a dense brute-force cosine run over `embeddings`
    * (same id space). Every stage replays the exact arithmetic: the
    * seeded term-order fold, the ROUNDED-score lexical rank, the raw-
    * cosine dense rank (the q40 recipe), and the two-term rrf sum.
    */
  def hybridRrfSql(
      queryMod: Int,
      k1: Double = DefaultK1,
      b: Double = DefaultB,
      runK: Int = 20,
      maxDfFrac: Double = 0.5,
      rrfK: Int = 60,
      topK: Int = 10): String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS __tok
       |  FROM documents),
       |dl AS (SELECT doc_id, count(*) AS __dl FROM toks GROUP BY doc_id),
       |consts AS (
       |  SELECT count(*)::DOUBLE AS __n,
       |    sum(__dl)::DOUBLE / count(*)::DOUBLE AS __avgdl FROM dl),
       |tf AS (
       |  SELECT doc_id, __tok, count(*)::DOUBLE AS __tf FROM toks
       |  GROUP BY doc_id, __tok),
       |dfreq AS (SELECT __tok, count(*)::DOUBLE AS __df FROM tf GROUP BY __tok),
       |qt AS (SELECT doc_id AS query_id, __tok FROM tf WHERE doc_id % $queryMod = 0),
       |keep AS (
       |  SELECT __tok, __df FROM dfreq, consts
       |  WHERE __df <= $maxDfFrac * __n
       |    AND __tok IN (SELECT DISTINCT __tok FROM qt)),
       |cand AS (
       |  SELECT qt.query_id, tf.doc_id,
       |    ln((__n - __df + 0.5) / (__df + 0.5) + 1.0) *
       |      (__tf * ($k1 + 1.0)) /
       |      (__tf + $k1 * (1.0 - $b + $b * __dl / __avgdl)) AS __s,
       |    tf.__tok
       |  FROM qt JOIN keep USING (__tok) JOIN tf USING (__tok)
       |    JOIN dl ON dl.doc_id = tf.doc_id, consts
       |  WHERE tf.doc_id <> qt.query_id),
       |lexs AS (
       |  SELECT query_id, doc_id,
       |    round(list_reduce(list(__s ORDER BY __tok), (a, x) -> a + x), 6)
       |      AS __score
       |  FROM cand GROUP BY query_id, doc_id),
       |lex AS (
       |  SELECT query_id, doc_id, CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY __score DESC, doc_id) AS BIGINT) AS lex_rank
       |  FROM lexs QUALIFY lex_rank <= $runK),
       |dscored AS (
       |  SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
       |    list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[])
       |      AS __cos
       |  FROM embeddings q JOIN embeddings e
       |    ON q.vec_id % $queryMod = 0 AND e.vec_id <> q.vec_id),
       |dense AS (
       |  SELECT query_id, doc_id, CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY __cos DESC, doc_id) AS BIGINT) AS dense_rank
       |  FROM dscored QUALIFY dense_rank <= $runK),
       |fused AS (
       |  SELECT query_id, doc_id,
       |    coalesce(1.0 / ($rrfK + lex_rank), 0.0)
       |      + coalesce(1.0 / ($rrfK + dense_rank), 0.0) AS __rrf,
       |    lex_rank, dense_rank
       |  FROM lex FULL OUTER JOIN dense USING (query_id, doc_id))
       |SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY __rrf DESC, doc_id) AS BIGINT) AS rank,
       |  doc_id, round(__rrf, 6) AS rrf_score, lex_rank, dense_rank
       |FROM fused QUALIFY rank <= $topK ORDER BY query_id, rank""".stripMargin
}
