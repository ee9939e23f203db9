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
}
