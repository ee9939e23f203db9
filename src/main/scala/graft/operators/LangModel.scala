package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model scoring — the KenLM-style
  * perplexity proxy used to quality-filter web-scale training data (docs
  * whose token transitions are improbable under the corpus model are
  * gibberish / boilerplate / wrong-language candidates).
  *
  * Model: P(w2 | w1) = c(w1,w2) / c(w1·), both counts taken over the FULL
  * corpus bigram stream; a document's score is the mean log-probability of
  * its bigrams. Trained and scored in one job: the count tables are hash
  * aggregates over the bigram stream, scoring re-joins the (optionally
  * subset) stream against them.
  *
  * Plan shape / 100 TB posture: bigrams come from exploding an index
  * sequence + two `element_at` lookups (codegen'd — never a transform()
  * lambda materializing struct arrays, the q76 lesson). Counts are
  * map-side-combining hash aggregates keyed by content. The scoring joins
  * are equi-joins on (w1,w2) / (w1); for natural-language vocabularies the
  * count tables are millions of rows — broadcastable at the low end, plain
  * shuffle joins beyond; either way no pairwise blowup anywhere. Scoring a
  * SUBSET (the common "train on all, score the new batch" shape) pushes
  * the subset filter into the probe side only — the model side stays full.
  */
object LangModel {

  /** (idCol, w1, w2) bigram stream of the corpus, in-document adjacency. */
  private def bigrams(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), Dedup.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol), col("__toks"),
        explode(expr("sequence(1, size(__toks) - 1)")).as("__i"))
      .select(col(idCol),
        element_at(col("__toks"), col("__i")).as("w1"),
        element_at(col("__toks"), col("__i") + 1).as("w2"))

  /** Mean bigram log-prob per document, model trained on the whole `df`
    * corpus, scores emitted for docs passing `scoreFilter` (null = all).
    * Output: (idCol, n_bigrams, avg_logp rounded to 6 dp). Every scored
    * bigram exists in the model by construction (trained on a superset),
    * so no smoothing term is needed for finiteness.
    */
  def bigramLogProb(
      df: DataFrame,
      idCol: String,
      textCol: String,
      scoreFilter: org.apache.spark.sql.Column = null): DataFrame = {
    val bi = bigrams(df, idCol, textCol)
    val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).cast("double").as("__c12"))
    val c1 = bi.groupBy("w1").agg(count(lit(1)).cast("double").as("__c1"))
    val probe = if (scoreFilter == null) bi else bi.filter(scoreFilter)
    probe
      .join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(log(col("__c12") / col("__c1"))), 6).as("avg_logp"))
  }

  /** CCNet-style per-language quality bucketing (Wenzek et al. 2020):
    * score every document with the corpus-trained [[bigramLogProb]]
    * (the perplexity proxy), then split EACH language's documents into
    * head/middle/tail thirds by score — the pipeline that trains on
    * "head" web data and drops the tail. Documents with fewer than two
    * tokens have no bigrams, hence no score, hence no bucket — exactly
    * CCNet's "unscorable" drop.
    *
    * Bucketing is exact ntile(3) over the TOTAL order (rounded score
    * desc, doc id) — deterministic and oracle-replayable; at extreme
    * scale the same cut points would come from an approximate quantile
    * pass instead of a per-language sort, but the window here is
    * bounded by the language partition, which is also how CCNet shards.
    *
    * Returns one row per (langCol, bucket): n_docs, total of `massCol`,
    * min/max score (order-free aggregates — never a float sum over a
    * variable row set), ordered by (lang, bucket).
    */
  def perplexityBuckets(
      df: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      massCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scores = bigramLogProb(df, idCol, textCol)
    val w = Window.partitionBy(langCol)
      .orderBy(col("avg_logp").desc, col(idCol))
    df.select(col(idCol), col(langCol), col(massCol))
      .join(scores, idCol)
      .withColumn("__tile", ntile(3).over(w))
      .withColumn("bucket",
        when(col("__tile") === 1, "head")
          .when(col("__tile") === 2, "middle").otherwise("tail"))
      .groupBy(col(langCol), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(massCol).cast("long").as("total_mass"),
        min("avg_logp").as("min_score"),
        max("avg_logp").as("max_score"))
      .orderBy(col(langCol), col("bucket"))
  }

  // ------------------------------------------------- Kneser-Ney smoothing

  /** Interpolated Kneser-Ney bigram probabilities (Kneser & Ney 1995;
    * the formulation in Chen & Goodman 1998 §2.7, fixed discount):
    *
    * {{{
    *   P(w2|w1) = max(c(w1,w2) − D, 0) / c(w1·)
    *            + (D · N1+(w1,·) / c(w1·)) · N1+(·,w2) / N1+(·,·)
    * }}}
    *
    * The continuation distribution asks "in how many distinct contexts
    * does w2 complete a bigram" rather than "how often does w2 occur" —
    * the fix for the raw-MLE model's ([[bigramLogProb]]) blindness to
    * words that are frequent only inside one collocation. Per context
    * w1 the probabilities sum to exactly 1 over the observed
    * continuation vocabulary (spec-pinned).
    *
    * Every input to the formula is an exact integer count (two hash
    * aggregates + one count of bigram types, all map-side combining);
    * the float arithmetic is a fixed IEEE expression tree over them, so
    * the scores replay bit-identically in DuckDB (q232). N1+(·,·) is a
    * one-row frame broadcast onto the probe — never a driver round trip.
    */
  private[graft] def knProbs(
      df: DataFrame, idCol: String, textCol: String,
      discount: Double): (DataFrame, DataFrame) = {
    require(discount > 0 && discount < 1, s"discount $discount outside (0,1)")
    val bi = bigrams(df, idCol, textCol)
    val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).cast("double").as("__c12"))
    val c1 = bi.groupBy("w1").agg(count(lit(1)).cast("double").as("__c1"),
      countDistinct(col("w2")).cast("double").as("__n1fw"))
    val cont = bi.groupBy("w2").agg(countDistinct(col("w1")).cast("double").as("__n1bw"))
    val types = c12.agg(count(lit(1)).cast("double").as("__t"))
    val d = lit(discount)
    val scored = bi
      .join(c12, Seq("w1", "w2")).join(c1, Seq("w1")).join(cont, Seq("w2"))
      .crossJoin(broadcast(types))
      .withColumn("__p",
        greatest(col("__c12") - d, lit(0.0)) / col("__c1") +
          ((d * col("__n1fw")) / col("__c1")) * (col("__n1bw") / col("__t")))
    (scored, bi)
  }

  /** Mean interpolated-KN bigram log-probability per document — the
    * [[bigramLogProb]] quality score under a real smoothed model.
    * Output: (idCol, n_bigrams, avg_kn_logp rounded to 6 dp).
    */
  def kneserNeyLogProb(
      df: DataFrame,
      idCol: String,
      textCol: String,
      discount: Double = 0.75,
      scoreFilter: org.apache.spark.sql.Column = null): DataFrame = {
    val (scored, _) = knProbs(df, idCol, textCol, discount)
    val probe = if (scoreFilter == null) scored else scored.filter(scoreFilter)
    probe
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(log(col("__p"))), 6).as("avg_kn_logp"))
  }
}
