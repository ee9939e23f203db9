package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token co-occurrence / pointwise mutual information over a document
  * corpus — the association-mining pass behind collocation extraction,
  * topic seeding, and embedding-free related-term suggestion in a
  * training-data pipeline. SURVEY.md §2.11 scope; no reference analog.
  *
  * Plan shape (the 100 TB story): the quadratic hazard in co-occurrence is
  * the within-document pair explosion — a document with d distinct tokens
  * emits C(d, 2) pairs. The operator bounds d by restricting both sides to
  * a TOP-`vocabSize` document-frequency vocabulary before pairing: the
  * vocabulary is an aggregate of the (doc, token) stream (tiny — one row
  * per kept term) broadcast back as a semi-filter, so the pair join fans
  * out at most min(d, V)² per document and the pair-key space is capped at
  * C(V, 2) regardless of corpus size. Rare-token PMI is meaningless
  * anyway (PMI degenerates at low support — Church & Hanks' original
  * caveat), so the cap loses nothing the `minPairDocs` floor wouldn't
  * drop. Document count joins in as a broadcast 1-row aggregate — the
  * plan stays fully lazy, no driver-side action.
  */
object Cooccur {

  /** Top-`topK` token pairs by PMI = ln(P(w1,w2) / (P(w1)·P(w2))), with
    * probabilities as document-level supports (standard for corpus
    * association): P(w) = df(w)/N, P(w1,w2) = df(w1∧w2)/N. Pairs below
    * `minPairDocs` joint support are dropped. Returns
    * (w1, w2, c12, pmi[6dp]), ordered by (pmi desc, w1, w2) — the cut
    * ranks on the ROUNDED score so it is stable across engines (the q70
    * top-k lesson).
    */
  def tokenPmiTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocabSize: Int,
      minPairDocs: Int,
      topK: Int): DataFrame = {
    // distinct (doc, token) stream: document-level support, not term freq
    val toks = docs
      .select(col(idCol).as("__id"),
        explode(array_distinct(Dedup.tokens(col(textCol)))).as("__tok"))
      .filter(length(col("__tok")) >= 1)
    val dfCounts = toks.groupBy("__tok").agg(count(lit(1)).as("__df"))
    // deterministic vocabulary cut: df desc, then token (total order)
    val vocab = dfCounts.orderBy(col("__df").desc, col("__tok")).limit(vocabSize)

    // df rides along through the pair aggregation (constant per pair key),
    // saving two joins back onto the vocabulary afterwards
    val vt = toks.join(broadcast(vocab), "__tok")
    val pairs = vt.select(col("__id"), col("__tok").as("w1"), col("__df").as("__df1"))
      .join(vt.select(col("__id"), col("__tok").as("w2"), col("__df").as("__df2")),
        "__id")
      .filter(col("w1") < col("w2"))
      .groupBy("w1", "w2", "__df1", "__df2")
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minPairDocs)

    val nDocs = docs.agg(count(lit(1)).cast("double").as("__n"))
    pairs.crossJoin(broadcast(nDocs))
      .select(col("w1"), col("w2"), col("c12"),
        // every operand is an integer exactly represented in double, so
        // the quotient and ln round identically across engines; 6dp grid
        // sits ~10 orders above libm 1-ulp noise
        round(log(col("c12").cast("double") * col("__n") /
          (col("__df1").cast("double") * col("__df2").cast("double"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
  }
}
