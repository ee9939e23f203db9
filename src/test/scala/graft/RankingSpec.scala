package graft

import graft.operators.Ranking

class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("invertedIndex: exact df, sorted capped postings, minDf floor") {
    val docs = Seq(
      (30L, "x y"),
      (10L, "x y z"),
      (20L, "x y y"),   // repeated token counts the doc once
      (40L, "x"),
      (50L, " ")).toDF("doc_id", "text")
    val got = Ranking.invertedIndex(docs, "doc_id", "text",
        minDf = 2, postingsCap = 2)
      .as[(String, Long, String)].collect().toSeq
    // z is df=1 (below floor); postings sorted by id and truncated at 2
    // while df stays exact (x: df=4, postings head 10,20)
    assert(got == Seq(("x", 4L, "10,20"), ("y", 3L, "10,20")))
  }

  test("invertedIndex: postings shorter than the cap are kept whole") {
    val docs = Seq((2L, "q"), (1L, "q")).toDF("doc_id", "text")
    val got = Ranking.invertedIndex(docs, "doc_id", "text",
        minDf = 1, postingsCap = 10)
      .as[(String, Long, String)].collect().toSeq
    assert(got == Seq(("q", 2L, "1,2")))
  }

  test("invertedIndex is empty-input safe") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Ranking.invertedIndex(empty, "doc_id", "text", 1, 5).count() == 0)
  }

  test("bm25QueryDocTopK: query doc's own terms, self excluded, stopwords elided") {
    import org.apache.spark.sql.functions.col
    // 'the' appears in 4/5 docs (df 0.8 > 0.5 cap → elided); 'spark' in 2.
    val docs = Seq(
      (0L, "spark the query"),
      (1L, "spark the engine"),
      (2L, "the engine room"),
      (3L, "the other doc"),
      (4L, "unrelated text")).toDF("doc_id", "text")
    val got = Ranking.bm25QueryDocTopK(docs, "doc_id", "text",
        queryPred = col("doc_id") === 0, topK = 5)
      .select("query_id", "rank", "doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    // query terms = {spark, the, query}; 'the' elided, 'query' only in the
    // query doc itself → candidates come from 'spark' alone = doc 1; doc 0
    // never ranks itself.
    assert(got == Seq((0L, 1L, 1L)))
  }

  test("bm25QueryDocTopK: more shared rare terms rank higher; rounded-score doc_id tiebreak") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha beta x"),    // shares 2 query terms
      (2L, "alpha y z"),       // shares 1
      (3L, "alpha y q"),       // shares 1, same tf/dl as doc 2 → tie with it
      (4L, "w v u")).toDF("doc_id", "text")
    val got = Ranking.bm25QueryDocTopK(docs, "doc_id", "text",
        queryPred = col("doc_id") === 0, maxDfFrac = 1.0, topK = 5)
      .select("rank", "doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("rrfFuse: fixed-order rrf sum, null rank on the absent side, doc_id tiebreak") {
    val lex = Seq((1L, 1L, 10L), (1L, 2L, 20L))
      .toDF("query_id", "rank", "doc_id")
    val dense = Seq((1L, 1L, 20L), (1L, 2L, 30L))
      .toDF("query_id", "rank", "doc_id")
    val got = Ranking.rrfFuse(lex, dense, rrfK = 60, topK = 10)
      .as[(Long, Long, Long, Double, Option[Long], Option[Long])]
      .collect().toSeq.sortBy(_._2)
    // doc 20: 1/62 + 1/61; doc 10: 1/61; doc 30: 1/62 — 10 beats 30
    // (1/61 > 1/62); absent sides carry null ranks.
    assert(got.map(r => (r._2, r._3, r._5, r._6)) == Seq(
      (1L, 20L, Some(2L), Some(1L)),
      (2L, 10L, Some(1L), None),
      (3L, 30L, None, Some(2L))))
    assert(math.abs(got.head._4 - math.rint((1.0 / 62 + 1.0 / 61) * 1e6) / 1e6) < 1e-12)
  }

  test("rrfFuse: equal rrf scores break ties by doc_id") {
    // lex rank 3 for doc 7 vs dense rank 3 for doc 5 → identical 1/63.
    val lex = Seq((1L, 3L, 7L)).toDF("query_id", "rank", "doc_id")
    val dense = Seq((1L, 3L, 5L)).toDF("query_id", "rank", "doc_id")
    val got = Ranking.rrfFuse(lex, dense)
      .select("rank", "doc_id").as[(Long, Long)].collect().toSeq
    assert(got.sorted == Seq((1L, 5L), (2L, 7L)))
  }
}
