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
}
