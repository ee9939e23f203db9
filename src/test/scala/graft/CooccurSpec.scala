package graft

import graft.operators.Cooccur

class CooccurSpec extends SparkSpec {
  import spark.implicits._

  // 6 docs, token supports by hand:
  //   a: 5 docs, b: 4, c: 3, d: 1 (hapax), "": never (blank text)
  private val docs = Seq(
    (1L, "a b c"),
    (2L, "a b c"),
    (3L, "a b"),
    (4L, "a b d"),
    (5L, "a c"),
    (6L, "   ")).toDF("doc_id", "text")

  test("PMI matches the hand computation; pairs are (w1 < w2)-canonical") {
    val got = Cooccur.tokenPmiTopK(docs, "doc_id", "text",
        vocabSize = 10, minPairDocs = 1, topK = 100)
      .as[(String, String, Long, Double)].collect()
      .map { case (w1, w2, c, p) => (w1, w2) -> ((c, p)) }.toMap
    def pmi(c12: Long, df1: Long, df2: Long): Double =
      BigDecimal(math.log(c12.toDouble * 6.0 / (df1.toDouble * df2.toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d")))
    assert(got(("a", "b")) == ((4L, pmi(4, 5, 4))))
    assert(got(("a", "c")) == ((3L, pmi(3, 5, 3))))
    assert(got(("b", "c")) == ((2L, pmi(2, 4, 3))))
    assert(got(("a", "d")) == ((1L, pmi(1, 5, 1))))
    // (b,d) co-occur in doc 4 only; ln(1*6/(4*1)) — positive association
    assert(got(("b", "d")) == ((1L, pmi(1, 4, 1))))
  }

  test("vocabulary cut is by (df desc, token) and bounds the pair space") {
    // vocabSize=2 keeps {a, b} only — every pair touching c/d disappears
    val got = Cooccur.tokenPmiTopK(docs, "doc_id", "text",
        vocabSize = 2, minPairDocs = 1, topK = 100)
      .as[(String, String, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSeq == Seq(("a", "b")))
    // df tie: c(3) vs a tie-breaking token — cut is deterministic across
    // reruns (same plan, same result)
    val twice = Cooccur.tokenPmiTopK(docs, "doc_id", "text",
        vocabSize = 3, minPairDocs = 1, topK = 100)
      .as[(String, String, Long, Double)].collect().toSeq
    val again = Cooccur.tokenPmiTopK(docs, "doc_id", "text",
        vocabSize = 3, minPairDocs = 1, topK = 100)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(twice == again && twice.nonEmpty)
  }

  test("minPairDocs floor drops weakly-supported pairs; token multiplicity ignored") {
    // "a a a b": document-level support counts the DOC once, not the tf
    val rep = Seq((1L, "a a a b"), (2L, "a b"), (3L, "a x")).toDF("doc_id", "text")
    val got = Cooccur.tokenPmiTopK(rep, "doc_id", "text",
        vocabSize = 10, minPairDocs = 2, topK = 10)
      .as[(String, String, Long, Double)].collect()
    assert(got.map(r => ((r._1, r._2), r._3)).toMap == Map(("a", "b") -> 2L))
  }

  test("empty corpus and all-blank corpus yield empty results") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Cooccur.tokenPmiTopK(empty, "doc_id", "text", 5, 1, 5).count() == 0)
    val blank = Seq((1L, ""), (2L, "  ")).toDF("doc_id", "text")
    assert(Cooccur.tokenPmiTopK(blank, "doc_id", "text", 5, 1, 5).count() == 0)
  }
}
