package graft

import graft.operators.LangModel

/** Corpus-trained bigram LM scoring and the CCNet head/middle/tail
  * bucketing built on it.
  */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("bigramLogProb: exact closed-form score on a tiny corpus") {
    // corpus bigrams: (p,q) ×4 from d1..d4, (p,r) ×1 from d5
    // → c1(p)=5, so d1..d4 score ln(4/5), d5 scores ln(1/5)
    val docs = Seq(
      (1L, "p q"), (2L, "p q"), (3L, "p q"), (4L, "p q"),
      (5L, "p r"), (6L, "z")).toDF("doc_id", "text")
    val byId = LangModel.bigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(byId(1L) == math.rint(math.log(4.0 / 5.0) * 1e6) / 1e6)
    assert(byId(5L) == math.rint(math.log(1.0 / 5.0) * 1e6) / 1e6)
    // the single-token doc has no bigrams and no score row
    assert(!byId.contains(6L))
  }

  test("perplexityBuckets: per-language ntile thirds, unscorable docs drop") {
    val docs = Seq(
      (1L, "p q", "en", 10L), (2L, "p q", "en", 10L),
      (3L, "p q", "en", 10L), (4L, "p q", "en", 10L),
      (5L, "p r", "en", 10L), (6L, "z", "en", 10L)).toDF(
      "doc_id", "text", "lang", "n_chars")
    val got = LangModel.perplexityBuckets(docs, "doc_id", "text", "lang", "n_chars")
      .as[(String, String, Long, Long, Double, Double)].collect().toSeq
    // 5 scorable docs → tiles of 2/2/1 (ties broken by doc_id); doc 6 gone
    assert(got.map(r => (r._1, r._2, r._3, r._4)) == Seq(
      ("en", "head", 2L, 20L), ("en", "middle", 2L, 20L),
      ("en", "tail", 1L, 10L)))
    val tail = got.find(_._2 == "tail").get
    assert(tail._5 == math.rint(math.log(0.2) * 1e6) / 1e6 && tail._5 == tail._6)
  }

  test("perplexityBuckets partitions by language independently") {
    val docs = Seq(
      (1L, "a b", "en", 1L), (2L, "a b", "en", 1L), (3L, "a c", "en", 1L),
      (4L, "x y", "de", 1L), (5L, "x y", "de", 1L), (6L, "x z", "de", 1L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val got = LangModel.perplexityBuckets(docs, "doc_id", "text", "lang", "n_chars")
      .as[(String, String, Long, Long, Double, Double)].collect().toSeq
    // each language gets its own 1/1/1 thirds
    assert(got.map(r => (r._1, r._2, r._3)) == Seq(
      ("de", "head", 1L), ("de", "middle", 1L), ("de", "tail", 1L),
      ("en", "head", 1L), ("en", "middle", 1L), ("en", "tail", 1L)))
  }
}
