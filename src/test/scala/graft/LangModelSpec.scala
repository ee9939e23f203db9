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

  test("Kneser-Ney: observed probs match brute force; full-vocab sum per context is 1") {
    val corpus = Seq((1L, "a b a b a c"), (2L, "b c b a c c a"), (3L, "c a a b b"))
    val D = 0.75
    // brute-force model from the raw token streams
    val bigrams = corpus.flatMap { case (_, t) =>
      val w = t.split("\\s+"); w.init.zip(w.tail)
    }
    val c12 = bigrams.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val c1 = bigrams.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val n1fw = bigrams.distinct.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val n1bw = bigrams.distinct.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val types = bigrams.distinct.size.toDouble
    def p(w1: String, w2: String): Double =
      math.max(c12.getOrElse((w1, w2), 0.0) - D, 0.0) / c1(w1) +
        ((D * n1fw(w1)) / c1(w1)) * (n1bw(w2) / types)
    // property: summed over EVERY word in the continuation vocabulary
    // (unseen pairs get pure backoff mass), each context's mass is 1
    val vocab = n1bw.keySet
    for (w1 <- c1.keySet) {
      val s = vocab.toSeq.map(p(w1, _)).sum
      assert(math.abs(s - 1.0) < 1e-12, s"context '$w1' sums to $s")
    }
    // and the operator's per-pair probabilities equal the brute force
    val docs = corpus.toDF("doc_id", "text")
    val (scored, _) = LangModel.knProbs(docs, "doc_id", "text", D)
    val got = scored.select("w1", "w2", "__p").distinct()
      .as[(String, String, Double)].collect()
    assert(got.nonEmpty)
    for ((w1, w2, pp) <- got)
      assert(pp == p(w1, w2), s"($w1,$w2): $pp vs ${p(w1, w2)}")
  }

  test("Kneser-Ney: hand-computed score on a fixed corpus, continuation beats raw MLE shape") {
    // corpus "a b a b a c": bigrams ab,ba,ab,ba,ac
    // c(a·)=3, c(b·)=2; c(ab)=2, c(ba)=2, c(ac)=1
    // N1+(a,·)=2, N1+(b,·)=1; N1+(·,b)=1, N1+(·,a)=1, N1+(·,c)=1; types=3
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val D = 0.75
    def p(c12: Double, c1: Double, n1fw: Double, n1bw: Double) =
      math.max(c12 - D, 0.0) / c1 + ((D * n1fw) / c1) * (n1bw / 3.0)
    val pab = p(2, 3, 2, 1); val pba = p(2, 2, 1, 1); val pac = p(1, 3, 2, 1)
    val want = math.rint(
      ((math.log(pab) * 2 + math.log(pba) * 2 + math.log(pac)) / 5) * 1e6) / 1e6
    val got = LangModel.kneserNeyLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 5L, want)))
    // the unseen-in-context mass exists: P(a|a) would be pure continuation
    // mass, and the discounted P(c|a) is strictly below raw MLE 1/3
    assert(pac < 1.0 / 3.0)
  }
}
