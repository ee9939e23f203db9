package graft

import org.apache.spark.sql.functions._

import graft.operators.RetrievalEval

/** Hand-computed binary-relevance retrieval metrics (recall@k, MRR,
  * nDCG@k) — each value derived on paper next to its assert.
  */
class RetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  private def ln(x: Double) = math.log(x)

  test("binaryMetrics: hand-computed recall, MRR and nDCG at k=3") {
    // run (query, rank, item): q1 ranks [A, B, C, D]; q2 ranks [X, Y, Z]
    val run = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "C"), (1L, 4L, "D"),
      (2L, 1L, "X"), (2L, 2L, "Y"), (2L, 3L, "Z"))
      .toDF("query_id", "rank", "item")
    // gold: q1 → {B, D, E} (B hits at rank 2; D is OUTSIDE the k=3 cut;
    // E never retrieved); q2 → {X, Z} (ranks 1 and 3); q3 → {M} (query
    // with relevant items but no run rows at all)
    val gold = Seq(
      (1L, "B"), (1L, "D"), (1L, "E"),
      (2L, "X"), (2L, "Z"),
      (3L, "M"))
      .toDF("query_id", "item")

    val m = RetrievalEval.binaryMetrics(run, gold, "query_id", "item", "rank", k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap

    // q1: n_rel=3, hits@3 = {B@2} = 1, recall = 1/3, mrr = 1/2,
    // dcg = 1/ln(3); idcg (3 relevant, k=3) = 1/ln2 + 1/ln3 + 1/ln4
    val (n1, h1, r1, mrr1, ndcg1) = m(1L)
    assert(n1 === 3L && h1 === 1L)
    assert(math.abs(r1 - 1.0 / 3) < 1e-12)
    assert(math.abs(mrr1 - 0.5) < 1e-12)
    val idcg1 = 1 / ln(2) + 1 / ln(3) + 1 / ln(4)
    assert(math.abs(ndcg1 - (1 / ln(3)) / idcg1) < 1e-12)

    // q2: n_rel=2, hits = {X@1, Z@3} = 2, recall = 1, mrr = 1,
    // dcg = 1/ln2 + 1/ln4; idcg (2 relevant) = 1/ln2 + 1/ln3
    val (n2, h2, r2, mrr2, ndcg2) = m(2L)
    assert(n2 === 2L && h2 === 2L && r2 === 1.0 && mrr2 === 1.0)
    assert(math.abs(ndcg2 - (1 / ln(2) + 1 / ln(4)) / (1 / ln(2) + 1 / ln(3))) < 1e-12)

    // q3: relevant items exist, nothing retrieved → all-zero row (the
    // model whiffed; the query is still measurable)
    val (n3, h3, r3, mrr3, ndcg3) = m(3L)
    assert(n3 === 1L && h3 === 0L && r3 === 0.0 && mrr3 === 0.0 && ndcg3 === 0.0)

    // queries absent from gold are NOT emitted (no denominator)
    assert(!m.contains(4L) && m.size === 3)

    // rows with rank > k must not leak into the metrics: D at rank 4
    // contributed nothing to q1 above; a deeper run changes nothing
    val deeper = RetrievalEval.binaryMetrics(
      run.unionByName(Seq((1L, 5L, "E")).toDF("query_id", "rank", "item")),
      gold, "query_id", "item", "rank", k = 3)
    assert(deeper.filter($"query_id" === 1L).select("hits").as[Long].head() === 1L)
  }

  test("binaryMetrics: perfect ranking scores 1.0 everywhere; duplicate gold collapses") {
    val run = Seq((1L, 1L, "A"), (1L, 2L, "B")).toDF("query_id", "rank", "item")
    val gold = Seq((1L, "A"), (1L, "B"), (1L, "B")).toDF("query_id", "item")
    val r = RetrievalEval.binaryMetrics(run, gold, "query_id", "item", "rank", k = 5)
      .collect().head
    assert(r.getLong(1) === 2L, "duplicate gold rows must collapse")
    assert(r.getDouble(3) === 1.0 && r.getDouble(4) === 1.0 && r.getDouble(5) === 1.0)
  }

  test("binaryMetrics: duplicate run rows collapse to best rank — no recall/ndcg > 1") {
    // malformed run lists A at ranks 1 AND 3 within k; without the
    // collapse it would count 2 hits for 1 relevant item (recall 2.0)
    // and double-charge dcg
    val run = Seq((1L, 1L, "A"), (1L, 3L, "A"), (1L, 2L, "B"))
      .toDF("query_id", "rank", "item")
    val gold = Seq((1L, "A")).toDF("query_id", "item")
    val r = RetrievalEval.binaryMetrics(run, gold, "query_id", "item", "rank", k = 3)
      .collect().head
    assert(r.getLong(2) === 1L, "A counts once")
    assert(r.getDouble(3) === 1.0, "recall capped at 1")
    assert(r.getDouble(4) === 1.0, "mrr from the BEST duplicate rank")
    assert(r.getDouble(5) === 1.0, "ndcg uses rank 1, not rank 3, and caps at 1")
  }
}
