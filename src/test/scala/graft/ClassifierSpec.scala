package graft

import org.apache.spark.sql.functions._

import graft.operators.Classifier

/** The trainable quality filter: the float-iterative training loop the
  * q199 first-gradient oracle can't express, pinned by convergence and
  * decision-quality floors on a separable fixture.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // linearly separable in 2D: y = 1 iff c0 + c1 > 1 over CENTERED
  // half-integer grid coords (centering conditions plain GD — raw 0..9
  // coords put the optimum far from 0 and force a tiny stable lr).
  // Boundary rows dropped → margin ≥ 1 both sides; features stay exact
  // dyadic rationals so the w = 0 gradient seam is exact.
  private def sep = (0 until 200).map { i =>
    val x0 = (i % 10).toDouble - 4.5
    val x1 = ((i / 10) % 10).toDouble - 4.5
    val y = if (x0 + x1 > 1) 1 else 0
    (i.toLong, Seq(x0, x1), y)
  }.filter { case (_, x, _) => x.head + x(1) != 1 && x.head + x(1) != 0 }

  test("logisticTrain separates a separable fixture; loss descends") {
    val df = sep.toDF("id", "x", "y")
    val m = Classifier.logisticTrain(df, "x", "y", dim = 2, iters = 200, lr = 0.3)
    // losses(0) is the loss AT w=0 — exactly ln 2 for logistic loss
    assert(math.abs(m.losses.head - math.log(2.0)) < 1e-12,
      s"w=0 loss must be ln 2: ${m.losses.head}")
    assert(m.losses.head > m.losses.last, s"loss must descend: ${m.losses.head} -> ${m.losses.last}")
    assert(m.losses.last < 0.3, s"terminal loss too high: ${m.losses.last}")
    assert(m.losses.forall(l => !l.isNaN && !l.isInfinite),
      "the stable loss form must never overflow")
    val scored = Classifier.score(df, "x", m.weights, m.bias)
    val acc = scored.filter(col("predicted") === col("y")).count().toDouble /
      scored.count()
    assert(acc >= 0.95, s"accuracy $acc below floor on separable data")
  }

  test("firstGradient matches a local computation exactly (w = 0 seam)") {
    val df = sep.take(40).toDF("id", "x", "y")
    val got = Classifier.firstGradient(df, "x", "y", dim = 2)
      .as[(Int, Double)].collect().toMap
    val rows = sep.take(40)
    val n = rows.size.toDouble
    // exact local replay: residual is ±0.5, features integer-valued
    val gb = rows.map { case (_, _, y) => 0.5 - y }.sum / n
    val g0 = rows.map { case (_, x, y) => (0.5 - y) * x.head }.sum / n
    val g1 = rows.map { case (_, x, y) => (0.5 - y) * x(1) }.sum / n
    assert(got(-1) === gb && got(0) === g0 && got(1) === g1,
      s"gradient mismatch: $got vs ($gb, $g0, $g1)")
  }

  test("score: exact dyadic margins, bias-only model, L2 shrinks weights") {
    // frozen rational weights over integer features → exact margins
    val df = Seq((1L, Seq(100.0, 3.0)), (2L, Seq(10.0, 1.0))).toDF("id", "x")
    val s = Classifier.score(df, "x", Seq(10.0 / 1024, 2.0 / 1024), bias = -0.5)
      .select("id", "margin", "predicted").as[(Long, Double, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(s(1L) === ((1006.0 / 1024 - 0.5, 1)))
    assert(s(2L) === ((102.0 / 1024 - 0.5, 0)))

    // L2 regularization shrinks the weight norm, same data
    val data = sep.toDF("id", "x", "y")
    val free = Classifier.logisticTrain(data, "x", "y", 2, iters = 30, lr = 0.3)
    val reg = Classifier.logisticTrain(data, "x", "y", 2, iters = 30, lr = 0.3, l2 = 0.5)
    def norm(w: Seq[Double]) = math.sqrt(w.map(x => x * x).sum)
    assert(norm(reg.weights) < norm(free.weights),
      s"l2 must shrink: ${norm(reg.weights)} !< ${norm(free.weights)}")
  }

  test("hashedFeatures: signed bucket counts match a host-side replay") {
    import spark.implicits._
    val docs = Seq((1L, "row scan row  table"), (2L, "  "), (3L, "scan"))
      .toDF("doc_id", "text")
    def h60(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    def cell(tok: String): (Long, Long) =
      (h60(tok) % 64, if ((h60(tok) / 64) % 2 == 0) 1L else -1L)
    val expect = Seq("row", "scan", "row", "table").map(cell)
      .groupBy(_._1).map { case (b, xs) => (1L, b, xs.map(_._2).sum) }
      .filter(_._3 != 0).toSet ++
      Seq(cell("scan")).map { case (b, s) => (3L, b, s) }.toSet
    val got = graft.operators.Classifier
      .hashedFeatures(docs, "doc_id", "text", nBuckets = 64)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expect, s"got $got\nexpect $expect")
    // whitespace-only doc contributes nothing; bucket guard is loud
    assert(!got.exists(_._1 == 2L))
    intercept[IllegalArgumentException](graft.operators.Classifier
      .hashedFeatures(docs, "doc_id", "text", nBuckets = 1))
  }

  test("isotonicCalibrate: PAVA pooling on the classic violator case; monotone output") {
    import spark.implicits._
    // per-score means [1/2, 0, 1]: the 0.5 > 0 violation pools ranks
    // 1-2 to 1/3; rank 3 stays 1. Hand-checkable against the minimax
    // form (and any PAVA reference implementation).
    val samples = Seq(
      (1, 1), (1, 0), // score 1: mean 1/2
      (2, 0), // score 2: mean 0
      (3, 1)) // score 3: mean 1
      .toDF("score", "label")
    val got = graft.operators.Classifier
      .isotonicCalibrate(samples, "score", "label")
      .as[(Int, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1, 2L, 1.0 / 3), (2, 1L, 1.0 / 3), (3, 1L, 1.0)))
    // weighted case: counts act as weights; already-monotone input is a fixpoint
    val mono = Seq((1, 0), (1, 0), (2, 1), (2, 0), (3, 1)).toDF("score", "label")
    val gotM = graft.operators.Classifier
      .isotonicCalibrate(mono, "score", "label")
      .as[(Int, Long, Double)].collect().sortBy(_._1).toSeq
    assert(gotM == Seq((1, 2L, 0.0), (2, 2L, 0.5), (3, 1L, 1.0)))
    // output is nondecreasing by construction
    assert(gotM.map(_._3) == gotM.map(_._3).sorted)
  }
}
