package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed LINEAR QUALITY CLASSIFIER — the trainable document
  * filter of an LLM curation pipeline (the fastText-style "quality
  * model" step between heuristic scoring and token budgets; the
  * reference has no ML surface at all, SURVEY §2.11). Logistic
  * regression by full-batch gradient descent, Spark-first:
  *
  *   - the WEIGHTS live on the driver (O(dim) doubles — dim is a
  *     handful of engineered features, never the corpus) and ship to
  *     executors as literals inside a codegen'd margin expression;
  *   - one iteration = ONE map-side-combined aggregation over the
  *     corpus: per-dimension gradient Σ (σ(w·x) − y)·x_j via
  *     `posexplode` + `groupBy(pos)` (the [[SimilaritySearch
  *     .trainCentroids]] shape), collected as dim+1 rows;
  *   - nothing else touches the driver — scoring is a pure projection.
  *
  * At 100 TB: each pass is a single scan+shuffle of (dim+1)-row
  * partials; train on a hash sample ([[Curation]] samplers) when
  * full passes stop paying — the estimator is unchanged.
  *
  * Exactness seams (how the oracle gates an iterative float algorithm):
  *   - the FIRST gradient at w = 0 has σ ≡ 0.5, so with INTEGER
  *     features it is 0.5·(Σ_{y=0} x_j − Σ_{y=1} x_j) — exact integer
  *     arithmetic, replayed verbatim in SQL (q199);
  *   - SCORING with frozen rational weights k_j/1024 over integer
  *     features has margin (Σ k_j·x_j)/1024 — exact in double while
  *     |Σ k·x| < 2^52, so the decision boundary is bit-stable across
  *     engines (q200);
  *   - the training LOOP itself (σ at w ≠ 0) is floating-point and
  *     partition-order-dependent in the last bits — pinned by
  *     ClassifierSpec floors (separable-fixture accuracy, loss
  *     descent), not by hash equality.
  */
object Classifier {

  private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /** w·x + b as a Column: `features` is ARRAY<DOUBLE> of length
    * `weights.size`, `bias` rides separately. A fold over a zipped
    * literal array — expression-level (no UDF, no RDD); HOF lambdas are
    * interpreted, fine off the per-row hot path at dim ≈ a handful (the
    * SrpBits lesson only bites at dim × planes scale).
    */
  def margin(features: Column, weights: Seq[Double], bias: Double): Column = {
    val w = typedLit(weights)
    val fold = aggregate(
      zip_with(features, w, (x, wi) => x * wi),
      lit(bias),
      (acc, t) => acc + t)
    // zip_with pads a length-mismatched side with nulls and the fold
    // would propagate them into a SILENT null margin — refuse loudly
    // instead (the wrong-feature-builder failure mode)
    when(size(features) === lit(weights.size), fold)
      .otherwise(raise_error(
        concat(lit(s"feature vector length != ${weights.size} weights: size="),
          size(features).cast("string"))).cast("double"))
  }

  /** σ(w·x + b) as a Column. */
  def probability(features: Column, weights: Seq[Double], bias: Double): Column =
    lit(1.0) / (lit(1.0) + exp(-margin(features, weights, bias)))

  /** One full-batch gradient of the logistic loss (mean over rows, plus
    * L2 on the weights, never the bias) AND the mean loss at the SAME
    * point: returns (∇w, ∇b, loss). The corpus sees exactly ONE
    * aggregation — the loss term rides the same explode as pos −2, the
    * bias partial as pos −1 — and the collect is dim+2 rows. The loss
    * uses the overflow-safe form max(m,0) − m·y + log1p(e^−|m|)
    * (log(1+e^m) overflows to Inf past m ≈ 709, which unnormalized
    * integer features reach in one step).
    */
  private[graft] def gradient(
      df: DataFrame,
      featuresCol: String,
      labelCol: String,
      weights: Seq[Double],
      bias: Double,
      l2: Double): (IndexedSeq[Double], Double, Double) = {
    val dim = weights.size
    val m = margin(col(featuresCol), weights, bias)
    val y = col(labelCol).cast("double")
    val resid = (lit(1.0) / (lit(1.0) + exp(-m))) - y
    val lossTerm = greatest(m, lit(0.0)) - m * y + log1p(exp(-abs(m)))
    // per-dim partials, the bias partial (pos −1, x ≡ 1), and the loss
    // term (pos −2) in the same aggregation
    val rows = df
      .select(col(featuresCol).as("__f"), resid.as("__r"), lossTerm.as("__l"))
      .select(explode(concat(
        array(struct(lit(-2).as("__p"), col("__l").as("__g")),
          struct(lit(-1).as("__p"), col("__r").as("__g"))),
        zip_with(col("__f"), sequence(lit(0), lit(dim - 1)),
          (x, p) => struct(p.cast("int").as("__p"), (x * col("__r")).as("__g")))))
        .as("__e"))
      .groupBy(col("__e.__p").as("__p"))
      .agg(sum(col("__e.__g")).as("__s"), count(lit(1)).as("__n"))
      .collect()
    rows.foreach(r => require(!r.isNullAt(1),
      s"null gradient partial at pos ${r.getInt(0)} — null labels or features?"))
    val n = rows.headOption.map(_.getLong(2).toDouble).getOrElse(1.0)
    val byPos = rows.map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val gw = (0 until dim).map(j =>
      byPos.getOrElse(j, 0.0) / n + l2 * weights(j))
    (gw, byPos.getOrElse(-1, 0.0) / n, byPos.getOrElse(-2, 0.0) / n)
  }

  /** The first training step as a DATAFRAME — the oracle seam of the
    * iterative algorithm (the [[Bpe]] layer-1 recipe): at w = 0 every
    * σ is exactly 0.5, so with INTEGER-valued features the per-dimension
    * gradient mean is (Σ (0.5 − y)·x_j) / n — sums of exact multiples
    * of 0.5, order-insensitive, and the final IEEE division is
    * bit-identical across engines. Output: (pos, grad) with pos = -1
    * the intercept. Later steps are float-iterative and spec-gated
    * instead ([[logisticTrain]]).
    */
  def firstGradient(
      df: DataFrame,
      featuresCol: String,
      labelCol: String,
      dim: Int): DataFrame = {
    val resid = lit(0.5) - col(labelCol).cast("double")
    df.select(col(featuresCol).cast("array<double>").as("__f"), resid.as("__r"))
      .select(explode(concat(array(struct(lit(-1).as("__p"), col("__r").as("__g"))),
        zip_with(col("__f"), sequence(lit(0), lit(dim - 1)),
          (x, p) => struct(p.cast("int").as("__p"), (x * col("__r")).as("__g")))))
        .as("__e"))
      .groupBy(col("__e.__p").as("pos"))
      .agg((sum(col("__e.__g")) / count(lit(1))).as("grad"))
  }

  /** Learned model: weights (one per feature), intercept, and the
    * training loss trajectory — losses(t) is the mean logistic loss AT
    * the point visited at iteration t (w₀ = 0 first, so losses.head is
    * ln 2 up to float), measured inside the same aggregation that
    * computes that iteration's gradient. Descent is ClassifierSpec's
    * convergence gate.
    */
  final case class Model(
      weights: IndexedSeq[Double], bias: Double, losses: IndexedSeq[Double])

  /** Train by full-batch gradient descent from w = 0. Deterministic up
    * to float summation order (the last-bit partition-order effect every
    * distributed double sum has); the decision QUALITY is what specs
    * pin. `df` is persisted across iterations and released on return.
    */
  def logisticTrain(
      df: DataFrame,
      featuresCol: String,
      labelCol: String,
      dim: Int,
      iters: Int = 50,
      lr: Double = 0.5,
      l2: Double = 0.0): Model = {
    require(dim >= 1 && iters >= 0 && lr > 0 && l2 >= 0, "bad hyperparameters")
    val data = df.select(col(featuresCol).cast("array<double>").as("__x"),
      col(labelCol).cast("double").as("__y")).persist()
    try {
      var w: IndexedSeq[Double] = IndexedSeq.fill(dim)(0.0)
      var b = 0.0
      val losses = IndexedSeq.newBuilder[Double]
      for (_ <- 0 until iters) {
        // ONE corpus aggregation per iteration: gradient AND the loss
        // at the current point ride the same pass
        val (gw, gb, loss) = gradient(data, "__x", "__y", w, b, l2)
        losses += loss
        w = w.indices.map(j => w(j) - lr * gw(j))
        b = b - lr * gb
      }
      Model(w, b, losses.result())
    } finally { data.unpersist(blocking = false); () }
  }

  /** Score rows with a frozen model: adds `margin`, `probability`, and
    * `predicted` (margin > 0). A pure projection — no shuffle, no
    * driver. With integer features and weights that are multiples of
    * 1/1024 the margin is EXACT (q200's cross-engine claim).
    */
  def score(
      df: DataFrame,
      featuresCol: String,
      weights: Seq[Double],
      bias: Double): DataFrame = {
    val m = margin(col(featuresCol), weights, bias)
    df.withColumn("margin", m)
      .withColumn("probability", lit(1.0) / (lit(1.0) + exp(-m)))
      .withColumn("predicted", (m > 0).cast("int"))
  }

  /** HASHING-TRICK featurization (Weinberger et al., ICML 2009 — the
    * vocabulary-free vectorizer LLM-scale quality classifiers train
    * on): each token lands in bucket `hash mod nBuckets` with a sign
    * drawn from the next hash bit, so collisions cancel in expectation
    * and NO vocabulary is built, broadcast, or synchronized — the
    * property that matters at 100 TB, where a vocabulary is itself a
    * big-data problem. Returns the exploded sparse form
    * (idCol, bucket, wt) with wt = signed token count, zero-weight
    * cells dropped; densify at the consumer if a fixed-dim array is
    * needed ([[margin]] takes arrays).
    *
    * Pure Column pipeline (explode + two codegen'd hash ops + one hash
    * aggregate) over [[Dedup.hash60]], so the whole featurization
    * replays in SQL — q267's oracle is the same five lines in DuckDB.
    */
  def hashedFeatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= (1 << 20),
      s"nBuckets must be in [2, 2^20], got $nBuckets")
    docs
      .select(col(idCol), explode(Dedup.tokens(col(textCol))).as("__tok"))
      .filter(length(col("__tok")) > 0)
      .select(col(idCol), Dedup.hash60(col("__tok")).as("__h"))
      // __h is a 60-bit non-negative value: plain div/mod, no pmod needed
      .select(col(idCol), expr(s"__h % ${nBuckets}L").as("bucket"),
        when(expr(s"(__h div ${nBuckets}L) % 2") === 0, lit(1L))
          .otherwise(lit(-1L)).as("sign"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("sign")).as("wt"))
      .filter(col("wt") =!= 0)
  }

  /** ISOTONIC calibration (PAVA's fit, computed via the exact minimax
    * characterization): the monotone-nondecreasing step function
    * closest in L2 to the per-score label means — what turns a
    * quality classifier's raw scores into honest probabilities
    * (Zadrozny & Elkan 2002). fitted(i) = max_{k≤i} min_{j≥i}
    * avg(labels over score ranks k..j) — the closed form of the
    * pool-adjacent-violators solution, which needs no sequential
    * pooling loop at all: prefix sums over the DISTINCT-SCORE table,
    * one O(bins²) range self-join, a per-k suffix-min window and one
    * hash-agg max. Every avg is ONE division of exact integer sums, so
    * both engines produce bit-identical doubles (q272's oracle is the
    * identical construction in SQL).
    *
    * Contract: calibration operates on score BINS — the distinct-score
    * table must be small (the bins² join is the cost); more than 1e5
    * distinct scores refuses loudly (bin upstream, e.g. round scores
    * to a grid). Returns (scoreCol, n, p_cal), p_cal nondecreasing in
    * score.
    */
  def isotonicCalibrate(samples: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.orderBy(scoreCol)
    val bins = samples
      // a NULL score has no position on the score axis — and the two
      // engines even ORDER nulls differently (Spark first, DuckDB
      // last), so admitting them would be a silent cross-engine
      // divergence, not a semantic: drop them explicitly
      .filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol))
      .agg(count(lit(1)).as("w"), sum(col(labelCol).cast("long")).as("sy"))
      .withColumn("i",
        when(row_number().over(wAll) <= 100000, row_number().over(wAll))
          .otherwise(raise_error(lit(
            "isotonicCalibrate: more than 1e5 distinct scores — bin upstream"))))
      .withColumn("cw", sum(col("w")).over(wAll))
      .withColumn("csy", sum(col("sy")).over(wAll))
      .withColumn("pw", col("cw") - col("w"))
      .withColumn("psy", col("csy") - col("sy"))
    val k = bins.select(col("i").as("k"), col("pw"), col("psy"))
    val j = bins.select(col("i").as("j"), col("cw"), col("csy").as("jcsy"))
    val pairs = k.join(j, col("k") <= col("j"))
      .select(col("k"), col("j"),
        ((col("jcsy") - col("psy")).cast("double") / (col("cw") - col("pw")))
          .as("a"))
    val suffixMin = pairs.withColumn("m",
      min(col("a")).over(Window.partitionBy("k").orderBy(col("j").desc)))
    val fitted = suffixMin.groupBy(col("j").as("i"))
      .agg(max(col("m")).as("p_cal"))
    bins.join(fitted, Seq("i"))
      .select(col(scoreCol), col("w").as("n"), col("p_cal"))
  }
}
