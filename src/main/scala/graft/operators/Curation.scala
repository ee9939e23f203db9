package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines (SURVEY.md §2.11
  * round-3 widening — no reference analog): the selection/cleaning passes
  * that sit between raw ingest and tokenization in an LLM data pipeline.
  *
  * 100 TB posture: every operator is hash-driven and shuffle-bounded —
  * per-group windows shuffle once on the group key, segment/shingle joins
  * are equi-joins on content-derived keys, and "random" orders are
  * deterministic hash orders (reproducible across runs, engines, and
  * partitionings — the property that makes a curation run auditable).
  */
object Curation {

  /** Per-group token-distribution divergence from the corpus:
    * KL(P_group ‖ P_corpus) over whitespace tokens, the drift signal
    * behind mixture monitoring ("is this source's language distribution
    * diverging from the blend it was sampled into?"). Zero-probability
    * terms cannot occur: every group token is by construction in the
    * corpus distribution.
    *
    * Shape at scale: ONE hash aggregation over the token stream (per
    * (group, token)); corpus-wide token counts and per-group totals are
    * windows over that already-reduced table (partitioned by token / by
    * group — never unpartitioned), and the corpus total is a lazy 1-row
    * broadcast (the bm25TopK consts shape) — the whole operator is a
    * single lazy plan, no driver-side action, and an empty input yields
    * an empty result instead of the NPE the eager scalar used to throw.
    */
  def tokenKlDivergence(
      df: DataFrame,
      groupCol: String,
      textCol: String): DataFrame = {
    val toks = df.select(col(groupCol).as("g"),
        explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      .filter(length(col("tok")) >= 1)
    val gc = toks.groupBy("g", "tok").agg(count(lit(1)).as("k_g"))
    val total = gc.agg(sum("k_g").cast("double").as("__corpus_n"))
    gc.withColumn("k_c", sum("k_g").over(Window.partitionBy("tok")))
      .withColumn("n_g", sum("k_g").over(Window.partitionBy("g")))
      .crossJoin(broadcast(total))
      .groupBy(col("g"), col("n_g"))
      .agg(round(sum(
        (col("k_g") / col("n_g")) *
          log((col("k_g") / col("n_g")) / (col("k_c") / col("__corpus_n")))), 6)
        .as("kl"))
      .select(col("g"), col("n_g").cast("long").as("n_tokens"), col("kl"))
  }

  /** Keep at most `quota` rows per `groupCol`, chosen in deterministic
    * hash order of `idCol` (a reproducible "random" K-per-domain
    * subsample — the domain-balancing pass that stops one crawl domain
    * from dominating the mix). One shuffle on the group key; the
    * per-group sort is bounded by the group size. For heavily skewed
    * domains at extreme scale, pre-thin with a hash-threshold filter
    * (`hash mod m < ceil(quota·m / est_count)`) before the exact window —
    * same result, the sort then sees O(quota) rows per group.
    */
  def quotaPerGroup(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      quota: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(Dedup.hash60(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= quota)
      .drop("__rk")
  }

  /** C4-style boilerplate removal at SEGMENT granularity: split each
    * document into consecutive `segTokens`-token segments, drop every
    * segment whose exact text occurs in more than `maxDf` distinct
    * documents (navigation chrome, license blurbs, templated headers),
    * and reassemble the survivors in order. Returns
    * (idCol, n_segs, n_removed, clean_text).
    *
    * Plan shape: one explode, one distinct-doc count per segment text
    * (hash aggregation), one equi-join back, one per-doc ordered
    * reassembly — shuffles keyed by segment content then by document,
    * never pairwise. Segment df is computed on the EXACT text; at scale
    * hash the segment first (64-bit) — the join stays the same shape.
    */
  def removeBoilerplateSegments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      segTokens: Int,
      maxDf: Long): DataFrame = {
    val segs = segments(df, idCol, textCol, segTokens)
    val segDf = segs.groupBy("__seg")
      .agg(countDistinct(col(idCol)).as("__df"))
    // ONE aggregation computes totals, kept count, and the ordered
    // reassembly together (collect_list drops the CASE's nulls, i.e. the
    // boilerplate segments): the segs plan — a full tokenize+explode of
    // the corpus — is consumed once by the df-count aggregation and once
    // by this join probe, instead of a third time by a separate totals
    // aggregation joined back in
    segs.join(segDf, "__seg")
      .withColumn("__keep", col("__df") <= maxDf)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_segs"),
        count(when(col("__keep"), 1)).as("__n_kept"),
        array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN __keep THEN struct(__idx, __seg) END)), " +
            "x -> x.__seg)"), " ").as("clean_text"))
      .select(col(idCol), col("n_segs"),
        (col("n_segs") - col("__n_kept")).as("n_removed"),
        col("clean_text"))
  }

  /** Split each document into consecutive `segTokens`-token segments:
    * (idCol, __idx, __seg). Explodes an int sequence + per-row
    * slice/concat_ws (codegen'd) — never a transform(...) lambda building
    * string arrays (interpreted; the q76 lesson).
    */
  private[operators] def segments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      segTokens: Int): DataFrame =
    df.select(col(idCol), Dedup.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 1)
      .select(col(idCol), col("__toks"),
        explode(expr(s"sequence(0, (size(__toks) - 1) DIV $segTokens)")).as("__idx"))
      .select(col(idCol), col("__idx"),
        concat_ws(" ", slice(col("__toks"), col("__idx") * segTokens + 1, lit(segTokens)))
          .as("__seg"))

  /** Corpus-wide exact segment dedup, keep-FIRST occurrence (the
    * RefinedWeb/C4 "exact line dedup" pass, at fixed-token-segment
    * granularity since the corpus carries no line structure): a segment's
    * first occurrence in (idCol, position) order survives; every later
    * occurrence anywhere in the corpus is dropped, and documents are
    * reassembled from their surviving segments. Complements
    * [[removeBoilerplateSegments]]: that drops ALL copies of high-df
    * segments; this keeps exactly one copy of every segment.
    *
    * Returns (idCol, n_segs, n_dropped, clean_text).
    *
    * Plan shape: the winner per segment is `min(struct(id, idx))` — a
    * map-side-combining hash aggregate, so a segment duplicated a million
    * times costs its reducer one row per map partition, not a million
    * (skew-safe where a row_number() window over the segment key would
    * sort the full duplicate stream). One equi-join back on segment
    * content, one per-doc ordered reassembly. At 100 TB, hash the segment
    * to 128 bits first and join on the hash — same shape, narrower
    * shuffle.
    */
  def dedupSegmentsKeepFirst(
      df: DataFrame,
      idCol: String,
      textCol: String,
      segTokens: Int): DataFrame = {
    val segs = segments(df, idCol, textCol, segTokens)
    val winners = segs.groupBy("__seg")
      .agg(min(struct(col(idCol), col("__idx"))).as("__w"))
    segs.join(winners, "__seg")
      .withColumn("__keep", struct(col(idCol), col("__idx")) === col("__w"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_segs"),
        count(when(col("__keep"), 1)).as("__n_kept"),
        array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN __keep THEN struct(__idx, __seg) END)), " +
            "x -> x.__seg)"), " ").as("clean_text"))
      .select(col(idCol), col("n_segs"),
        (col("n_segs") - col("__n_kept")).as("n_dropped"),
        col("clean_text"))
  }

  /** Benchmark decontamination: flag every training document sharing at
    * least one word `n`-gram with the benchmark corpus — the overlap
    * check run before training so eval numbers stay meaningful. Returns
    * the flagged (idCol, n_hits) rows; anti-join the result against the
    * corpus to drop them. Benchmark shingles are distinct'd before the
    * join (the benchmark is the small side — broadcastable at scale);
    * everything is an equi-join on shingle text, no pairwise scan.
    */
  def contaminatedDocs(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val trainSh = Dedup.shingles(train, idCol, textCol, n)
    val benchSh = Dedup.shingles(bench, idCol, textCol, n)
      .select(col("shingle")).distinct()
    trainSh.join(benchSh, "shingle")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Token-BUDGET corpus selection ("the best B tokens") WITHOUT a
    * global sort: a corpus-wide quality-ordered cumsum would serialize
    * one window over everything, so selection works at BUCKET
    * granularity — documents carry an integer quality score, one tiny
    * aggregation yields per-score token totals (O(#scores), collected
    * driver-side, bounded by the score domain), the driver walks scores
    * best-first to find the full-keep set and the threshold score, and
    * the threshold bucket fills its remainder at a deterministic
    * integer-basis-point hash rate (the cross-engine-exact cutoff
    * recipe) — kept tokens ≈ remainder with sampling variance, which is
    * what budget fills accept in exchange for never sorting the corpus.
    * Plan: two aggregations + one broadcast filter; the corpus is never
    * shuffled.
    */
  def budgetSelect(
      df: DataFrame,
      scoreCol: String,
      tokensCol: String,
      idCol: String,
      budget: Long,
      maxScoreBuckets: Int = MaxExactScoreBuckets): DataFrame =
    budgetSelectWith(df, scoreCol, tokensCol, idCol, _ => budget, maxScoreBuckets)

  /** [[budgetSelect]] with the budget as a FRACTION (num/den) of the
    * corpus's total tokens — derived from the per-score totals the
    * selection already aggregates, so the corpus is scanned once for
    * bucketing and once for the filter, never a third time for the
    * total.
    */
  def budgetSelectFraction(
      df: DataFrame,
      scoreCol: String,
      tokensCol: String,
      idCol: String,
      num: Long,
      den: Long,
      maxScoreBuckets: Int = MaxExactScoreBuckets): DataFrame = {
    require(num >= 0 && den > 0, "fraction must be non-negative with positive denominator")
    budgetSelectWith(df, scoreCol, tokensCol, idCol,
      total => (BigInt(total) * num / den).toLong, maxScoreBuckets)
  }

  /** The exact path's driver-walk ceiling: one row per distinct
    * long-cast score is collected, so a CONTINUOUS score column would
    * grow the driver walk with the corpus. Above this many distinct
    * buckets the exact path REFUSES (structurally — the collect is
    * limit-bounded, the oversized result never materializes) and points
    * at [[budgetSelectBucketed]], whose collect is O(buckets) for any
    * score cardinality.
    */
  val MaxExactScoreBuckets: Int = 100000

  private def budgetSelectWith(
      df: DataFrame,
      scoreCol: String,
      tokensCol: String,
      idCol: String,
      budgetOf: Long => Long,
      maxScoreBuckets: Int = MaxExactScoreBuckets): DataFrame = {
    // null scores are unrankable — like mixtureResample's null groups
    // they are EXCLUDED here explicitly rather than NPE-ing the driver
    // walk (and their tokens must not inflate any bucket's total)
    val scored = df.filter(col(scoreCol).isNotNull)
    val collected = scored
      // the long cast is the BUCKETING rule; the rates join below must
      // apply the identical cast or fractional scores silently drop.
      // coalesce: a bucket whose every token count is NULL sums to NULL —
      // it carries zero token mass (and must not NPE the getLong below)
      .groupBy(col(scoreCol).cast("long").as("__score"))
      .agg(coalesce(sum(col(tokensCol)), lit(0L)).cast("long").as("__btok"))
      .limit(maxScoreBuckets + 1)
      .collect()
    require(collected.length <= maxScoreBuckets,
      s"budgetSelect's exact path collects one row per distinct long-cast '$scoreCol' " +
        s"and this column exceeds $maxScoreBuckets distinct buckets — a continuous " +
        "score; use budgetSelectBucketed, whose driver collect is O(buckets) " +
        "for any score cardinality")
    val totals = collected
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(-_._1) // best score first
    val budget = budgetOf(totals.map(_._2).sum)
    require(budget >= 0, "budget must be non-negative")
    var before = 0L
    val rates = totals.map { case (score, btok) =>
      val bp =
        if (before >= budget) 0L
        else if (before + btok <= budget) 10000L
        else (BigInt(budget - before) * 10000 / BigInt(btok)).toLong
      before += btok
      (score, bp)
    }.toMap
    val spark = df.sparkSession
    import spark.implicits._
    val ratesDf = broadcast(rates.toSeq.toDF("__score", "__bp"))
    scored.join(ratesDf, col(scoreCol).cast("long") === col("__score"))
      .filter(Dedup.hash60(col(idCol).cast("string")) % 10000 < col("__bp"))
      .drop("__score", "__bp")
  }

  /** [[budgetSelect]] for CONTINUOUS (or unbounded-domain) scores. The
    * exact path's driver walk is O(#distinct long-cast scores) — fine for
    * a bounded quality rubric, unbounded for a real-valued model score.
    * This variant buckets the corpus into `buckets` equi-depth RANK
    * buckets over (score DESC, id) via [[Histogram.ntileExact]] (exact
    * ntile semantics, two-phase distributed ranking, no unpartitioned
    * window), then walks the per-bucket token totals best-first exactly
    * like the exact path walks scores: whole better buckets are kept,
    * the threshold bucket hash-fills its remainder at an integer
    * basis-point rate, worse buckets drop. The driver collect is
    * [[bucketTokenTotals]] — provably O(buckets) rows whatever the score
    * cardinality. Granularity coarsens from score-groups to rank-buckets
    * (within the threshold bucket survival is hash-uniform, not
    * best-score-first); with B buckets the kept set deviates from the
    * exact answer by at most one bucket's token mass ≈ total/B.
    *
    * Because the ranking only uses the ORDER of scores, any monotone
    * transform of the score column yields the identical selection — and
    * cross-engine float noise in the score VALUES cannot move a row
    * across buckets unless it reorders rows, which last-bit noise on a
    * monotone score never does.
    */
  def budgetSelectBucketed(
      df: DataFrame,
      scoreCol: String,
      tokensCol: String,
      idCol: String,
      budget: Long,
      buckets: Int = 256): DataFrame =
    budgetSelectBucketedWith(df, scoreCol, tokensCol, idCol, buckets, _ => budget)

  /** [[budgetSelectBucketed]] with the budget as a FRACTION (num/den) of
    * total tokens, derived from the bucket totals already collected.
    */
  def budgetSelectBucketedFraction(
      df: DataFrame,
      scoreCol: String,
      tokensCol: String,
      idCol: String,
      num: Long,
      den: Long,
      buckets: Int = 256): DataFrame = {
    require(num >= 0 && den > 0, "fraction must be non-negative with positive denominator")
    budgetSelectBucketedWith(df, scoreCol, tokensCol, idCol, buckets,
      total => (BigInt(total) * num / den).toLong)
  }

  /** The ONE driver-side collect of the bucketed path: per-bucket token
    * totals, ≤ `buckets` rows by ntile's construction (spec-asserted on
    * a high-cardinality continuous score). Sorted best-bucket (1) first.
    */
  private[graft] def bucketTokenTotals(
      bucketed: DataFrame, tokensCol: String): Seq[(Long, Long)] =
    bucketed
      .groupBy(col("bucket"))
      .agg(coalesce(sum(col(tokensCol)), lit(0L)).cast("long").as("__btok"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq

  /** Best-first budget walk over bucket totals (same arithmetic as the
    * exact path's score walk): full-keep 10000 bp while the budget holds,
    * integer-basis-point remainder rate in the threshold bucket, 0 after.
    * Pure and driver-side; package-visible so the spec can pin the walk
    * against the exact path's rates directly.
    */
  private[graft] def fillRates(
      totalsBestFirst: Seq[(Long, Long)], budget: Long): Seq[(Long, Long)] = {
    require(budget >= 0, "budget must be non-negative")
    var before = 0L
    totalsBestFirst.map { case (bucket, btok) =>
      val bp =
        if (before >= budget) 0L
        else if (before + btok <= budget) 10000L
        else (BigInt(budget - before) * 10000 / BigInt(btok)).toLong
      before += btok
      (bucket, bp)
    }
  }

  private def budgetSelectBucketedWith(
      df: DataFrame,
      scoreCol: String,
      tokensCol: String,
      idCol: String,
      buckets: Int,
      budgetOf: Long => Long): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val scored = df.filter(col(scoreCol).isNotNull)
    // bucket 1 = best scores; id tiebreak makes the rank (hence the
    // bucketization) total and deterministic
    val bucketed = Histogram.ntileExact(
      scored, Seq(col(scoreCol).desc, col(idCol)), buckets)
    val totals = bucketTokenTotals(bucketed, tokensCol)
    val rates = fillRates(totals, budgetOf(totals.map(_._2).sum))
    val spark = df.sparkSession
    import spark.implicits._
    val ratesDf = broadcast(rates.toDF("__bucket", "__bp"))
    bucketed.join(ratesDf, col("bucket") === col("__bucket"))
      .filter(Dedup.hash60(col(idCol).cast("string")) % 10000 < col("__bp"))
      .drop("bucket", "__bucket", "__bp")
  }

  /** Bloom-prefiltered decontamination — EXACTLY the
    * [[contaminatedDocs]] result (the Bloom admits only false
    * POSITIVES, which the exact shingle equi-join then rejects), but
    * the train-side shingle stream is cut by a broadcast Bloom filter of
    * the benchmark's n-grams BEFORE the exchange. At 100 TB the train
    * shingle stream is the dominant shuffle of the exact path; held-out
    * benchmarks are small by definition (~1e6–1e7 n-grams → a few MB of
    * Bloom bits at 1% fpp), so virtually every clean shingle dies in the
    * scan stage and the join moves only suspects. The membership test
    * is a broadcast-closure UDF — the one place a UDF is the right
    * trade: Spark's sketch lives driver-side and a literal-encoded
    * native expression would inline megabytes into generated code.
    */
  def contaminatedDocsBloom(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      fpp: Double = 0.01): DataFrame = {
    val benchSh = Dedup.shingles(bench, idCol, textCol, n)
      .select(col("shingle")).distinct()
    // expected-item count for sizing: bounded by the small benchmark side
    val nGrams = math.max(1L, benchSh.count())
    val bloom = benchSh.stat.bloomFilter("shingle", nGrams, fpp)
    val bloomBc = benchSh.sparkSession.sparkContext.broadcast(bloom)
    val mightMatch = udf((s: String) => s != null && bloomBc.value.mightContain(s))
    Dedup.shingles(train, idCol, textCol, n)
      .filter(mightMatch(col("shingle")))
      .join(benchSh, "shingle")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Keep rate in basis points: min(10000, (N*10000) DIV (nGroups*n_g)).
    * Integer end to end, through BigInt — `total * 10000L` overflows Long
    * once total exceeds ~9.2e14 rows (a 100 TB table of narrow rows gets
    * there), silently corrupting every keep rate. Driver-side, called
    * nGroups times — the BigInt cost is free.
    */
  private[graft] def keepBps(total: Long, nGroups: Long, nGroup: Long): Long =
    (BigInt(total) * 10000 / (BigInt(nGroups) * nGroup)).min(BigInt(10000)).toLong

  /** Data-mixture rebalancing toward a UNIFORM share per group (the
    * "equal parts per language" mixing step of a training-data recipe):
    * each group keeps a deterministic hash sample at rate
    * min(1, (N / nGroups) / n_g), expressed in integer BASIS POINTS so
    * the keep decision is exact integer arithmetic — bit-reproducible
    * across engines, runs, and partitionings (no float rate boundary).
    * Over-represented groups are thinned toward N/nGroups; groups at or
    * under the target keep everything (this operator never upsamples).
    *
    * Plan shape: one count aggregation (nGroups rows), broadcast back,
    * then a pure filter — the input is never shuffled.
    */
  def mixtureResample(
      df: DataFrame,
      groupCol: String,
      idCol: String): DataFrame = {
    // null group keys would silently vanish in the rates equi-join while
    // still skewing every other group's denominator — exclude them from
    // BOTH the counts and the output, explicitly
    val nonNull = df.filter(col(groupCol).isNotNull)
    // group counts collected to the driver: cardinality is the number of
    // DISTINCT group values (languages/sources — inherently small), the
    // same bounded-collect contract as IVF centroids. One aggregation
    // scan; rates go back as a literal broadcast table.
    val counts = nonNull.groupBy(col(groupCol)).agg(count(lit(1)).as("__n")).collect()
    val total = counts.map(_.getLong(1)).sum
    val nGroups = counts.length.toLong
    val rateRows = counts.map { r =>
      Row(r.get(0), keepBps(total, nGroups, r.getLong(1)))
    }
    applyKeepRates(df, nonNull, groupCol, idCol, rateRows)
  }

  /** Shared tail of the mixture operators: basis-point rates back as a
    * literal broadcast table, deterministic hash keep filter. ONE copy —
    * the keep boundary must never diverge between operators.
    */
  private def applyKeepRates(
      df: DataFrame,
      nonNull: DataFrame,
      groupCol: String,
      idCol: String,
      rateRows: Array[Row]): DataFrame = {
    if (rateRows.isEmpty) return nonNull // empty or all-null input: empty out
    val spark = df.sparkSession
    val rates = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rateRows: _*)),
      org.apache.spark.sql.types.StructType(Seq(
        df.schema(groupCol),
        org.apache.spark.sql.types.StructField("__bps",
          org.apache.spark.sql.types.LongType, nullable = false))))
    nonNull.join(broadcast(rates), groupCol)
      .filter(Dedup.hash60(col(idCol).cast("string")) % 10000 < col("__bps"))
      .drop("__bps")
  }

  /** Temperature-weighted mixture sampling (the multilingual training-mix
    * standard): target share p_i ∝ n_i^α, α < 1 boosting low-resource
    * groups; the realized total is the largest that needs NO upsampling
    * (T = min_i n_i/p_i) and each group keeps a deterministic hash sample
    * at basis-point rate floor(p_i·T/n_i·10⁴ + ½). α = 1 keeps everything
    * (shares already proportional); α = 0 is [[mixtureResample]]'s
    * uniform target.
    *
    * Cross-engine exactness (the q148 gate): at the default α = 0.5 the
    * weight is `sqrt` — an IEEE-754 CORRECTLY-ROUNDED op, unlike `pow` —
    * and every later step is elementary arithmetic evaluated in the same
    * order on both engines (weights summed in group-key order via the
    * seeded-fold recipe), so the basis points match bit-for-bit. Other α
    * use `math.pow`, whose last-ulp platform variance makes the cutoffs
    * approximate — fine for production, not for a hash-equality oracle.
    *
    * Plan shape: one counts aggregation (driver-side, group-cardinality
    * bounded — the [[mixtureResample]] contract), rates broadcast back,
    * pure filter; the input never shuffles.
    */
  def temperatureResample(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0, 1]")
    val nonNull = df.filter(col(groupCol).isNotNull)
    // fold order must be DEFINED, not partition-luck. The bit-exactness
    // contract additionally requires the oracle's ORDER BY to agree with
    // this ordering — true for the ASCII string keys the gates use;
    // numeric or non-ASCII keys sort differently across engines (UTF-16
    // units here vs UTF-8 bytes there) and need a caller-matched order.
    val counts = nonNull.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => (r.get(0), r.getLong(1)))
      .sortBy(_._1.toString)
    if (counts.isEmpty) return nonNull // empty/all-null input: empty output
    val w = counts.map { case (_, n) =>
      if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
    }
    val sumW = w.foldLeft(0.0)(_ + _) // == first-element-seeded left fold
    val p = w.map(_ / sumW)
    val tCap = counts.zip(p).map { case ((_, n), pi) => n.toDouble / pi }.min
    val rateRows = counts.zip(p).map { case ((g, n), pi) =>
      Row(g, math.min(10000L, math.floor(pi * tCap / n * 10000.0 + 0.5).toLong))
    }
    applyKeepRates(df, nonNull, groupCol, idCol, rateRows)
  }

  /** Deterministic global shuffle: assign every row its position in the
    * hash order of `idCol` (salted) — the reproducible training-order
    * shuffle. Built on [[Histogram.withGlobalRank]], so the order is
    * realized with a range repartition + local sorts, never a global
    * single-task sort. Returns the input plus a 0-based `shuffle_pos`.
    */
  def deterministicShuffle(
      df: DataFrame,
      idCol: String,
      salt: String = ""): DataFrame =
    Histogram.withGlobalRank(df,
      Seq(Dedup.hash60(concat(lit(salt), col(idCol).cast("string"))), col(idCol)),
      "shuffle_pos")

  /** LEAKAGE-SAFE train/val/test split: assign every member of a
    * near-duplicate CLUSTER to the same split, so no evaluation example
    * has a near-copy in training — the split discipline behind every
    * honest benchmark number (splitting by raw document id leaks
    * whenever the corpus has near-dups, which every web corpus does).
    *
    * `pairs` is any near-dup pair relation (the output of the MinHash /
    * SimHash / PPJoin / SemDeDup families); clusters come from
    * [[Dedup.dupClusters]] (connected components — leakage closes over
    * TRANSITIVE near-duplication, a pairwise-only rule would leak
    * through chains A≈B≈C), documents in no pair are their own
    * singleton cluster. The split is the salted 60-bit hash of the
    * CLUSTER id modulo 100 against cumulative percentage cuts —
    * deterministic, reproducible, oracle-replayable, and independent of
    * both corpus order and cluster size.
    *
    * Scale posture: one left join against the (small) cluster map + a
    * pure projection; the CC cost is the pair graph's, already paid by
    * the dedup pipeline that produced the pairs.
    *
    * @param cuts ordered (name, percent) with percents summing to 100,
    *             e.g. Seq("train" -> 80, "val" -> 10, "test" -> 10)
    * @return `items` + (`cluster`, `split`)
    */
  def leakageSafeSplit(
      items: DataFrame,
      pairs: DataFrame,
      idCol: String,
      cuts: Seq[(String, Int)] =
        Seq("train" -> 80, "val" -> 10, "test" -> 10),
      salt: String = "split:"): DataFrame = {
    require(cuts.nonEmpty && cuts.forall(_._2 > 0) && cuts.map(_._2).sum == 100,
      s"cuts must be positive percents summing to 100, got $cuts")
    require(cuts.map(_._1).distinct.size == cuts.size,
      s"cuts must have distinct names, got $cuts")
    val clusters = Dedup.dupClusters(pairs).withColumnRenamed("id", idCol)
    val withCluster = items.join(clusters, Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("cluster"), col(idCol)))
    val h = pmod(
      Dedup.hash60(concat(lit(salt), col("cluster").cast("string"))), lit(100))
    val cum = cuts.map(_._2).scanLeft(0)(_ + _).tail
    val split = cuts.tail.zip(cum.tail)
      .foldLeft(when(h < cum.head, lit(cuts.head._1))) {
        case (e, ((name, _), bound)) => e.when(h < bound, lit(name))
      }
    withCluster.withColumn("split", split)
  }

  /** Cross-document duplicate SPAN detection (the diagnostic half of
    * Lee et al. 2022's "Deduplicating Training Data Makes Language Models
    * Better": find the exact `spanTokens`-token sequences that recur
    * across ≥ `minDocs` distinct documents — boilerplate, licenses,
    * templated text — before deciding what to cut). Sliding stride-1
    * windows, unlike [[dedupSegmentsKeepFirst]]'s disjoint segments, so a
    * duplicated passage is caught at ANY alignment.
    *
    * Returns (span_md5, n_docs, n_occurrences) ordered by
    * (n_occurrences desc, n_docs desc, span_md5), `topK` rows. Spans are
    * md5'd so the compared/shuffled rows stay 16 bytes wide regardless of
    * span length (the q92/q104 narrow-row convention) — join back on the
    * hash to recover text when needed.
    *
    * Plan shape: tokenize once, explode one int sequence per row (stride-1
    * makes this |tokens| windows per doc — ~8× a q104 segment pass, still
    * linear), slice/concat_ws/md5 all codegen'd, then ONE hash aggregate
    * keyed on the 128-bit span hash with map-side combine. The HAVING on
    * distinct docs uses count(distinct) inside the same aggregate — at
    * 100 TB this is the standard two-phase distinct-agg expansion, still
    * no window and no pairwise join.
    */
  def duplicateSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      spanTokens: Int,
      minDocs: Int = 2,
      topK: Int = 100): DataFrame =
    df.select(col(idCol), Dedup.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= spanTokens)
      .select(col(idCol),
        explode(expr(s"sequence(1, size(__toks) - ${spanTokens - 1})")).as("__i"),
        col("__toks"))
      .select(col(idCol),
        md5(concat_ws(" ", slice(col("__toks"), col("__i"), lit(spanTokens))))
          .as("span_md5"))
      .groupBy("span_md5")
      .agg(countDistinct(col(idCol)).as("n_docs"), count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_occurrences").desc, col("n_docs").desc, col("span_md5"))
      .limit(topK)

  /** Deterministic weighted sample WITHOUT replacement, Efraimidis &
    * Spirakis (2006) exponential-jump keys: each row gets
    * key = ln(u) / w with u a pure-hash uniform in (0, 1), and the top-k
    * rows by key are exactly a weighted sample without replacement — the
    * quality-weighted corpus subselection step ("sample 10M docs
    * proportional to quality score"), reproducible across runs, engines,
    * and partitionings because u is a function of the row id, not an RNG.
    *
    * Plan shape: a scan-side projection (hash, one division, one ln — all
    * codegen) followed by a global top-k, which Spark executes as
    * per-partition TakeOrderedAndProject — no full sort, no shuffle of the
    * input. Ranking uses the ROUNDED key (9 dp — ~10⁶ above libm 1-ulp
    * noise at key magnitudes ≤ 50) with an id tiebreak, so the cut is
    * engine-stable (the q70 lesson).
    *
    * Returns the `keyCol`/`weightCol` columns plus `es_key`, ordered by
    * (es_key desc, keyCol), `k` rows. Rows with weight ≤ 0 or null are
    * excluded (they carry no sampling mass).
    */
  def weightedSampleTopK(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      k: Int): DataFrame =
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(keyCol), col(weightCol), esKey(keyCol, weightCol).as("es_key"))
      .orderBy(col("es_key").desc, col(keyCol))
      .limit(k)

  /** The 9dp-rounded Efraimidis–Spirakis key ln(u)/w, with
    * u = (hash60(key) + 1) / (2^60 + 1) ∈ (0, 1): both bounds open so
    * ln(u) is finite and nonzero, and every integer operand converts to
    * double identically on any IEEE engine.
    */
  private def esKey(keyCol: String, weightCol: String) = {
    val u = (Dedup.hash60(col(keyCol).cast("string")) + 1).cast("double") /
      lit((1L << 60) + 1).cast("double")
    round(log(u) / col(weightCol).cast("double"), 9)
  }

  /** Stratified WEIGHTED sampling: an independent Efraimidis–Spirakis
    * without-replacement sample of up to `k` rows per group — "per
    * language, keep the k docs drawn by quality mass", the mixture-aware
    * twin of [[quotaPerGroup]] (which samples uniformly). Same
    * deterministic pure-hash keys as [[weightedSampleTopK]]; the per-group
    * cut is a row_number window PARTITIONED by the group — bounded
    * per-partition state, never a global sort (and unlike the global
    * top-k, skew is capped: every group sorts only its own rows).
    *
    * Returns (groupCol, keyCol, weightCol, es_key) for the sampled rows.
    * Rows with null group, null weight, or weight ≤ 0 carry no mass and
    * are excluded.
    */
  def weightedSamplePerGroup(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      weightCol: String,
      k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("es_key").desc, col(keyCol))
    df.filter(col(groupCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol) > 0)
      .select(col(groupCol), col(keyCol), col(weightCol),
        esKey(keyCol, weightCol).as("es_key"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** DSIR data selection (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling"): rank the raw pool by how much
    * more likely each document is under a hashed-n-gram model of the
    * TARGET distribution than under the pool's own.
    *
    * Features are unigram + bigram counts hashed into `numBuckets`
    * buckets (md5-60-bit, oracle-reproducible); each distribution is an
    * add-`alpha` smoothed bucket multinomial, and a document's log
    * importance weight is Σ_b c_b·(ln p̂_target[b] − ln p̂_pool[b]). The
    * paper resamples with Gumbel noise; this variant takes the
    * deterministic weight-ranked top-k (also evaluated in the paper) so
    * the selection is reproducible and oracle-checkable — seeded
    * cross-engine noise has no bit-stable recipe.
    *
    * Shape at scale: the n-gram stream (where the per-row md5 cost
    * lives) is scanned ONCE, reduced to per-(doc, side, bucket) counts —
    * ≤ |docs|·numBuckets rows — and materialized (checkpoint, freed
    * before return); both the numBuckets-row distribution table and the
    * per-doc scoring read that reduced table, never the stream again.
    * The bucket log-ratio table BROADCASTS into the per-doc join, so
    * scoring is shuffle-free past the count aggregate; the final cut is
    * a global TakeOrdered top-k, never a full sort. Float determinism: ratios are
    * identical closed-form expressions of exact integer counts; per-doc
    * folds run in bucket-id order from a first-element seed, ROUNDED to
    * 6 dp before the rank with a doc-id tiebreak.
    *
    * Returns (rank, doc_id-named `idCol`, weight, n_ngrams): the `topK`
    * pool docs most target-like. Target docs are excluded from the pool.
    */
  def dsirSelect(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      numBuckets: Int = 128,
      alpha: Double = 0.01,
      topK: Int = 25): DataFrame = {
    require(numBuckets > 0 && alpha > 0)
    val base = docs.select(col(idCol), targetPred.as("__tgt"),
      Dedup.tokens(col(textCol)).as("__toks"))
    // unigrams ++ bigrams in one exploded stream, bucketed immediately so
    // the shuffle key is an int, not the n-gram string
    val bigrams = zip_with(
      slice(col("__toks"), lit(1), size(col("__toks")) - 1),
      slice(col("__toks"), lit(2), size(col("__toks")) - 1),
      (a, b) => concat(a, lit(" "), b))
    val ng = base
      .select(col(idCol), col("__tgt"),
        explode(concat(col("__toks"), bigrams)).as("__ng"))
      .select(col(idCol), col("__tgt"),
        (Dedup.hash60(col("__ng")) % numBuckets).as("__b"))

    // ONE pass over the n-gram stream (md5 is the per-row cost): reduce to
    // per-(doc, side, bucket) long counts, then derive the numBuckets-row
    // distribution table from that already-reduced aggregate
    val db0 = Checkpoints.truncate(
      ng.groupBy(col(idCol), col("__tgt"), col("__b"))
        .agg(count(lit(1)).as("__c")))
    val byBucket = db0.groupBy("__b").agg(
      sum(when(col("__tgt"), col("__c")).otherwise(0L)).cast("double").as("__ct"),
      sum(when(!col("__tgt"), col("__c")).otherwise(0L)).cast("double").as("__cr"))
    val tots = byBucket.agg(sum("__ct").as("__nt"), sum("__cr").as("__nr"))
    val aB = alpha * numBuckets
    val ratio = byBucket.crossJoin(broadcast(tots)).select(col("__b"),
      (log((col("__ct") + alpha) / (col("__nt") + aB)) -
        log((col("__cr") + alpha) / (col("__nr") + aB))).as("__r"))

    val db = db0.filter(!col("__tgt"))
      .select(col(idCol), col("__b"), col("__c").cast("double").as("__c"))
      .join(broadcast(ratio), "__b")
    val contrib = array_sort(collect_list(struct(col("__b"), (col("__c") * col("__r")).as("v"))))
    val vals = transform(contrib, x => x.getField("v"))
    val weights = db.groupBy(idCol).agg(
      round(aggregate(slice(vals, 2, 100000), element_at(vals, 1), (a, x) => a + x), 6)
        .as("weight"),
      sum("__c").cast("long").as("n_ngrams"))
    // eager ≤topK-row result (dupClusters convention: only the returned
    // table stays pinned), so the per-(doc,bucket) checkpoint can be
    // freed before returning
    val out = Checkpoints.truncate(
      weights
        .orderBy(col("weight").desc, col(idCol))
        .limit(topK)
        .withColumn("rank",
          row_number()
            .over(org.apache.spark.sql.expressions.Window
              .orderBy(col("weight").desc, col(idCol)))
            .cast("long"))
        .select(col("rank"), col(idCol), col("weight"), col("n_ngrams")))
    Checkpoints.free(db0)
    out
  }

  /** DuckDB oracle twin of [[dsirSelect]] over `documents` with target
    * `source = '$targetSource'` — replays the hashing, smoothing,
    * bucket-ordered fold and the rounded-weight rank exactly.
    */
  def dsirSql(
      targetSource: String,
      numBuckets: Int = 128,
      alpha: Double = 0.01,
      topK: Int = 25): String = {
    val aB = alpha * numBuckets
    s"""WITH base AS (
       |  SELECT doc_id, source = '$targetSource' AS tgt,
       |    string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |uni AS (SELECT doc_id, tgt, unnest(toks) AS ngr FROM base),
       |bi AS (
       |  SELECT doc_id, tgt, toks[i] || ' ' || toks[i + 1] AS ngr
       |  FROM (SELECT doc_id, tgt, toks,
       |          unnest(generate_series(1, len(toks) - 1)) AS i
       |        FROM base WHERE len(toks) >= 2)),
       |ng AS (
       |  SELECT doc_id, tgt,
       |    ('0x' || substr(md5(ngr), 1, 15))::BIGINT % $numBuckets AS b
       |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
       |bybkt AS (
       |  SELECT b, count(CASE WHEN tgt THEN 1 END)::DOUBLE AS ctb,
       |    count(CASE WHEN NOT tgt THEN 1 END)::DOUBLE AS crb
       |  FROM ng GROUP BY b),
       |tots AS (SELECT sum(ctb) AS nt, sum(crb) AS nr FROM bybkt),
       |ratio AS (
       |  SELECT b, ln((ctb + $alpha) / (nt + $aB))
       |    - ln((crb + $alpha) / (nr + $aB)) AS r
       |  FROM bybkt, tots),
       |db AS (
       |  SELECT doc_id, b, count(*)::DOUBLE AS c FROM ng
       |  WHERE NOT tgt GROUP BY doc_id, b),
       |w AS (
       |  SELECT doc_id,
       |    round(list_reduce(list(c * r ORDER BY b), (a, x) -> a + x), 6)
       |      AS weight,
       |    CAST(sum(c) AS BIGINT) AS n_ngrams
       |  FROM db JOIN ratio USING (b) GROUP BY doc_id)
       |SELECT CAST(row_number() OVER (ORDER BY weight DESC, doc_id) AS BIGINT)
       |    AS rank, doc_id, weight, n_ngrams
       |FROM w QUALIFY rank <= $topK ORDER BY rank""".stripMargin
  }
}
