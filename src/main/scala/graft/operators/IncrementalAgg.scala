package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — refresh a keyed aggregate from a
  * change data feed instead of rescanning the base table (SURVEY.md
  * §2.11 scale extension; no reference analog — the reference's only
  * state is the last-value table itself).
  *
  * The 100 TB argument: a grouped sum/count over the full base table is
  * a full scan + shuffle per refresh. With a CDF
  * ([[Snapshot.changeDataFeed]] or a TxTable version diff), the refresh
  * cost is O(|changes|) + one key-partitioned merge join against the
  * (much smaller) aggregate state: inserts/post-images contribute +value,
  * deletes/pre-images −value — sum and count are abelian-group
  * aggregates, so signed deltas compose exactly. Groups whose count
  * reaches zero leave the state. Avg/derived ratios come from the
  * maintained (sum, count) pair; non-invertible aggregates (min/max
  * under deletes) need a rescan of the affected groups and are out of
  * scope by design — document, don't pretend.
  *
  * EXACTNESS requires an order-insensitive value domain: integer or
  * DECIMAL sums are exact under any grouping/merge order, so the
  * maintained state is bit-identical to a from-scratch recompute (q185's
  * oracle proves this cross-engine). Floating-point sums are NOT —
  * maintain decimals, not doubles.
  */
object IncrementalAgg {

  /** Signed per-group deltas from a CDF: for each group, `d_cnt` =
    * Σ sign and `d_sum_<c>` = Σ sign·c, where sign is +1 for
    * insert/update_postimage and −1 for delete/update_preimage rows.
    * The aggregation is map-side partial — the shuffle carries one row
    * per AFFECTED group, never per change row.
    */
  def sumCountDeltas(
      cdf: DataFrame,
      groupCols: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    val sign = when(col("change_type").isin("insert", "update_postimage"), 1L)
      .when(col("change_type").isin("delete", "update_preimage"), -1L)
    // an unknown change_type must fail loudly, not silently drop weight
    val checked = cdf.withColumn("__sign",
      coalesce(sign, raise_error(concat(lit("unknown change_type: "),
        col("change_type")))))
    checked.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__sign")).as("d_cnt"),
        sumCols.map(c => sum(col(c) * col("__sign")).as(s"d_sum_$c")): _*)
  }

  /** Merge signed deltas into the previous aggregate state.
    *
    * @param prevAgg previous state: groupCols ++ (cntCol, sum columns) —
    *                the schema [[sumCountDeltas]] maintains
    * @param deltas  output of [[sumCountDeltas]] over the CDF
    * @return the refreshed state: same schema as `prevAgg`; groups with
    *         zero remaining rows are dropped, brand-new groups appear.
    *         One full-outer equi-join on the group key — co-located for
    *         free when the state table is bucketed by it.
    */
  def applySumCount(
      prevAgg: DataFrame,
      deltas: DataFrame,
      groupCols: Seq[String],
      cntCol: String,
      sumCols: Seq[String]): DataFrame = {
    def z(c: Column) = coalesce(c, lit(0L))
    prevAgg.join(deltas, groupCols, "full_outer")
      .select((groupCols.map(col) :+
        (z(col(cntCol)) + z(col("d_cnt"))).as(cntCol)) ++
        sumCols.map(c =>
          (coalesce(col(c), lit(0)) + coalesce(col(s"d_sum_$c"), lit(0)))
            .as(c)): _*)
      .filter(col(cntCol) > 0)
  }

  /** One-call refresh: state' = apply(state, deltas(cdf)). */
  def refreshSumCount(
      prevAgg: DataFrame,
      cdf: DataFrame,
      groupCols: Seq[String],
      cntCol: String,
      sumCols: Seq[String]): DataFrame =
    applySumCount(prevAgg, sumCountDeltas(cdf, groupCols, sumCols),
      groupCols, cntCol, sumCols)

  /** Second-moment (variance) maintenance — the FIFTH IVM algebra, and
    * the degenerate-easy one: (count, Σv, Σv²) are all abelian-group
    * aggregates, so variance maintains exactly like sum/count with a
    * derived squared column — no rescan set, no support table. The
    * prevAgg must carry `cntCol`, `valCol` (= Σv) and `<valCol>_sq`
    * (= Σv²). Exactness needs an integer/decimal value domain, as
    * everywhere in this family; derive the float variance at
    * PRESENTATION time via [[popVariance]], never maintain it.
    */
  def refreshMoments(
      prevAgg: DataFrame,
      cdf: DataFrame,
      groupCols: Seq[String],
      cntCol: String,
      valCol: String): DataFrame = {
    val withSq = cdf.withColumn(s"${valCol}_sq", col(valCol) * col(valCol))
    refreshSumCount(prevAgg, withSq, groupCols, cntCol,
      Seq(valCol, s"${valCol}_sq"))
  }

  /** Population variance from maintained (count, Σv, Σv²): the integer
    * numerator n·Σv² − (Σv)² computes EXACTLY, then one IEEE division —
    * the same expression tree an oracle replays bit-identically
    * (Welford-style running floats would drift engine-by-engine).
    */
  def popVariance(cnt: Column, s: Column, s2: Column): Column =
    (s2 * cnt - s * s).cast("double") / (cnt * cnt).cast("double")

  /** The groups whose min/max CANNOT be maintained from the feed alone
    * and need a rescan: min/max are not invertible under deletion, so a
    * group re-derives iff the feed removes weight AT an extremum —
    * a delete/update_preimage row with value ≤ the maintained min or ≥
    * the maintained max (ties included: the removed row may have BEEN
    * the extremum's last copy) — or the feed touches a group the state
    * does not know. Deletions strictly inside the (min, max) interval
    * cannot move either end and stay feed-only. Exposed separately so
    * callers (and the spec) can audit that a refresh rescans O(affected
    * groups), not the table.
    */
  def minMaxRescanKeys(
      prevAgg: DataFrame,
      cdf: DataFrame,
      groupCols: Seq[String],
      valCol: String,
      mnCol: String = "mn",
      mxCol: String = "mx"): DataFrame = {
    val removed = cdf
      .filter(col("change_type").isin("delete", "update_preimage"))
      .groupBy(groupCols.map(col): _*)
      .agg(min(col(valCol)).as("__rmn"), max(col(valCol)).as("__rmx"))
    removed.join(prevAgg.select((groupCols.map(col) :+
        col(mnCol).as("__mn") :+ col(mxCol).as("__mx")): _*),
        groupCols, "left")
      .filter(col("__mn").isNull ||
        col("__rmn") <= col("__mn") || col("__rmx") >= col("__mx"))
      .select(groupCols.map(col): _*)
  }

  /** Maintain per-group min/max from a change data feed, rescanning
    * ONLY the groups a deletion at an extremum invalidates
    * ([[minMaxRescanKeys]]); every other group merges monotonically
    * (insert/update-postimage values can only tighten an extremum
    * outward: min' = least(min, batch min), max' = greatest).
    *
    * @param newBase the POST-change base relation (e.g. the table's new
    *                merged view, or the CDF-maintained replica): rescans
    *                read the affected groups from here via one semi-join
    *                — partition-/bucket-pruned when the base is laid out
    *                on the group key, so the rescan cost is O(rows of
    *                affected groups), never a table scan.
    * @return groupCols ++ (mnCol, mxCol); groups with no remaining rows
    *         disappear (their rescan finds nothing).
    *
    * Exactness needs an order-insensitive value domain for the COMPARE
    * (any orderable type works — min/max never add), so unlike the
    * sum path even doubles are safe here.
    */
  def refreshMinMax(
      prevAgg: DataFrame,
      cdf: DataFrame,
      newBase: DataFrame,
      groupCols: Seq[String],
      valCol: String,
      mnCol: String = "mn",
      mxCol: String = "mx"): DataFrame = {
    val rescanKeys = minMaxRescanKeys(prevAgg, cdf, groupCols, valCol,
      mnCol, mxCol)
    val rescanned = newBase.join(rescanKeys, groupCols, "left_semi")
      .groupBy(groupCols.map(col): _*)
      .agg(min(col(valCol)).as(mnCol), max(col(valCol)).as(mxCol))
    val added = cdf
      .filter(col("change_type").isin("insert", "update_postimage"))
      .groupBy(groupCols.map(col): _*)
      .agg(min(col(valCol)).as("__amn"), max(col(valCol)).as("__amx"))
    val monotonic = prevAgg.join(added, groupCols, "full_outer")
      .join(rescanKeys.withColumn("__r", lit(true)), groupCols, "left")
      .filter(col("__r").isNull)
      .select((groupCols.map(col) :+
        least(col(mnCol), col("__amn")).as(mnCol) :+
        greatest(col(mxCol), col("__amx")).as(mxCol)): _*)
    monotonic.unionByName(rescanned)
  }

  /** The join-view refreshers rename the right input's join key to the
    * left's name before the using-join; if the right side ALREADY has a
    * distinct column named like the left key, that rename would create
    * duplicate column names and an ambiguous join — fail loudly instead.
    */
  private def requireNoKeyShadow(
      right: DataFrame, leftKey: String, rightKey: String): Unit =
    require(leftKey == rightKey || !right.columns.contains(leftKey),
      s"right input already carries a column named '$leftKey' distinct " +
        s"from its join key '$rightKey' — renaming would create an " +
        "ambiguous duplicate; drop or rename it before the refresh")

  /** Maintain a JOIN-aggregate view from the change feeds of BOTH join
    * inputs — the sixth IVM algebra, and the one that makes the others
    * compose into real pipelines: V = γ(L ⋈ R) maintained without ever
    * re-joining the full inputs. Joins are bilinear over signed
    * multisets, so with L' = L + ΔL and R' = R + ΔR:
    *
    *   L' ⋈ R'  =  L ⋈ R  +  ΔL ⋈ R'  +  L ⋈ ΔR
    *
    * (the ΔL ⋈ ΔR cross term is absorbed by joining ΔL against the NEW
    * right side and ΔR against the OLD left side — the standard
    * delta-join bracketing). Each correction term is one equi-join of a
    * small signed feed against a snapshot, then the [[sumCountDeltas]]
    * sign algebra folds both into the maintained (count, sums) state —
    * a feed row's sign rides every pair it produces, signs never
    * multiply because no term joins two deltas.
    *
    * Scale posture: the refresh cost is O(|ΔL| · fanout + |ΔR| ·
    * fanout) join work + one O(affected groups) state merge — never a
    * scan of L, R, or the view. Both probe joins are partition-pruned /
    * co-located for free when the snapshots are bucketed on their join
    * keys. Exactness needs the same order-insensitive value domain as
    * [[refreshSumCount]]: integer or DECIMAL sums.
    *
    * @param cdfLeft  change feed of the LEFT input: change_type + join
    *                 key + the left-side group/sum columns
    * @param oldLeft  PRE-change left snapshot (L)
    * @param cdfRight change feed of the RIGHT input
    * @param newRight POST-change right snapshot (R')
    * @param leftKey/rightKey equi-join columns (renamed into one name
    *                 internally; pass the same string when they match)
    * @return the refreshed state, [[applySumCount]] semantics: emptied
    *         groups leave, brand-new groups (e.g. a dimension value the
    *         right feed just introduced) appear.
    */
  def refreshJoinSumCount(
      prevAgg: DataFrame,
      cdfLeft: DataFrame,
      oldLeft: DataFrame,
      cdfRight: DataFrame,
      newRight: DataFrame,
      leftKey: String,
      rightKey: String,
      groupCols: Seq[String],
      cntCol: String,
      sumCols: Seq[String]): DataFrame = {
    require(!oldLeft.columns.contains("change_type") &&
        !newRight.columns.contains("change_type"),
      "snapshot inputs must not carry a change_type column — it would " +
        "shadow the feed's sign and silently corrupt the delta algebra")
    Seq(cdfRight, newRight).foreach(requireNoKeyShadow(_, leftKey, rightKey))
    // sum columns must ride the LEFT (probe/fact) side: a right-carried
    // measure multiplies by the join fan-out and the maintained number
    // would be silently wrong
    val rightMeasures = sumCols.filterNot(oldLeft.columns.contains)
    require(rightMeasures.isEmpty,
      s"sum column(s) ${rightMeasures.mkString(", ")} are not left-side " +
        "columns — a right-carried measure multiplies by the join " +
        "fan-out; make that side the left input or aggregate it " +
        "in its own view")
    val proj = (groupCols ++ sumCols :+ "change_type").map(col)
    // ΔL ⋈ R′ : the left feed's sign rides each produced pair
    val dLeft = cdfLeft
      .join(newRight.withColumnRenamed(rightKey, leftKey), Seq(leftKey))
      .select(proj: _*)
    // L ⋈ ΔR : the right feed's sign rides each produced pair
    val dRight = oldLeft
      .join(cdfRight.withColumnRenamed(rightKey, leftKey), Seq(leftKey))
      .select(proj: _*)
    refreshSumCount(prevAgg, dLeft.unionByName(dRight),
      groupCols, cntCol, sumCols)
  }

  /** [[applySumCount]] with a NULL-SAFE group-key merge: LEFT-outer
    * views have a legitimate NULL group (the unmatched rows' null-padded
    * dimension attributes), and the plain using-join would never match
    * the state's null-group row against its delta — the group would
    * silently split in two. Same contract otherwise.
    */
  def applySumCountNullSafe(
      prevAgg: DataFrame,
      deltas: DataFrame,
      groupCols: Seq[String],
      cntCol: String,
      sumCols: Seq[String]): DataFrame = {
    def z(c: Column) = coalesce(c, lit(0L))
    val l = prevAgg.as("__s"); val r = deltas.as("__d")
    val cond = groupCols.map(c => col(s"__s.$c") <=> col(s"__d.$c"))
      .reduce(_ && _)
    l.join(r, cond, "full_outer")
      .select((groupCols.map(c =>
        coalesce(col(s"__s.$c"), col(s"__d.$c")).as(c)) :+
        (z(col(s"__s.$cntCol")) + z(col(s"__d.d_cnt"))).as(cntCol)) ++
        sumCols.map(c =>
          (coalesce(col(s"__s.$c"), lit(0)) +
            coalesce(col(s"__d.d_sum_$c"), lit(0))).as(c)): _*)
      .filter(col(cntCol) > 0)
  }

  /** LEFT-OUTER-join aggregate maintenance — the null-extension case
    * the inner-join algebras can't express: V = γ(L ⟕ R), where an L
    * row with no R match contributes once with null-padded R
    * attributes. Decompose L ⟕ R = (L ⋈ R) ⊎ (L ▷ R) × {nulls}; the
    * inner part maintains by the [[refreshJoinSumCount]] bracketing,
    * and the anti part A = L · z(m) (z(m)=1 iff the row's key has ZERO
    * R matches) telescopes the same way:
    *
    *   ΔA = ΔL · z′ + L · Δz
    *
    * — ΔL rows kept iff their key is absent from R′ (one anti-join),
    * plus OLD L rows of keys whose match count TRANSITIONED: a key R′
    * dropped entirely re-enters the anti part (+, its L rows regain
    * the null group), a key R′ introduced leaves it (−). Signs ride
    * the feed/transition rows through [[sumCountDeltas]]; the state
    * merge is null-safe ([[applySumCountNullSafe]]) because the null
    * group is a first-class group here. A NULL join key on the left
    * never matches (SQL semantics) and lives permanently in the anti
    * part — both sides of the telescoping preserve that.
    *
    * Scale posture: the transition keys come from two key-distinct
    * anti-joins of the R snapshots — O(|R| keys), the dim side; at
    * fact-sized R maintain the per-key match count with
    * [[refreshSumCount]] instead and feed the transitions from its
    * before/after states. Sum columns must ride L, as everywhere in
    * the family.
    */
  def refreshLeftJoinSumCount(
      prevAgg: DataFrame,
      cdfLeft: DataFrame,
      oldLeft: DataFrame,
      cdfRight: DataFrame,
      oldRight: DataFrame,
      newRight: DataFrame,
      leftKey: String,
      rightKey: String,
      groupCols: Seq[String],
      cntCol: String,
      sumCols: Seq[String]): DataFrame = {
    require(!oldLeft.columns.contains("change_type") &&
        !oldRight.columns.contains("change_type") &&
        !newRight.columns.contains("change_type"),
      "snapshot inputs must not carry a change_type column — it would " +
        "shadow the feed's sign and silently corrupt the delta algebra")
    Seq(cdfRight, oldRight, newRight)
      .foreach(requireNoKeyShadow(_, leftKey, rightKey))
    val leftMeasures = sumCols.filterNot(oldLeft.columns.contains)
    require(leftMeasures.isEmpty,
      s"sum column(s) ${leftMeasures.mkString(", ")} are not left-side " +
        "columns — a right-carried measure multiplies by the join fan-out")
    val proj = (groupCols ++ sumCols :+ "change_type").map(col)
    // R-sourced group columns null-pad in the anti part, typed from R′
    val rightTypes = newRight.schema.map(f => f.name -> f.dataType).toMap
    val antiProj = (groupCols.map { g =>
      if (oldLeft.columns.contains(g)) col(g)
      else lit(null).cast(rightTypes.getOrElse(g,
        org.apache.spark.sql.types.StringType)).as(g)
    } ++ sumCols.map(col) :+ col("change_type"))
    // inner part: the refreshJoinSumCount terms
    val innerL = cdfLeft
      .join(newRight.withColumnRenamed(rightKey, leftKey), Seq(leftKey))
      .select(proj: _*)
    val innerR = oldLeft
      .join(cdfRight.withColumnRenamed(rightKey, leftKey), Seq(leftKey))
      .select(proj: _*)
    // anti part, term 1: ΔL against the NEW zero-match keys
    val rKeysNew = newRight.select(col(rightKey).as(leftKey)).distinct()
    val rKeysOld = oldRight.select(col(rightKey).as(leftKey)).distinct()
    val antiDelta = cdfLeft.join(rKeysNew, Seq(leftKey), "left_anti")
      .select(antiProj: _*)
    // anti part, term 2: OLD L rows of keys whose emptiness flipped —
    // a key R′ dropped re-enters the anti part (+), a born key leaves (−)
    val died = rKeysOld.join(rKeysNew, Seq(leftKey), "left_anti")
      .withColumn("change_type", lit("insert"))
    val born = rKeysNew.join(rKeysOld, Seq(leftKey), "left_anti")
      .withColumn("change_type", lit("delete"))
    val antiTrans = oldLeft.join(died.unionByName(born), Seq(leftKey))
      .select(antiProj: _*)
    val deltas = sumCountDeltas(
      Seq(innerL, innerR, antiDelta, antiTrans).reduce(_ unionByName _),
      groupCols, sumCols)
    applySumCountNullSafe(prevAgg, deltas, groupCols, cntCol, sumCols)
  }

  /** RIGHT-OUTER-join aggregate maintenance: V = γ(L ⟖ R) =
    * γ( (L ⋈ R) ⊎ (R ▷ L)×{nullL} ). NOT expressible by swapping the
    * left algebra's inputs when the measures ride L (the family
    * contract): here the PRESERVED side R carries no measures, so an
    * unmatched R row adds to the count with NULL sums — exactly
    * [[refreshFullJoinSumCount]]'s right-anti machinery without its
    * left-anti part. Same state schema as the full-outer (per-measure
    * `<c>_nn` non-null counters beside each sum; restore SQL's
    * sum-over-all-null = NULL at presentation with
    * `when(col("p_nn") > 0, col("p"))`).
    */
  def refreshRightJoinSumCount(
      prevAgg: DataFrame,
      cdfLeft: DataFrame,
      oldLeft: DataFrame,
      newLeft: DataFrame,
      cdfRight: DataFrame,
      oldRight: DataFrame,
      newRight: DataFrame,
      leftKey: String,
      rightKey: String,
      groupCols: Seq[String],
      cntCol: String,
      sumCols: Seq[String]): DataFrame = {
    require(Seq(oldLeft, newLeft, oldRight, newRight)
        .forall(d => !d.columns.contains("change_type")),
      "snapshot inputs must not carry a change_type column — it would " +
        "shadow the feed's sign and silently corrupt the delta algebra")
    Seq(cdfRight, oldRight, newRight)
      .foreach(requireNoKeyShadow(_, leftKey, rightKey))
    val leftMeasures = sumCols.filterNot(oldLeft.columns.contains)
    require(leftMeasures.isEmpty,
      s"sum column(s) ${leftMeasures.mkString(", ")} are not left-side " +
        "columns — a right-carried measure multiplies by the join fan-out")
    val proj = (groupCols ++ sumCols :+ "change_type").map(col)
    val leftTypes = oldLeft.schema.map(f => f.name -> f.dataType).toMap
    // right-anti rows: L-sourced group cols AND all measures null-pad
    val rightAntiProj = (groupCols.map { g =>
      if (oldRight.columns.contains(g) || newRight.columns.contains(g)) col(g)
      else lit(null).cast(leftTypes.getOrElse(g,
        org.apache.spark.sql.types.StringType)).as(g)
    } ++ sumCols.map(c => lit(null).cast(leftTypes(c)).as(c)) :+
      col("change_type"))
    val rRenamed = (d: DataFrame) => d.withColumnRenamed(rightKey, leftKey)
    // inner part: the refreshJoinSumCount bracketing
    val innerL = cdfLeft.join(rRenamed(newRight), Seq(leftKey)).select(proj: _*)
    val innerR = oldLeft.join(rRenamed(cdfRight), Seq(leftKey)).select(proj: _*)
    // right-anti part: ΔR·z_L′ + R·Δz_L over the LEFT side's key-emptiness
    val lKeysNew = newLeft.select(col(leftKey)).distinct()
    val lKeysOld = oldLeft.select(col(leftKey)).distinct()
    val rAntiDelta = rRenamed(cdfRight).join(lKeysNew, Seq(leftKey), "left_anti")
      .select(rightAntiProj: _*)
    val lDied = lKeysOld.join(lKeysNew, Seq(leftKey), "left_anti")
      .withColumn("change_type", lit("insert"))
    val lBorn = lKeysNew.join(lKeysOld, Seq(leftKey), "left_anti")
      .withColumn("change_type", lit("delete"))
    val rAntiTrans = rRenamed(oldRight).join(lDied.unionByName(lBorn), Seq(leftKey))
      .select(rightAntiProj: _*)
    val unioned = Seq(innerL, innerR, rAntiDelta, rAntiTrans)
      .reduce(_ unionByName _)
    val withNn = sumCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"${c}_nn", when(col(c).isNotNull, 1L).otherwise(0L))
    }
    val allSums = sumCols ++ sumCols.map(c => s"${c}_nn")
    val deltas = sumCountDeltas(withNn, groupCols, allSums)
    applySumCountNullSafe(prevAgg, deltas, groupCols, cntCol, allSums)
  }

  /** FULL-OUTER-join aggregate maintenance — the final member of the
    * join-IVM family: V = γ(L ⟗ R) = γ( (L ⋈ R) ⊎ (L ▷ R)×{nullR} ⊎
    * (R ▷ L)×{nullL} ). The inner and left-anti parts maintain exactly
    * as in [[refreshLeftJoinSumCount]]; the RIGHT-anti part is the
    * mirror telescoping ΔA_R = ΔR·z_L′ + R·Δz_L over the LEFT side's
    * key-emptiness — its rows carry real R-sourced group values but
    * NULL measures (sum columns ride L by the family contract, and SQL
    * FULL JOIN null-pads them for unmatched right rows: they add to the
    * count and nothing to the sums, which is exactly what a null
    * measure does under [[sumCountDeltas]]'s skip-null sums).
    *
    * Needs BOTH left snapshots (the right-anti transitions read the
    * left side's old/new key sets — O(distinct keys); at fact-sized L
    * maintain that key support with [[refreshSupport]] instead).
    *
    * STATE SCHEMA: groupCols ++ cntCol ++ sumCols ++ `<c>_nn` per sum
    * column — the per-measure NON-NULL counter. SQL's `sum` over an
    * all-null group is NULL, but an additive state can only say 0; the
    * counter (itself abelian, so it maintains exactly) lets the caller
    * restore exact SQL semantics at presentation:
    * `when(col("p_nn") > 0, col("p"))`. Seed `prevAgg` with
    * `count(col(c)).as(s"${c}_nn")` beside each sum.
    */
  def refreshFullJoinSumCount(
      prevAgg: DataFrame,
      cdfLeft: DataFrame,
      oldLeft: DataFrame,
      newLeft: DataFrame,
      cdfRight: DataFrame,
      oldRight: DataFrame,
      newRight: DataFrame,
      leftKey: String,
      rightKey: String,
      groupCols: Seq[String],
      cntCol: String,
      sumCols: Seq[String]): DataFrame = {
    require(Seq(oldLeft, newLeft, oldRight, newRight)
        .forall(d => !d.columns.contains("change_type")),
      "snapshot inputs must not carry a change_type column — it would " +
        "shadow the feed's sign and silently corrupt the delta algebra")
    Seq(cdfRight, oldRight, newRight)
      .foreach(requireNoKeyShadow(_, leftKey, rightKey))
    val leftMeasures = sumCols.filterNot(oldLeft.columns.contains)
    require(leftMeasures.isEmpty,
      s"sum column(s) ${leftMeasures.mkString(", ")} are not left-side " +
        "columns — a right-carried measure multiplies by the join fan-out")
    val proj = (groupCols ++ sumCols :+ "change_type").map(col)
    val leftTypes = oldLeft.schema.map(f => f.name -> f.dataType).toMap
    val rightTypes = newRight.schema.map(f => f.name -> f.dataType).toMap
    // left-anti rows: R-sourced group cols null-pad
    val leftAntiProj = (groupCols.map { g =>
      if (oldLeft.columns.contains(g)) col(g)
      else lit(null).cast(rightTypes.getOrElse(g,
        org.apache.spark.sql.types.StringType)).as(g)
    } ++ sumCols.map(col) :+ col("change_type"))
    // right-anti rows: L-sourced group cols AND all measures null-pad
    val rightAntiProj = (groupCols.map { g =>
      if (oldRight.columns.contains(g) || newRight.columns.contains(g)) col(g)
      else lit(null).cast(leftTypes.getOrElse(g,
        org.apache.spark.sql.types.StringType)).as(g)
    } ++ sumCols.map(c => lit(null).cast(leftTypes(c)).as(c)) :+
      col("change_type"))
    val rRenamed = (d: DataFrame) => d.withColumnRenamed(rightKey, leftKey)
    // inner part
    val innerL = cdfLeft.join(rRenamed(newRight), Seq(leftKey)).select(proj: _*)
    val innerR = oldLeft.join(rRenamed(cdfRight), Seq(leftKey)).select(proj: _*)
    // left-anti part (rows of L with no R match)
    val rKeysNew = newRight.select(col(rightKey).as(leftKey)).distinct()
    val rKeysOld = oldRight.select(col(rightKey).as(leftKey)).distinct()
    val lAntiDelta = cdfLeft.join(rKeysNew, Seq(leftKey), "left_anti")
      .select(leftAntiProj: _*)
    val rDied = rKeysOld.join(rKeysNew, Seq(leftKey), "left_anti")
      .withColumn("change_type", lit("insert"))
    val rBorn = rKeysNew.join(rKeysOld, Seq(leftKey), "left_anti")
      .withColumn("change_type", lit("delete"))
    val lAntiTrans = oldLeft.join(rDied.unionByName(rBorn), Seq(leftKey))
      .select(leftAntiProj: _*)
    // right-anti part (rows of R with no L match), mirror telescoping
    val lKeysNew = newLeft.select(col(leftKey)).distinct()
    val lKeysOld = oldLeft.select(col(leftKey)).distinct()
    val rAntiDelta = rRenamed(cdfRight).join(lKeysNew, Seq(leftKey), "left_anti")
      .select(rightAntiProj: _*)
    val lDied = lKeysOld.join(lKeysNew, Seq(leftKey), "left_anti")
      .withColumn("change_type", lit("insert"))
    val lBorn = lKeysNew.join(lKeysOld, Seq(leftKey), "left_anti")
      .withColumn("change_type", lit("delete"))
    val rAntiTrans = rRenamed(oldRight).join(lDied.unionByName(lBorn), Seq(leftKey))
      .select(rightAntiProj: _*)
    val unioned = Seq(innerL, innerR, lAntiDelta, lAntiTrans,
      rAntiDelta, rAntiTrans).reduce(_ unionByName _)
    // per-measure non-null counters ride the same sign algebra
    val withNn = sumCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"${c}_nn",
        when(col(c).isNotNull, 1L).otherwise(0L))
    }
    val allSums = sumCols ++ sumCols.map(c => s"${c}_nn")
    val deltas = sumCountDeltas(withNn, groupCols, allSums)
    applySumCountNullSafe(prevAgg, deltas, groupCols, cntCol, allSums)
  }

  /** One dimension input of [[refreshStarSumCount]]: its change feed,
    * its PRE-change snapshot (joined in terms for feeds EARLIER in the
    * chain is wrong — see the telescoping below — it appears in terms
    * for feeds LATER in the chain), its POST-change snapshot (terms for
    * earlier feeds), and the fact-side/dim-side equi-join columns. For
    * a snowflake chain, `factKey` may name a column PRODUCED by the
    * previous dimension's join (e.g. customer supplies `nationkey` for
    * the nation dim) — terms join in chain order, so it is in scope.
    */
  final case class DimFeed(
      cdf: DataFrame,
      oldDim: DataFrame,
      newDim: DataFrame,
      factKey: String,
      dimKey: String)

  /** STAR/SNOWFLAKE-join aggregate maintenance — the N-way telescoping
    * of [[refreshJoinSumCount]]: V = γ(F ⋈ D₁ ⋈ … ⋈ Dₙ) maintained
    * from the change feeds of the fact AND every dimension. Joins are
    * multilinear over signed multisets, so the update telescopes:
    *
    *   F′D₁′…Dₙ′ − FD₁…Dₙ =
    *     ΔF ⋈ D₁′ ⋈ … ⋈ Dₙ′                 (all NEW dims)
    *   + F ⋈ ΔD₁ ⋈ D₂′ ⋈ … ⋈ Dₙ′            (OLD before, NEW after)
    *   + F ⋈ D₁ ⋈ ΔD₂ ⋈ D₃′ ⋈ … ⋈ Dₙ′
    *   + …
    *   + F ⋈ D₁ ⋈ … ⋈ Dₙ₋₁ ⋈ ΔDₙ
    *
    * — each term ONE signed feed joined against snapshots (signs never
    * multiply), each O(|Δ| · fanout) probe work; the dims are the
    * broadcast-sized sides of a star, so every term is a broadcast
    * chain off a small feed or a partition-pruned probe of the fact.
    * Group columns may come from any input (a dimension attribute the
    * feed renames moves weight between groups through its own term);
    * sum columns must come from the FACT (a dimension-carried measure
    * would multiply through the join — refuse that shape by design).
    * Exactness: the [[refreshSumCount]] integer/DECIMAL domain.
    */
  def refreshStarSumCount(
      prevAgg: DataFrame,
      factCdf: DataFrame,
      oldFact: DataFrame,
      dims: Seq[DimFeed],
      groupCols: Seq[String],
      cntCol: String,
      sumCols: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "refreshStarSumCount needs at least one dimension" +
      " — for zero dims use refreshSumCount directly")
    require(!oldFact.columns.contains("change_type") &&
        dims.forall(d => !d.oldDim.columns.contains("change_type") &&
          !d.newDim.columns.contains("change_type")),
      "snapshot inputs must not carry a change_type column — it would " +
        "shadow the feed's sign and silently corrupt the delta algebra")
    dims.foreach { d =>
      Seq(d.cdf, d.oldDim, d.newDim)
        .foreach(requireNoKeyShadow(_, d.factKey, d.dimKey))
    }
    // the doc's "sum columns come from the FACT" is a THEOREM input, not
    // advice: a dimension-carried measure multiplies by the join fan-out
    // and the telescoping would maintain a silently wrong number
    val dimMeasures = sumCols.filterNot(oldFact.columns.contains)
    require(dimMeasures.isEmpty,
      s"sum column(s) ${dimMeasures.mkString(", ")} are not fact columns — " +
        "a dimension-carried measure multiplies by the join fan-out; " +
        "aggregate it in its own view instead")
    def dimJoin(base: DataFrame, d: DataFrame, factKey: String, dimKey: String) =
      base.join(d.withColumnRenamed(dimKey, factKey), Seq(factKey))
    val proj = (groupCols ++ sumCols :+ "change_type").map(col)
    // term 0: the fact feed against every NEW dimension
    val tFact = dims.foldLeft(factCdf) { case (b, dj) =>
      dimJoin(b, dj.newDim, dj.factKey, dj.dimKey)
    }.select(proj: _*)
    // term i+1: old fact; dims joined IN CHAIN ORDER as old (< i),
    // the feed (= i), new (> i) — chain order keeps snowflake keys in
    // scope when a dim keys off a column the previous dim produced
    val tDims = dims.indices.map { i =>
      dims.zipWithIndex.foldLeft(oldFact) { case (b, (dj, j)) =>
        val side =
          if (j < i) dj.oldDim else if (j == i) dj.cdf else dj.newDim
        dimJoin(b, side, dj.factKey, dj.dimKey)
      }.select(proj: _*)
    }
    refreshSumCount(prevAgg, (tFact +: tDims).reduce(_ unionByName _),
      groupCols, cntCol, sumCols)
  }

  /** Signed per-(group, value) SUPPORT deltas from a CDF — the classic
    * counting algorithm that makes COUNT(DISTINCT) incrementally
    * maintainable: distinct-count itself is not invertible (a delete may
    * or may not remove the value's last copy), but the support table
    * (group, value) -> multiplicity IS an abelian-group state, and
    * n_distinct = the number of support rows per group. Map-side partial;
    * the shuffle carries one row per affected (group, value), never per
    * change row.
    */
  def supportDeltas(
      cdf: DataFrame,
      groupCols: Seq[String],
      valCol: String): DataFrame = {
    val sign = when(col("change_type").isin("insert", "update_postimage"), 1L)
      .when(col("change_type").isin("delete", "update_preimage"), -1L)
    val checked = cdf.withColumn("__sign",
      coalesce(sign, raise_error(concat(lit("unknown change_type: "),
        col("change_type")))))
    checked.groupBy((groupCols :+ valCol).map(col): _*)
      .agg(sum(col("__sign")).as("d_sup"))
  }

  /** Merge support deltas into the previous support table. Values whose
    * multiplicity reaches zero leave the state; a multiplicity that
    * would go NEGATIVE fails loudly — the feed deleted a row the state
    * never held, so state and feed have diverged and every downstream
    * distinct-count would silently lie. One full-outer equi-join on
    * (group, value) — co-located for free when the state is bucketed by
    * the group key. State size is O(distinct (group, value)) — the
    * irreducible memory of EXACT distinct maintenance; use the HLL
    * sketches (q26/q123) when approximate is acceptable at 100 TB.
    */
  def refreshSupport(
      prevSupport: DataFrame,
      cdf: DataFrame,
      groupCols: Seq[String],
      valCol: String,
      supCol: String = "support"): DataFrame = {
    val merged = prevSupport
      .join(supportDeltas(cdf, groupCols, valCol), groupCols :+ valCol,
        "full_outer")
      .select((groupCols :+ valCol).map(col) :+
        (coalesce(col(supCol), lit(0L)) + coalesce(col("d_sup"), lit(0L)))
          .as(supCol): _*)
    merged
      .withColumn(supCol,
        when(col(supCol) < 0, raise_error(concat(
          lit(s"negative support in $supCol: CDF deleted a row the state " +
            "never held for value "), col(valCol).cast("string"))))
          .otherwise(col(supCol)))
      .filter(col(supCol) > 0)
  }

  /** Derive the per-group aggregate view from a support table:
    * n_distinct = support rows, n_rows = Σ multiplicity. */
  def distinctFromSupport(
      support: DataFrame,
      groupCols: Seq[String],
      supCol: String = "support",
      ndCol: String = "n_distinct",
      rowsCol: String = "n_rows"): DataFrame =
    support.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(ndCol), sum(col(supCol)).as(rowsCol))

  /** The groups whose maintained top-k (largest values, multiset
    * semantics) CANNOT be repaired from the feed alone: a
    * delete/update_preimage at or above the maintained k-th value may
    * remove a top-k member (ties included — the removed row may be a
    * duplicate of the cut value), a group the state does not know has
    * no baseline, and a state holding fewer than k values has EVERY
    * row in its top-k. Deletions strictly below the cut cannot enter
    * the top-k and stay feed-only — the [[minMaxRescanKeys]] argument,
    * generalized from k = 1.
    */
  def topKRescanKeys(
      prevAgg: DataFrame,
      cdf: DataFrame,
      groupCols: Seq[String],
      valCol: String,
      k: Int,
      tkCol: String = "topk"): DataFrame = {
    val removed = cdf
      .filter(col("change_type").isin("delete", "update_preimage"))
      .groupBy(groupCols.map(col): _*)
      .agg(max(col(valCol)).as("__rmx"))
    removed.join(prevAgg.select((groupCols.map(col) :+
        col(tkCol).as("__tk")): _*), groupCols, "left")
      .filter(col("__tk").isNull || size(col("__tk")) < k ||
        col("__rmx") >= element_at(col("__tk"), k))
      .select(groupCols.map(col): _*)
  }

  /** Maintain the per-group top-k largest `valCol` values (a sorted-
    * descending array, multiset semantics) from a change data feed,
    * rescanning ONLY the groups a deletion at the cut invalidates
    * ([[topKRescanKeys]]); every other group merges monotonically —
    * the batch's own top-k unions into the maintained array and the
    * merge re-cuts at k. Both the per-batch and the rescan top-k cuts
    * go through a row_number window (never a whole-group collect), so
    * executor memory stays O(k) and the rescan cost is O(rows of
    * affected groups). Any orderable value type works — top-k never
    * adds, exactly like min/max.
    *
    * @param newBase the POST-change base relation (rescans read the
    *                affected groups from here via one semi-join)
    * @return groupCols ++ tkCol (ARRAY, length ≤ k, sorted descending);
    *         emptied groups disappear (their rescan finds nothing).
    */
  def refreshTopK(
      prevAgg: DataFrame,
      cdf: DataFrame,
      newBase: DataFrame,
      groupCols: Seq[String],
      valCol: String,
      k: Int,
      tkCol: String = "topk"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    def topkOf(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(groupCols.map(col): _*)
        .orderBy(col(valCol).desc)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k)
        .groupBy(groupCols.map(col): _*)
        .agg(slice(sort_array(collect_list(col(valCol)), asc = false),
          1, k).as(tkCol))
    }
    val rescanKeys = topKRescanKeys(prevAgg, cdf, groupCols, valCol, k, tkCol)
    val rescanned = topkOf(newBase.join(rescanKeys, groupCols, "left_semi"))
    val added = topkOf(cdf
        .filter(col("change_type").isin("insert", "update_postimage")))
      .withColumnRenamed(tkCol, "__add")
    val empty = array().cast(prevAgg.schema(tkCol).dataType)
    val monotonic = prevAgg.join(added, groupCols, "full_outer")
      .join(rescanKeys.withColumn("__r", lit(true)), groupCols, "left")
      .filter(col("__r").isNull)
      .select((groupCols.map(col) :+
        slice(sort_array(concat(coalesce(col(tkCol), empty),
          coalesce(col("__add"), empty)), asc = false), 1, k).as(tkCol)): _*)
    monotonic.unionByName(rescanned)
  }
}
