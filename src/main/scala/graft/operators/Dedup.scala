package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Document deduplication — exact and near-duplicate — over a corpus table
  * (SURVEY.md §2.11; no reference analog: the reference's only dedup-like
  * semantic is the last-value upsert at
  * /root/reference/OPC2MongoDB/Program.cs:1179-1182, which these operators
  * generalize from "tag equality" to "content equality / similarity").
  *
  * 100 TB posture: every pipeline here is a sequence of narrow projections
  * plus equi-shuffles (groupBy / equi-join on content-derived keys). There
  * is no pairwise O(n²) stage: candidate pairs come from hash-bucket
  * equi-joins (LSH bands / SimHash bands), so shuffle volume is
  * O(rows × signature width), and the verify stage only touches candidate
  * pairs. Skewed buckets (e.g. boilerplate shingles) are bounded because
  * band keys include the full row-group of minhash values, not a single
  * shingle.
  *
  * Hash primitive: md5 hex prefixes as longs (60-bit for SimHash, 40-bit
  * for the MinHash bases), computed with built-in (codegen'd) `md5`/`conv`
  * so the DuckDB oracle can replay them exactly:
  * `('0x' || substr(md5(x), 1, N))::BIGINT`.
  */
object Dedup {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** 60-bit md5-prefix hash of a string column (oracle-reproducible). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 40-bit md5-prefix hash of a string column (oracle-reproducible);
    * narrow enough that Kirsch-Mitzenmacher combinations stay clear of
    * long overflow under ANSI arithmetic.
    */
  def hash40(c: Column): Column =
    conv(substring(md5(c), 1, 10), 16, 10).cast("long")

  /** Whitespace tokens of a text column (empty-safe via trim). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Exact dedup: one surviving row per distinct text, the survivor being
    * the row with the smallest `idCol` (deterministic). Single hash
    * aggregation on a 128-bit content key — shuffle is O(distinct texts).
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("__content_key"))
      .agg(min_by(struct(df.columns.toIndexedSeq.map(col): _*), col(idCol)).as("__row"))
      .select(col("__row.*"))

  /** Word k-shingles per document, WITH duplicates: (idCol, shingle).
    * Documents shorter than k words produce no shingles (and thus never
    * pair). Narrow: scan + explode, no shuffle.
    */
  def rawShingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= k)
      .select(col(idCol), explode(expr(
        s"transform(sequence(0, size(__toks) - $k), i -> concat_ws(' ', slice(__toks, i + 1, $k)))"
      )).as("shingle"))

  /** Distinct word k-shingles per document: (idCol, shingle). */
  def shingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    rawShingles(df, idCol, textCol, k).distinct()

  /** Distinct character k-grams per document: (idCol, shingle). The
    * character-level analog of [[shingles]] — robust to tokenization
    * differences (whitespace, punctuation) that word shingles miss.
    * Narrow: scan + explode; documents shorter than k chars never pair.
    */
  def charShingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    // explode an int sequence and slice with the ternary (codegen'd)
    // substring, rather than transform(...) building a per-row string
    // array through an interpreted lambda — measured 2× faster on the
    // gram-build stage at sf0.1
    df.filter(length(col(textCol)) >= k)
      .select(col(idCol), col(textCol),
        explode(sequence(lit(1), length(col(textCol)) - (k - 1))).as("__i"))
      .select(col(idCol), expr(s"substring($textCol, __i, $k)").as("shingle"))
      .distinct()

  /** Character-n-gram Jaccard near-dup pairs with attribute blocking:
    * candidates are pairs agreeing on every `blockCols` value (an
    * equi-join, never a cross product — block columns must bound block
    * size, e.g. (lang, source)), scored by exact k-gram Jaccard. For
    * corpora where no natural blocking key exists, use
    * [[nearDupPairsMinHash]] (LSH provides the blocking) — this variant is
    * the cheaper choice when metadata already partitions the corpus.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      blockCols: Seq[String],
      threshold: Double): DataFrame = {
    // Unlike the flat-stream jaccardVerify path (right for LSH candidates
    // over an unblocked corpus), the blocked variant packs each document's
    // distinct HASHED grams into ONE long-array row: the gram table is
    // built exactly once (one explode + one collect_set shuffle), the
    // block self-join moves one narrow row per document, and intersections
    // are computed pair-locally with the native array_intersect over
    // longs. Measured at sf0.1: 2.3× faster than the flat
    // candidate × grams stream (which rebuilt the gram lineage per
    // consumer; persisting that lineage was slower still). Grams are
    // compared by 64-bit hash — a collision would perturb one
    // intersection count with probability ~|A|·|B|/2^64 per pair
    // (≈ 10⁻¹⁴ here), the standard trade of every hashed-shingle dedup.
    blockedPairs(df, idCol, textCol, k, blockCols)
      // size-ratio prune BEFORE the per-pair intersect: J(A,B) ≥ t implies
      // min(|A|,|B|) ≥ t·max(|A|,|B|), so these pairs cannot qualify
      .filter(least(col("__sz1"), col("__sz2")).cast("double") >=
        greatest(col("__sz1"), col("__sz2")).cast("double") * threshold)
      .withColumn("__i", graft.functions.GraftFunctions.sortedIntersectCount(
        col("__g1"), col("__g2")))
      .select(col("id1"), col("id2"),
        (col("__i").cast("double") /
          (col("__sz1") + col("__sz2") - col("__i")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Near-superset (containment) pairs with attribute blocking:
    * C = |A∩B| / min(|A|,|B|) — 1.0 when the smaller document's grams are
    * entirely contained in the larger's, the signal for "quote of",
    * "boilerplate-wrapped copy of", or "truncation of" relations that
    * symmetric Jaccard misses (a short doc inside a long one has low J but
    * C ≈ 1). No size-ratio prune applies — dissimilar sizes are exactly
    * the interesting case. Same packed-gram plan shape as
    * [[ngramJaccardPairs]]. Output: (id1, id2, containment) with
    * id1 < id2 and containment ≥ threshold.
    */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      blockCols: Seq[String],
      threshold: Double): DataFrame =
    blockedPairs(df, idCol, textCol, k, blockCols)
      .withColumn("__i", graft.functions.GraftFunctions.sortedIntersectCount(
        col("__g1"), col("__g2")))
      .select(col("id1"), col("id2"),
        (col("__i").cast("double") /
          least(col("__sz1"), col("__sz2")).cast("double")).as("containment"))
      .filter(col("containment") >= threshold)

  /** Shared packed-gram block self-join: one row per within-block candidate
    * pair carrying both documents' sorted hashed-gram arrays
    * (__g1/__g2) and sizes (__sz1/__sz2). One gram build, one collect_set
    * shuffle, one narrow-row block join.
    */
  private def blockedPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      blockCols: Seq[String]): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val grams = df.filter(length(col(textCol)) >= k)
      .select(col(idCol) +: blockCols.map(col) :+ col(textCol): _*)
      .select(col(idCol) +: blockCols.map(col) :+ col(textCol) :+
        // explode an int sequence + codegen'd ternary substring (a
        // transform(...) lambda building string arrays is interpreted)
        explode(sequence(lit(1), length(col(textCol)) - (k - 1))).as("__i"): _*)
      .select(col(idCol) +: blockCols.map(col) :+
        xxhash64(expr(s"substring($textCol, __i, $k)")).as("__gram"): _*)
    val packed = grams
      .groupBy(col(idCol) +: blockCols.map(col): _*)
      // sorted so the pair-local intersect is a codegen'd linear merge
      // (SortedLongIntersectCount) instead of a per-row hash set
      .agg(sort_array(collect_set(col("__gram"))).as("__g"))
      .withColumn("__sz", size(col("__g")))
    val a = packed.select(col(idCol).as("id1") +: blockCols.map(col) :+
      col("__g").as("__g1") :+ col("__sz").as("__sz1"): _*)
    val b = packed.select(col(idCol).as("id2") +: blockCols.map(col) :+
      col("__g").as("__g2") :+ col("__sz").as("__sz2"): _*)
    a.join(b, blockCols).filter(col("id1") < col("id2"))
  }

  /** MinHash signatures: (idCol, seed ∈ [0, numHashes), mh). The hash
    * family is the Kirsch-Mitzenmacher combination
    * h_seed(s) = (b1(s) + seed · b2(s)) mod 2^40 over two independent
    * 40-bit md5 base draws — two md5 evaluations per shingle regardless of
    * `numHashes` (a salted-md5-per-seed family costs numHashes md5s per
    * shingle; md5 dominates the signing stage). Still exactly
    * oracle-reproducible in SQL. Base hashes are computed once per shingle
    * row BEFORE the seed explode, so the per-seed work is two arithmetic
    * ops. 40-bit bases keep seed · b2 within long range under ANSI
    * arithmetic for any practical seed count.
    */
  def minhashSignatures(sh: DataFrame, idCol: String, numHashes: Int): DataFrame =
    sh.select(col(idCol),
        hash40(col("shingle")).as("__b1"),
        hash40(concat(lit("~"), col("shingle"))).as("__b2"))
      .select(col(idCol), col("__b1"), col("__b2"),
        explode(sequence(lit(0), lit(numHashes - 1))).as("seed"))
      .groupBy(col(idCol), col("seed"))
      .agg(min((col("__b1") + col("seed") * col("__b2")) % lit(1L << 40)).as("mh"))

  /** Per-document band keys (idCol, band, bkey): group seeds into bands
    * of `rowsPerBand`, key each band by the ordered minhash values — the
    * LSH bucketing unit shared by the self-join pair path and the
    * incremental probe path.
    */
  def bandKeys(sig: DataFrame, idCol: String, rowsPerBand: Int): DataFrame =
    sig
      .withColumn("band", floor(col("seed") / rowsPerBand))
      .groupBy(col(idCol), col("band"))
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(seed, mh))), x -> cast(x.mh as string)), ',')"
      ).as("bkey"))

  /** Candidate pairs = documents sharing any band key. Returns distinct
    * (id1, id2) with id1 < id2. The self-join is an equi-join on
    * (band, bkey) — shuffle-partitionable, no cross product.
    */
  def lshCandidates(sig: DataFrame, idCol: String, rowsPerBand: Int): DataFrame = {
    val banded = bandKeys(sig, idCol, rowsPerBand)
    val a = banded.select(col(idCol).as("id1"), col("band"), col("bkey"))
    val b = banded.select(col(idCol).as("id2"), col("band"), col("bkey"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2")
      .distinct()
  }

  /** LSH index for INCREMENTAL dedup: the existing corpus's band keys and
    * shingle sets, built ONCE ([[buildLshIndex]]) and at scale persisted
    * (parquet, bucketed by a hash of bkey so probe joins co-locate) —
    * each incoming batch then probes it by band-key equi-join instead of
    * re-pairing the whole corpus. The production ingest shape: per-batch
    * cost is O(batch × corpus-collision rate), never O(corpus²) or even
    * O(corpus) re-banding.
    */
  final case class LshIndex(
      bands: DataFrame,
      shingles: DataFrame,
      // the signature-family parameters are part of the index IDENTITY:
      // a probe built with different values would band-key-miss silently
      // and verify against mixed-k shingle sets, so the probe reads them
      // from here instead of taking its own copies
      shingleK: Int,
      numHashes: Int,
      rowsPerBand: Int)

  def buildLshIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numHashes: Int = 12,
      rowsPerBand: Int = 4): LshIndex = {
    val sh = shingles(df, idCol, textCol, shingleK)
    LshIndex(bandKeys(minhashSignatures(sh, idCol, numHashes), idCol, rowsPerBand),
      sh, shingleK, numHashes, rowsPerBand)
  }

  /** Per-ROW word-shingle array (distinct k-grams as strings) — the
    * stateless projection twin of [[shingles]] for STREAMING inputs,
    * where the batch path's explode+groupBy would become a stateful
    * streaming aggregation. Same shingle strings as the batch path.
    */
  def rowShingles(text: Column, k: Int): Column = {
    val words = split(trim(text), "\\s+")
    // sub-k docs need an EMPTY index sequence; sequence(1, 0) would
    // DESCEND ([1, 0]) and feed slice an illegal start — build ≥ [1]
    // then cut to the true count (0 cuts to empty, correctly typed)
    val count = greatest(size(words) - (k - 1), lit(0))
    val idx = slice(sequence(lit(1), greatest(count, lit(1))), lit(1), count)
    array_distinct(transform(idx, i => array_join(slice(words, i, lit(k)), " ")))
  }

  /** Per-ROW sorted distinct 40-bit shingle-hash set — pairs with
    * [[rowShingles]] for stateless Jaccard verification via the codegen
    * sorted-intersect expression (hash-level Jaccard: identical to
    * string-level except under 40-bit collisions, negligible and
    * documented).
    */
  def rowShingleHashSet(text: Column, k: Int): Column =
    array_sort(array_distinct(transform(rowShingles(text, k), s => hash40(s))))

  /** Per-ROW MinHash band keys as ARRAY<STRUCT<band INT, bkey STRING>> —
    * the stateless reformulation of shingles→[[minhashSignatures]]→
    * [[bandKeys]], producing byte-identical band-key strings (including
    * the TRAILING PARTIAL band when rowsPerBand does not divide
    * numHashes — the batch path's floor(seed/r) grouping emits it, so
    * dropping it here would silently lose the shortest, most collision-
    * prone band), so a STREAMING batch can probe a batch-built
    * [[LshIndex]] with a plain stream-static equi-join (no watermark,
    * no state). Documents shorter than k words yield an empty array
    * (they never pair — the batch semantics).
    */
  def rowBandKeys(
      text: Column, shingleK: Int, numHashes: Int, rowsPerBand: Int): Column = {
    val sh = rowShingles(text, shingleK)
    rowBandKeysFromArrays(sh, transform(sh, s => hash40(s)),
      numHashes, rowsPerBand)
  }

  /** [[rowBandKeys]] from PRECOMPUTED shingle + base-hash arrays — hot
    * paths (the streaming probe) materialize `sh`/`b1` once per row in a
    * prior projection and share them between the band build and the
    * verify-set build (interpreted higher-order functions get no
    * codegen subexpression elimination, so sharing must be structural).
    */
  def rowBandKeysFromArrays(
      sh: Column, b1: Column, numHashes: Int, rowsPerBand: Int): Column = {
    val b2 = transform(sh, s => hash40(concat(lit("~"), s)))
    val mhs = (0 until numHashes).map { seed =>
      array_min(zip_with(b1, b2, (x, y) => (x + lit(seed.toLong) * y) % lit(1L << 40)))
    }
    val nBands = (numHashes + rowsPerBand - 1) / rowsPerBand
    val bands = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",",
          mhs.slice(b * rowsPerBand, math.min((b + 1) * rowsPerBand, numHashes))
            .map(_.cast("string")): _*).as("bkey"))
    }
    // empty-shingle docs get an empty band array OF THE RIGHT TYPE (a
    // when/otherwise(array()) would be array<null>); their mh values are
    // nulls and must never form joinable band keys
    slice(array(bands: _*), lit(1), when(size(sh) > 0, lit(nBands)).otherwise(lit(0)))
  }

  /** Incremental near-duplicate detection of `incoming` against an
    * existing corpus's [[LshIndex]] (ids must be disjoint from the
    * corpus): returns (new_id, matched_id, jaccard ≥ threshold) where
    * matched_id is a corpus document OR an earlier (smaller-id) document
    * of the same batch — so a batch containing its own duplicates
    * self-deduplicates in the same pass. The corpus side is only ever
    * PROBED (band-key equi-join); it never self-joins, and its shingles
    * are touched only for the candidates' exact-Jaccard verify.
    */
  def incrementalNearDups(
      index: LshIndex,
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5): DataFrame = {
    val shNew = shingles(incoming, idCol, textCol, index.shingleK)
    val bNew = bandKeys(minhashSignatures(shNew, idCol, index.numHashes),
      idCol, index.rowsPerBand)
    val cross = bNew.select(col(idCol).as("new_id"), col("band"), col("bkey"))
      .join(index.bands.select(col(idCol).as("matched_id"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .select("new_id", "matched_id")
    val within = bNew.select(col(idCol).as("id1"), col("band"), col("bkey"))
      .join(bNew.select(col(idCol).as("id2"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .filter(col("id1") < col("id2"))
      .select(col("id2").as("new_id"), col("id1").as("matched_id"))
    val cand = cross.unionByName(within).distinct()
    jaccardVerify(
        cand.select(col("new_id").as("id1"), col("matched_id").as("id2")),
        index.shingles.unionByName(shNew), idCol)
      .filter(col("jaccard") >= threshold)
      .select(col("id1").as("new_id"), col("id2").as("matched_id"), col("jaccard"))
  }

  /** Exact shingle-set Jaccard for the given candidate pairs:
    * (id1, id2, jaccard). Only candidate pairs are scored — two equi-joins
    * against the shingle table plus one count aggregation.
    */
  /** EXACT set-similarity self-join via prefix filtering — the
    * AllPairs/PPJoin family (Bayardo et al. WWW'07; Xiao et al. WWW'08):
    * every pair with Jaccard ≥ tNum/tDen is returned, with NO recall
    * loss — the lossless alternative to MinHash-LSH when the threshold
    * is a hard contract rather than a screening heuristic.
    *
    * Mechanics: order each document's distinct `shingleK`-word shingles
    * by GLOBAL ascending document frequency (rarest first, ties by
    * value); a document of n shingles exposes only its first
    * n − ⌈t·n⌉ + 1 shingles as join keys. Two documents with J ≥ t must
    * share at least one exposed shingle (the canonical prefix-filter
    * pigeonhole), so the candidate set comes from an EQUI-join on rare
    * tokens — never all-pairs — and candidates are verified exactly.
    *
    * The threshold is RATIONAL (tNum/tDen) and every comparison is
    * integer ((tDen+tNum)·|∩| ≥ tNum·(n1+n2) ⇔ J ≥ t), so results are
    * bit-identical across engines — no float boundary.
    *
    * Scale shape: df-count aggregate + one shuffle on shingle to attach
    * dfs, per-doc sort/pack (map-side after the key exchange), prefix
    * explode → equi-join with the size filter (J ≥ t forces
    * t·n1 ≤ n2 ≤ n1/t) riding the join, then verification on the PACKED
    * per-doc arrays — a codegen'd array_intersect per candidate pair,
    * NOT a re-explode of the shingle table (the explode verify shuffles
    * |cand|·avg(n) rows; this shuffles |cand|, and the per-doc side is
    * small enough that AQE broadcasts it). Skew caveat: a token frequent
    * enough to sit in many prefixes fans out — exactly why prefixes take
    * the RAREST tokens; on Zipfian corpora the exposed keys are the
    * distribution's tail. Output: (id1, id2, inter, n1, n2), id1 < id2.
    */
  def prefixJaccardJoin(
      df: DataFrame,
      idCol: String,
      textCol: String,
      tNum: Int,
      tDen: Int,
      shingleK: Int = 3): DataFrame = {
    require(tNum > 0 && tDen >= tNum, s"threshold must be in (0,1], got $tNum/$tDen")
    val sh = shingles(df, idCol, textCol, shingleK)
    // attach each shingle's global df with a shingle-partitioned window
    // count: ONE pass over the (narrow) shingle stream — a groupBy+join
    // formulation recomputes the scan+explode+distinct lineage twice and
    // adds a join exchange (measured ~1.5 s slower at sf0.1)
    val packed = sh
      .withColumn("__df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("shingle"))))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("__df"), col("shingle")))).as("__ts"))
      .select(col(idCol), expr("transform(__ts, x -> x.shingle)").as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .withColumn("__plen",
        expr(s"cast(__n - ((__n * $tNum + ${tDen - 1}) div $tDen) + 1 as int)"))
    val pre = packed.select(col(idCol), col("__n"),
      posexplode(slice(col("__toks"), lit(1), col("__plen"))))
      .withColumnRenamed("pos", "__pos").withColumnRenamed("col", "__p")
    // two lossless prunes ride the candidate join:
    //   - SIZE filter: J ≥ t forces t·n1 ≤ n2 ≤ n1/t;
    //   - POSITIONAL upper bound (the PPJoin refinement): a shared
    //     prefix token at sorted positions (p1, p2) caps the overlap at
    //     1 + min(n1−p1−1, n2−p2−1), and J ≥ t needs overlap
    //     ≥ t/(1+t)·(n1+n2) — a qualifying pair's EARLIEST shared token
    //     always satisfies the bound, so filtering per matching row
    //     before the distinct never loses a pair. Integer form:
    //     (tNum+tDen)·bound ≥ tNum·(n1+n2).
    val cand = pre.select(col(idCol).as("id1"), col("__n").as("__na"),
        col("__pos").as("__pa"), col("__p"))
      .join(pre.select(col(idCol).as("id2"), col("__n").as("__nb"),
        col("__pos").as("__pb"), col("__p")), Seq("__p"))
      .filter(col("id1") < col("id2") &&
        lit(tNum.toLong) * col("__na") <= lit(tDen.toLong) * col("__nb") &&
        lit(tNum.toLong) * col("__nb") <= lit(tDen.toLong) * col("__na") &&
        lit(tNum.toLong + tDen) * (lit(1L) +
          least(col("__na") - 1 - col("__pa"), col("__nb") - 1 - col("__pb"))) >=
          lit(tNum.toLong) * (col("__na") + col("__nb")))
      .select("id1", "id2").distinct()
    // verify on the PACKED arrays (codegen'd array_intersect per
    // candidate), not by re-exploding the shingle table — the explode
    // verify shuffles |cand|·avg(n) rows where this shuffles |cand|;
    // the packed side is per-doc (tiny next to the pair stream) and
    // AQE broadcasts it when it fits
    val sets = packed.select(col(idCol), col("__toks"), col("__n"))
    cand
      .join(sets.select(col(idCol).as("id1"), col("__toks").as("__ta"),
        col("__n").cast("long").as("n1")), "id1")
      .join(sets.select(col(idCol).as("id2"), col("__toks").as("__tb"),
        col("__n").cast("long").as("n2")), "id2")
      .select(col("id1"), col("id2"),
        size(array_intersect(col("__ta"), col("__tb"))).cast("long").as("inter"),
        col("n1"), col("n2"))
      .filter(lit(tDen.toLong + tNum) * col("inter") >=
        lit(tNum.toLong) * (col("n1") + col("n2")))
  }

  def jaccardVerify(pairs: DataFrame, sh: DataFrame, idCol: String): DataFrame = {
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(sh.as("s1"), pairs("id1") === col(s"s1.$idCol"))
      .join(sh.as("s2"),
        col(s"s2.$idCol") === pairs("id2") && col("s1.shingle") === col("s2.shingle"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("z1"), col("id1") === col(s"z1.$idCol"))
      .join(sizes.as("z2"), col("id2") === col(s"z2.$idCol"))
      .select(col("id1"), col("id2"),
        (col("inter").cast("double") /
          (col("z1.sz") + col("z2.sz") - col("inter")).cast("double")).as("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: shingle → sign → band → candidate
    * equi-join → exact-Jaccard verify → threshold. Output:
    * (id1, id2, jaccard) with id1 < id2 and jaccard ≥ threshold.
    *
    * Design notes, measured (sf0.1, local[32], warm):
    *   - the shingle lineage is recomputed per consumer rather than
    *     persisted: MEMORY_AND_DISK caching of the exploded table measured
    *     2× slower than recompute (narrow scan+explode is cheap, the cache
    *     write/read of a post-shuffle table is not);
    *   - a per-row array formulation (array_distinct + nested transform +
    *     array_min, zero content shuffles) measured 4× slower — higher-
    *     order lambdas are interpreted per element, while explode +
    *     hash-agg is codegen'd. Flat streams + aggregations are the
    *     Spark-native fast path even when they cost an extra exchange.
    */
  def nearDupPairsMinHash(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numHashes: Int = 12,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val sh = shingles(df, idCol, textCol, shingleK)
    val sig = minhashSignatures(sh, idCol, numHashes)
    val cand = lshCandidates(sig, idCol, rowsPerBand)
    jaccardVerify(cand, sh, idCol).filter(col("jaccard") >= threshold)
  }

  /** Duplicate-cluster assignment: connected components over a
    * near-duplicate pair graph — the step after any pair-producing dedup
    * pipeline that turns pairs into "keep one survivor per cluster"
    * (cluster id = smallest member id, so the survivor choice is
    * deterministic). Output: (id, cluster) for every id appearing in a
    * pair; singletons never pair, so they are implicitly their own
    * cluster.
    *
    * Algorithm: iterative min-label propagation with pointer jumping —
    * each round (a) hooks every node to the min label in its
    * neighborhood, then (b) replaces each label by its label's label
    * (path halving). Rounds are plain equi-joins + aggregations, and the
    * jump step gives O(log diameter) convergence, so a 1000-link chain
    * resolves in ~10 rounds — the same round structure as the
    * large-star/small-star MapReduce connected-components decomposition.
    * Labels decrease monotonically; the loop stops when a round changes
    * nothing, detected via the strictly-decreasing label sum OBSERVED
    * (Dataset.observe) during each round's checkpoint materialization —
    * the convergence check costs zero extra Spark actions.
    */
  def dupClusters(pairs: DataFrame, maxIters: Int = 25): DataFrame =
    // size-derived loop parallelism (r19): the label tables are bounded
    // by the pair set, so the pair plan's size estimate gates the whole
    // loop — see [[Checkpoints.sizedLoop]] for the measured A/B
    Checkpoints.sizedLoop(pairs) { dupClustersLoop(pairs, maxIters) }

  private def dupClustersLoop(pairs: DataFrame, maxIters: Int): DataFrame = {
    val c1 = pairs.columns(0); val c2 = pairs.columns(1)
    val e0 = pairs.select(col(c1).cast("long").as("src"), col(c2).cast("long").as("dst"))
    // undirected + a self-loop per node: the self-loop folds the "keep my
    // own label" term into the neighborhood-min aggregation, so each round
    // hooks with ONE join + ONE agg instead of join + agg + left-join.
    // One fewer stage per round; at sf0.1 wall-clock is round-latency-
    // dominated either way (~1 s/round fixed cost at local[32]) — the win
    // is real where stages carry real data volume.
    val sym = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
    val edges = sym
      .unionByName(sym.select(col("src"), col("src").as("dst")).distinct())
      .distinct().persist()
    // each round's label table is checkpointed via [[Checkpoints]]: the
    // jump step self-joins the round's result, so without lineage
    // truncation the logical plan DOUBLES per round (exponential plan,
    // OOM in the analyzer long before any data moves). Default mode is
    // localCheckpoint (local[32]); setting the `graft.checkpoint.dir`
    // session conf switches every round to RELIABLE `checkpoint()` —
    // executor loss mid-iteration then recovers from storage instead of
    // killing the job (the contract a week-long 100 TB run needs).
    //
    // Init fuses round 1: against identity labels the neighborhood min is
    // just min(self, neighbors) — one aggregation over edges, no join.
    // convergence signature (labels decrease monotonically, so the label
    // sum strictly decreases until the fixed point) is OBSERVED during
    // the eager checkpoint materialization (local mode: Dataset.observe,
    // one Spark action per round total, not two — r7's separate
    // `labelSum` aggregation was a second full action per round and the
    // prime suspect in the q58 bench anomaly).
    def checkpointWithSum(df: DataFrame): (DataFrame, Long) =
      Checkpoints.truncateWithSum(df, "cluster")
    var (labels, curSum) = checkpointWithSum(
      edges.groupBy("src")
        .agg(least(col("src"), min(col("dst"))).as("cluster"))
        .withColumnRenamed("src", "id"))
    var prevSum = Long.MinValue
    var it = 0
    // one jump step: compose the mapping with itself (cluster :=
    // cluster(cluster)); cluster values are node ids, so they resolve
    // against the same table
    def jump(m: DataFrame): DataFrame = m.as("a")
      .join(m.select(col("id").as("cid"), col("cluster").as("cc")).as("b"),
        col("a.cluster") === col("cid"), "left")
      .select(col("a.id").as("id"),
        least(col("a.cluster"), coalesce(col("cc"), col("a.cluster"))).as("cluster"))
    while (curSum != prevSum && it < maxIters) {
      val roundStart = System.nanoTime()
      prevSum = curSum
      // self-loops make this min(self, neighbors) in one aggregation.
      // Checkpointed BEFORE jumping: a jump self-joins its input, so an
      // un-materialized hook plan would be re-evaluated per side (the
      // round-2 "double jump was slower" measurement hit exactly that);
      // over a materialized table the composed jumps are joins of tiny
      // checkpointed RDDs.
      val hooked = Checkpoints.truncate(
        edges.join(labels.withColumnRenamed("id", "dst"), "dst")
          .groupBy("src").agg(min("cluster").as("cluster"))
          .withColumnRenamed("src", "id"))
      // two composed jumps: f → f² → f⁴: pointers skip 4× per round
      // instead of 2×, so rounds ≈ log4(diameter) — fewer round-latency-
      // bound materializations, which is what dominates wall-clock
      // locally AND the critical path on a cluster. Measured (sf0.1,
      // q58): single jump 7.2 s, double 6.5 s, triple 7.8 s — each
      // composition doubles the lazy plan over the materialized hook
      // table, and past f⁴ the extra join evaluations cost more than
      // the rounds they save.
      val (jumped, jumpedSum) = checkpointWithSum(jump(jump(hooked)))
      curSum = jumpedSum
      // jumped is materialized (localCheckpoint is eager), so the round's
      // hook table and the superseded previous labels can be freed — the
      // PageRank lesson: without this, each round's checkpoint RDD stays
      // pinned in executor storage for the life of the session, taxing
      // every later query in the same JVM. Only the returned table stays.
      Checkpoints.free(hooked)
      Checkpoints.free(labels)
      labels = jumped
      it += 1
      // per-round wall time at INFO: the r7 driver bench showed a 2.5×
      // q58 swing between identical-code runs — this line makes any
      // future swing attributable to a specific round (data) vs uniform
      // inflation (machine load)
      log.info(f"dupClusters round $it%d: labelSum=$curSum%d wall=${(System.nanoTime() - roundStart) / 1e9}%.2fs")
    }
    edges.unpersist(blocking = false)
    labels
  }

  /** End-to-end near-duplicate REMOVAL: given the corpus and a pair graph
    * of confirmed duplicates (any pair-producing pipeline — [[nearDupPairsMinHash]],
    * [[simhashPairs]], [[ngramJaccardPairs]]), keep exactly one
    * representative per duplicate cluster plus every unpaired document.
    * The representative is the cluster's smallest id — [[dupClusters]]
    * labels every member with the min member id, so "survivor" is simply
    * `id == cluster`, deterministic across runs/partitionings.
    *
    * 100 TB posture: the pair graph is orders of magnitude smaller than
    * the corpus (only near-dups pair), clustering runs on pairs alone
    * (log-round pointer jumping), and the final membership test is one
    * left-anti hash join of the corpus against the (small) non-survivor
    * id set — the corpus itself is never shuffled by anything wider than
    * that join key.
    */
  def keepRepresentatives(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val dropped = dupClusters(pairs)
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as("__drop_id"))
    df.join(dropped, col(idCol) === col("__drop_id"), "left_anti")
  }

  /** SOFT dedup — "keep each copy with probability ~1/n", the curation
    * rule for corpora where hard removal ([[keepRepresentatives]]) would
    * bias against popular content. Per cluster of n near-duplicates:
    * every NON-min member survives iff hash60(id) mod 10⁴ < 10⁴ div n
    * (integer basis points on the md5-prefix hash, the cross-engine-exact
    * cutoff recipe); the cluster-min representative survives ONLY when no
    * other member drew survival — the fallback that guarantees at least
    * one copy of the content always remains (including n > 10⁴, where the
    * rate floors to zero). Expected survivors per cluster:
    * (n−1)·⌊10⁴/n⌋/10⁴ + Π(others fail) — exactly 1 for n = 2, rising to
    * ≈ 1 + 1/e ≈ 1.37 as n → ∞. (An earlier draft kept the min
    * UNCONDITIONALLY, which over-kept ≈ 2−1/n copies — duplicated content
    * stayed ~2× over-represented vs the frequency-equalizing goal.)
    * Output: the surviving rows plus their `cluster_size`, which doubles
    * as a training weight column for pipelines that re-weight instead of
    * drop.
    *
    * Scale shape: cluster sizes AND the per-cluster any-other-survivor
    * flag come from the pair graph alone ([[dupClusters]] + two keyed
    * aggregations per cluster — all ≪ corpus); the corpus itself is
    * touched by ONE left join on the id key and a codegen'd hash filter.
    */
  def softDedup(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val clusters = dupClusters(pairs)
    val sized = clusters.join(
        clusters.groupBy("cluster").agg(count(lit(1)).as("__n")), "cluster")
      .withColumn("__pass",
        hash60(col("id").cast("string")) % 10000 < expr("10000 div __n"))
    // does ANY non-min member survive its draw? decided on the (small)
    // cluster table, never on the corpus
    val anyOther = sized.groupBy("cluster").agg(
      max(when(col("id") =!= col("cluster") && col("__pass"), 1).otherwise(0))
        .as("__other"))
    val full = sized.join(anyOther, "cluster")
      .select(col("id").as("__sd_id"), col("cluster").as("__sd_min"),
        col("__n"), col("__pass"), col("__other"))
    df.join(full, col(idCol) === col("__sd_id"), "left")
      .withColumn("cluster_size", coalesce(col("__n"), lit(1L)))
      // paired rows: non-min survives by its own draw; the min survives
      // only as the fallback (no other member survived). Singletons never
      // pair (left-join null) and always survive — the coalesce arm.
      .filter(coalesce(
        when(col(idCol) === col("__sd_min"), col("__other") === 0)
          .otherwise(col("__pass")),
        lit(true)))
      .drop("__sd_id", "__sd_min", "__n", "__pass", "__other")
  }

  /** All deletion variants of `strCol` with up to `maxDist` characters
    * removed (including the unmodified string), as 64-bit hashes:
    * (blockCols..., idCol, __vh), deduplicated per row. The SymSpell /
    * deletion-neighborhood candidate generator: if levenshtein(a, b) ≤ k,
    * the characters matched by an optimal alignment form a common
    * subsequence reachable from BOTH strings by at most k deletions, so a
    * and b share at least one variant — candidate recall is EXACT for edit
    * distance ≤ maxDist, no tuning. Variant count per row is
    * O(len^maxDist) (len ≈ 18 ⇒ ≤ 172 for maxDist = 2), so this is the
    * right tool for SHORT key strings (names, titles, codes), not document
    * bodies. Built codegen-style: explode int sequences + substr/concat,
    * no interpreted lambdas (q76 lesson).
    */
  private def deletionVariants(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int,
      blockCols: Seq[String]): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2, s"maxDist must be 1 or 2, got $maxDist")
    val s = col(strCol)
    def proj(variant: Column) =
      blockCols.map(col) :+ col(idCol) :+ xxhash64(variant).as("__vh")
    val base = df.select(proj(s): _*)
    // single deletion at position __i (empty strings guarded: sequence()
    // with start > stop would step BACKWARDS, not return empty)
    val d1 = df.filter(length(s) >= 1)
      .select(blockCols.map(col) :+ col(idCol) :+ s.as("__s") :+
        explode(sequence(lit(1), length(s))).as("__i"): _*)
      .select(proj(concat(
        col("__s").substr(lit(1), col("__i") - 1),
        col("__s").substr(col("__i") + 1, length(col("__s"))))): _*)
    val d2 = if (maxDist < 2) Nil else Seq(
      df.filter(length(s) >= 2)
        .select(blockCols.map(col) :+ col(idCol) :+ s.as("__s") :+
          explode(sequence(lit(1), length(s) - 1)).as("__i"): _*)
        .select(blockCols.map(col) :+ col(idCol) :+ col("__s") :+ col("__i") :+
          explode(sequence(col("__i") + 1, length(col("__s")))).as("__j"): _*)
        .select(proj(concat(
          col("__s").substr(lit(1), col("__i") - 1),
          col("__s").substr(col("__i") + 1, col("__j") - col("__i") - 1),
          col("__s").substr(col("__j") + 1, length(col("__s"))))): _*))
    // the per-row variant dedupe is LOAD-BEARING: without it, duplicate
    // variants (deleting either of two equal adjacent chars, common in
    // zero-padded keys) multiply the self-join's output quadratically per
    // pair — measured at sf0.1 (q86): 4.8 s with the distinct, 7.6 s
    // without. The extra shuffle is cheaper than the join blow-up.
    (Seq(base, d1) ++ d2).reduce(_ unionByName _).distinct()
  }

  /** Edit-distance pairs via deletion-neighborhood candidate generation:
    * (blockCols..., id1, id2, dist) for every within-block pair with
    * levenshtein ≤ maxDist, id1 < id2 — the EXACT result of the quadratic
    * within-block scan, at candidate cost ∝ rows · len^maxDist instead of
    * pairs ∝ block². The fixed-block quadratic formulation dies at scale
    * (a 25-block key means 100× data ⇒ 10 000× pairs); here candidates
    * grow linearly with the corpus because they come from an equi-join on
    * variant hashes. Verification is the thresholded `levenshtein(_,_,k)`
    * banded scan, run only on deduplicated candidates — it also absorbs
    * the ~2⁻⁶⁴ variant-hash-collision false positives. This is also the
    * candidate generator that does NOT degenerate on shared-template
    * strings (all "Customer#…" names share their first piece, which kills
    * piece-partition filters like PassJoin; a shared PREFIX is harmless
    * here because candidates need a shared full-length-minus-k
    * subsequence).
    */
  def editDistancePairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int,
      blockCols: Seq[String] = Nil): DataFrame = {
    val v = deletionVariants(df, idCol, strCol, maxDist, blockCols)
    val keys = blockCols :+ "__vh"
    val a = v.select(keys.map(col) :+ col(idCol).as("id1"): _*)
    val b = v.select(keys.map(col) :+ col(idCol).as("id2"): _*)
    val cand = a.join(b, keys)
      .filter(col("id1") < col("id2"))
      .select(blockCols.map(col) :+ col("id1") :+ col("id2"): _*)
      // a close pair shares MANY variants (a distance-1 pair shares
      // O(len)): dedupe before running the verify scan
      .distinct()
    val s1 = df.select(col(idCol).as("id1"), col(strCol).as("__s1"))
    val s2 = df.select(col(idCol).as("id2"), col(strCol).as("__s2"))
    cand.join(s1, "id1").join(s2, "id2")
      .select(blockCols.map(col) :+ col("id1") :+ col("id2") :+
        levenshtein(col("__s1"), col("__s2"), maxDist).as("dist"): _*)
      .filter(col("dist") >= 0)
  }

  /** Similarity-scored within-block id pairs with the scorer run ONCE
    * PER DISTINCT VALUE PAIR — the value-skew linkage plan (VERDICT r14
    * wrong #1). A quadratic within-block scan re-scores every id pair:
    * at 100× data each block grows 100× and the scorer (for
    * Jaro-Winkler, O(|s|²) per pair) runs 10 000× more — the
    * scale-killer. But string-similarity scores are functions of the
    * VALUES alone, so on a vocabulary-bound column (names, brands,
    * statuses, codes) the right plan is: dedup to the distinct-value
    * dictionary, score each unordered value pair once, keep the
    * qualifying entries, then expand back to id pairs through
    * broadcast equi-joins. Scoring cost is O(V²·|s|²) for V distinct
    * values — FLAT as the corpus grows — and the expansion emits only
    * qualifying pairs (the output itself, unavoidable). EXACT: every
    * within-block id pair (id1 < id2) with score ≥ threshold appears
    * exactly once with the same score as the quadratic scan
    * (DedupSpec pins parity).
    *
    * The dictionary self-join is a broadcast nested loop over V rows —
    * sane only while V is dictionary-sized, so the operator counts V
    * first (one metadata-scale aggregate) and REFUSES past
    * `maxDistinct` rather than melting down: a high-cardinality column
    * needs a candidate generator instead — [[editDistancePairs]]'
    * deletion neighborhoods for edit-distance predicates, or
    * [[linkageBlocked]]'s prefix/length blocking for prefix-weighted
    * scorers like Jaro-Winkler (a lossy trade THAT operator makes with
    * a documented recall contract; this exact one refuses to make it
    * silently).
    *
    * @param score  scorer over two string columns (e.g.
    *               [[graft.functions.GraftFunctions.jaroWinkler]]);
    *               must be symmetric — each unordered value pair is
    *               scored in one canonical order only
    * @return blockCols ++ (id1, id2, score), id1 < id2 within block
    */
  def linkageByValue(
      df: DataFrame,
      idCol: String,
      strCol: String,
      blockCols: Seq[String],
      score: (Column, Column) => Column,
      threshold: Double,
      maxDistinct: Int = 4096): DataFrame = {
    // distinct-value dictionary, lineage-truncated: it is consumed three
    // times (both dictionary sides + the equal-value arm) and each lazy
    // reuse would re-run the corpus distinct (the q188 lesson)
    val vals = Checkpoints.truncate(
      df.select(col(strCol).as("__v")).filter(col("__v").isNotNull).distinct())
    val nv = vals.count()
    require(nv <= maxDistinct,
      s"linkageByValue: $nv distinct values exceed maxDistinct=$maxDistinct " +
        s"— the value-pair dictionary would hold ~${nv * nv / 2} scored " +
        "pairs; this column is not vocabulary-bound, so use " +
        "Dedup.linkageBlocked (prefix/length blocked candidates, recall " +
        "contract in its scaladoc) or Dedup.editDistancePairs (deletion " +
        "neighborhoods, exact for edit-distance predicates) instead of " +
        "value-deduped exhaustive scoring")
    // unordered value pairs scored once (strict < keeps one canonical
    // order). Both dictionaries are materialized UNFILTERED and the
    // threshold applied on the materialized __score column AFTER the
    // lineage cut — the placement is LOAD-BEARING for the scale
    // contract: a threshold filter written over the live `score(...)`
    // alias gets collapse-substituted back into the scorer expression,
    // becomes a plan CONSTRAINT, survives the checkpoint (LogicalRDD
    // keeps originConstraints), and InferFiltersFromConstraints then
    // manufactures `score(corpusCol, corpusCol) >= t` on the corpus
    // scans through the value equi-join (measured: `jaro_winkler(
    // p_name, p_name) >= 0.8` landed as a per-row post-scan filter) —
    // quietly re-attaching the O(rows·|s|²) work this design removes.
    // Filtering a LEAF ATTRIBUTE leaves nothing to substitute or infer.
    val dict = Checkpoints.truncate(
      vals.select(col("__v").as("__v1"))
        .join(vals.select(col("__v").as("__v2")), col("__v1") < col("__v2"))
        .withColumn("__score", score(col("__v1"), col("__v2"))))
      .filter(col("__score") >= threshold)
    // equal-value arm scored separately — generic scorers need not
    // self-score 1.0, so it is evaluated, not assumed
    val eqDict = Checkpoints.truncate(
      vals.select(col("__v"), score(col("__v"), col("__v")).as("__score")))
      .filter(col("__score") >= threshold)
    val aSide = df.select(
      blockCols.map(col) :+ col(idCol).as("__ida") :+ col(strCol).as("__va"): _*)
    val bBase = df.select(
      blockCols.map(col) :+ col(idCol).as("__idb") :+ col(strCol).as("__vb"): _*)
    val bSide = blockCols.foldLeft(bBase)(
      (d, c) => d.withColumnRenamed(c, s"__b_$c"))
    def blockEq = blockCols.map(c => col(c) === col(s"__b_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    // unequal values: rows with the smaller value enter as the a-side,
    // so each unordered id pair materializes exactly once; id order is
    // then normalized (value order and id order are independent)
    val unequal = aSide
      .join(broadcast(dict), col("__va") === col("__v1"))
      .join(bSide, col("__vb") === col("__v2") && blockEq)
      .select(blockCols.map(col) ++ Seq(
        least(col("__ida"), col("__idb")).as("id1"),
        greatest(col("__ida"), col("__idb")).as("id2"),
        col("__score").as("score")): _*)
    val equal = aSide
      .join(broadcast(eqDict), col("__va") === col("__v"))
      .join(bSide, col("__vb") === col("__v") && blockEq)
      .filter(col("__ida") < col("__idb"))
      .select(blockCols.map(col) ++ Seq(
        col("__ida").as("id1"), col("__idb").as("id2"),
        col("__score").as("score")): _*)
    unequal.unionByName(equal)
  }

  /** Sub-quadratic CANDIDATE GENERATION for prefix-weighted string
    * scorers (Jaro-Winkler) over an UNBOUNDED-cardinality value
    * dictionary — the upstream path [[linkageByValue]]'s 4096-distinct
    * refusal names (VERDICT r15 task #1). Input: one-column DataFrame of
    * distinct non-null values `__v`; output: distinct unordered value
    * pairs (`__v1` < `__v2`) that share a blocking key.
    *
    * Blocking rule (EXACT, deterministic, SQL-replayable — the rule IS
    * the operator's contract, so an oracle replays it verbatim):
    * a pair is a candidate iff |len(v1) − len(v2)| ≤ `maxLenDiff` AND
    * (v1, v2 agree on characters 1..k, OR agree on characters 2..k+1).
    * The second pass covers any single edit at position 1 (substitution,
    * or the insert/delete that shifts the head), so a typo in the very
    * first character — the classic failure of naive prefix blocking —
    * still pairs.
    *
    * WHY LOSSY BLOCKING, STATED HONESTLY: no sub-quadratic LOSSLESS
    * filter exists for Jaro-Winkler at practical thresholds. The tight
    * upper bound jw ≤ 0.4 + 0.6·jaro and jaro ≤ (2 + min/max)/3 give
    * jw ≤ 0.8 + 0.2·(min_len/max_len) — at τ = 0.8 EVERY length ratio
    * survives, and the matching-character window (⌊max/2⌋ − 1) is so
    * wide that character-multiset count filters admit nearly all pairs.
    * Jaro-Winkler's own prefix weighting is the one exploitable
    * structure: pairs scoring high either share a long prefix (boosted)
    * or have near-identical bodies (which overwhelmingly share the
    * shifted prefix the second pass catches). Pairs differing in 2+ of
    * their first k+1 characters are missed BY CONTRACT — k is the
    * recall knob (k = 4 aligns the block with JW's boost window).
    *
    * Scale shape: candidates come from equi-joins on
    * (pass, prefix, length-bucket) — never an all-pairs scan. The
    * probe side fans out 3× (neighbor length buckets) × 2 passes over
    * the DICTIONARY (not the corpus). Candidate volume is
    * Σ_buckets C(bucket_size, 2): sub-quadratic whenever prefix entropy
    * grows with the dictionary (names, titles, addresses do; a column
    * whose values all share one prefix degrades to the quadratic scan —
    * and that column belongs in [[linkageByValue]] if vocabulary-bound).
    *
    * SIZE k WITH THE VOCABULARY: k-char prefixes offer at most σ^k
    * blocking keys, so once n ≫ σ^k the per-bucket population — and
    * with it candidate volume ~ n²/σ^k — grows linearly in n (the
    * blocked join still completes: all joins downstream are
    * merge-hinted and spill; it just pays the saturated volume).
    * MEASURED at an 11.1M-value dictionary (sf1 scale-step, r16):
    * k=4 → 522M candidates, k=5 → 85M, k=6 → 28M — each added prefix
    * character divides the volume by its per-position entropy, vs
    * all-pairs C(11.1M, 2) ≈ 6.2·10¹³. Rule of thumb:
    * k ≈ log_σ(n / target_bucket_size), at the recall contract's
    * documented cost (agreement on chars 1..k or 2..k+1).
    */
  /** Pure decision rule for [[linkageBlocked]]'s AUTO-sized prefix
    * length (VERDICT r16 task #3): smallest k in [kMin, kMax] whose
    * measured distinct-prefix count keeps the EXPECTED bucket
    * population at or under `targetBucket` (distinct prefixes ≥
    * n / targetBucket), else kMax. Uses MEASURED prefix counts, not
    * log_σ(n/target) with an assumed alphabet: the r16 scale-step
    * showed effective per-position entropy on realistic name columns
    * is ~3–6, nowhere near |alphabet| (k=4→522M candidates, k=5→85M,
    * k=6→28M at 11.1M values), so an assumed σ=26 would under-size k
    * exactly where saturation bites. Pure so the sizing policy is
    * unit-pinned against the sf1-measured counts without an sf1 run.
    */
  def choosePrefixK(
      nDistinct: Long,
      distinctPrefixAt: Int => Long,
      targetBucket: Long = 32,
      kMin: Int = 4,
      kMax: Int = 8): Int = {
    require(kMin >= 1 && kMax >= kMin, s"bad k range [$kMin, $kMax]")
    require(targetBucket >= 1, s"targetBucket must be >= 1, got $targetBucket")
    val needed = math.max(1L, nDistinct / targetBucket)
    (kMin to kMax).find(c => distinctPrefixAt(c) >= needed).getOrElse(kMax)
  }

  /** SIZE-AWARE join hint for the vocabulary-scale joins here: hash the
    * `buildRows`-row side only while its per-task table stays under a
    * conservative budget, else fall back to the spilling sort-merge
    * join. Calibrated on the two measured points of this operator
    * (r18): a ~26 MB/task build ran comfortably inside the 8 GB bench
    * JVM while a ~66 MB/task build died with "not enough memory to
    * build hash map" on the sf1 dictionary — shuffled-hash builds do
    * NOT spill, so the dial must err toward merge. 32 MB keeps the
    * measured sf0.1 win and retreats to SMJ beyond it; per-task size
    * scales down as shuffle partitions scale up, so bigger clusters
    * keep the hash path longer. NEVER "broadcast": both sides grow
    * with the corpus (the r16 AQE broadcast death).
    */
  private def sizedJoinHint(
      buildRows: Long, bytesPerRow: Double, shufflePartitions: Int): String =
    if (buildRows.toDouble / math.max(1, shufflePartitions) * bytesPerRow
        <= 32d * 1024 * 1024) "shuffle_hash"
    else "merge"

  def prefixBlockedCandidates(
      vals: DataFrame,
      k: Int = 4,
      maxLenDiff: Int = 2,
      buildHint: String = "merge"): DataFrame = {
    require(k >= 1, s"prefix length k must be >= 1, got $k")
    require(maxLenDiff >= 0, s"maxLenDiff must be >= 0, got $maxLenDiff")
    // bucket width w = maxLenDiff + 1: two lengths within maxLenDiff
    // land in the same or adjacent buckets, so probing 3 neighbor
    // buckets (one equi-join + bounded fanout) covers the band exactly;
    // the precise |Δlen| filter then prunes the corners.
    val w = maxLenDiff + 1
    val keyed = vals
      .select(col("__v"), length(col("__v")).as("__len"))
      .select(col("__v"), col("__len"),
        explode(array(lit(1), lit(2))).as("__pass"))
      .withColumn("__pfx",
        when(col("__pass") === 1, substring(col("__v"), 1, k))
          .otherwise(substring(col("__v"), 2, k)))
    val left = keyed
      .withColumn("__bkt", floor(col("__len") / w))
      .select(col("__v").as("__v1"), col("__len").as("__len1"),
        col("__pass"), col("__pfx"), col("__bkt"))
    val right = keyed
      .select(col("__v").as("__v2"), col("__len").as("__len2"),
        col("__pass"), col("__pfx"),
        explode(array(lit(-1), lit(0), lit(1))).as("__off"))
      .withColumn("__bkt", floor(col("__len2") / w) + col("__off"))
      .drop("__off")
    // `buildHint` on the UN-exploded side (r18): shuffle_hash measured
    // 2.4× over a merge hint at 1.11M values — the SMJ sorted 2.2M +
    // 6.7M string rows only to enumerate bucket pairs, and sort time
    // dominated the stage. The build side is the 2-pass keyed
    // dictionary — n·2 rows hash-partitioned over (pass, pfx, bkt), so
    // the per-task hash table is (2n/shuffle-partitions) rows of short
    // strings, uniform (values are near-unique; auto-k keeps
    // per-prefix buckets ~32, so no single key floods a partition) —
    // but UNSPILLABLE, so the caller must size the hint
    // ([[sizedJoinHint]]): the same build died at the sf1 dictionary
    // (694k rows/task), where the spilling merge join is correct.
    // The probe side streams the ×3 bucket fanout sort-free either way.
    // STILL never a broadcast: hint semantics pin the build to the
    // shuffled left, and AQE's SMJ->BHJ conversion (which died
    // deserializing a vocabulary-scale hashed relation at 11M values,
    // r16) has no SMJ to convert. PlanAuditSpec pins broadcast-free on
    // the executed adaptive plan.
    left.hint(buildHint).join(right, Seq("__pass", "__pfx", "__bkt"))
      .filter(col("__v1") < col("__v2") &&
        abs(col("__len1") - col("__len2")) <= maxLenDiff &&
        // structural dedup, no distinct shuffle: a pair matches exactly
        // one length bucket (one __off satisfies the equality), so the
        // only duplication source is pass overlap — pass 2 therefore
        // admits only pairs pass 1 does NOT (first-k prefixes differ).
        // The emitted pair set is exactly DISTINCT(pass1 ∪ pass2).
        (col("__pass") === 1 ||
          substring(col("__v1"), 1, k) =!= substring(col("__v2"), 1, k)))
      .select(col("__v1"), col("__v2"))
  }

  /** [[linkageByValue]] for UNBOUNDED-cardinality columns: candidates
    * from [[prefixBlockedCandidates]] (recall contract documented
    * there), each distinct value pair scored ONCE, qualifying pairs
    * expanded to id pairs through plain equi-joins. NO BROADCAST — the
    * qualifying dictionary grows with the corpus vocabulary, so every
    * join here is explicitly hinted rather than left to AQE: measured
    * at 11M distinct values (sf1 scale-step), AQE's runtime SMJ->BHJ
    * conversion broadcast a vocabulary-scale side and every task died
    * deserializing the hashed relation ("Could not allocate memory to
    * grow BytesToBytesMap") while the dictionary checkpoints pinned
    * storage memory. The hints are SIZE-AWARE ([[sizedJoinHint]], r18):
    * shuffle_hash with the bounded side as build while the per-task
    * hash table fits a conservative budget — sorting the ~output-sized
    * pair stream twice dominated the expansion stages under the old
    * blanket merge hints — and the spilling merge join beyond it
    * (shuffled-hash builds do not spill: a blanket shuffle_hash died
    * with "not enough memory to build hash map" on the same sf1
    * dictionary). PlanAuditSpec pins broadcast-free on the executed
    * adaptive plan. Equal-value id pairs ride a separate self-score
    * arm exactly as in [[linkageByValue]].
    *
    * Scorer-once placement mirrors linkageByValue: the scored candidate
    * dictionary is lineage-truncated BEFORE the threshold filter lands
    * on the materialized leaf attribute, so constraint inference can
    * never re-manufacture per-corpus-row scoring (the q280 hazard,
    * pinned by PlanAuditSpec).
    *
    * @param k prefix blocking length; k <= 0 (the DEFAULT) auto-sizes
    *          from the measured dictionary via [[choosePrefixK]] so the
    *          prefix space cannot saturate as the corpus grows. Pass an
    *          explicit k only when the pair set must replay a pinned
    *          blocking rule (the recall contract changes with k).
    * @return (id1, id2, score) with id1 < id2
    */
  def linkageBlocked(
      df: DataFrame,
      idCol: String,
      strCol: String,
      score: (Column, Column) => Column,
      threshold: Double,
      k: Int = 0,
      maxLenDiff: Int = 2): DataFrame = {
    // the dictionary carries each value's OCCURRENCE COUNT (r18): the
    // same exchange that deduplicated the vocabulary (groupBy == the old
    // distinct, plus a counted partial aggregate) now also answers two
    // questions that each cost their own pass before — the corpus row
    // count for the expansion-join sizing (was a separate df.count()
    // job) and, decisively, WHICH values can form equal-value id pairs
    // at all: a value occurring once can never produce an (ida < idb)
    // pair, so the equal-value arm below scores and probes only the
    // __n >= 2 subset (90k of 1.11M values at sf0.1 — the arm's scoring
    // and its expansion dictionaries shrink ~12×, and the shrink grows
    // with vocabulary).
    val vals = Checkpoints.truncate(
      df.select(col(strCol).as("__v")).filter(col("__v").isNotNull)
        .groupBy("__v").agg(count(lit(1)).as("__n")))
    // k <= 0 → AUTO-size the prefix from the dictionary (the DEFAULT,
    // VERDICT r16 task #3): at a fixed k the prefix space saturates once
    // n ≫ σ_eff^k and candidates grow ~n²/σ^k — measured 522M at k=4 on
    // 11.1M values vs 85M/28M at k=5/6. One aggregate over the already-
    // checkpointed dictionary measures n plus approx distinct prefixes
    // at each candidate length; [[choosePrefixK]] takes the smallest k
    // whose measured prefix count keeps expected bucket size ≤ 32. The
    // collect is ONE row (bounded). Callers whose replayed oracle pins a
    // specific blocking rule (q286: k=4) pass k explicitly — auto-k
    // trades recall for volume exactly as documented in
    // [[prefixBlockedCandidates]] (agreement on chars 1..k or 2..k+1).
    // ONE bounded-collect aggregate over the cached dictionary measures
    // everything the sizing decisions below need: n and the mean value
    // length always (they calibrate the size-aware join hints), plus
    // the per-k approx distinct prefixes when k is being auto-sized.
    val kMin = 4; val kMax = 8
    val sizeAggs = Seq(count(lit(1)).as("n"),
      avg(length(col("__v"))).as("avgLen"),
      // corpus (non-null) row count off the dictionary's own counts —
      // replaces the separate df.count() job the expansion-hint sizing
      // paid below (null-valued rows never match an equi-join on the
      // value, so the non-null count is the better build-side estimate
      // anyway)
      sum(col("__n")).as("rows")) ++
      (if (k > 0) Nil
       else (kMin to kMax).map(c =>
         approx_count_distinct(substring(col("__v"), 1, c)).as(s"p$c")))
    val sizeRow = vals.agg(sizeAggs.head, sizeAggs.tail: _*).head()
    val nVals = sizeRow.getLong(0)
    val avgLen = Option(sizeRow.get(1)).fold(16d)(_.asInstanceOf[Double])
    val corpusRows = if (sizeRow.isNullAt(2)) 0L else sizeRow.getLong(2)
    val shufflePartitions = math.max(1,
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    val kEff =
      if (k > 0) k
      else {
        val row = sizeRow
        val n = nVals
        val chosen = choosePrefixK(n, c => row.getLong(3 + (c - kMin)), 32L, kMin, kMax)
        // the chosen k changes the RECALL contract (agreement on chars
        // 1..k or 2..k+1), so the auto-sizing decision must be observable
        // at runtime (ADVICE r17): log k plus the measurements it came
        // from — approx_count_distinct sits on threshold edges, and a
        // silent k bump as the dictionary grows would otherwise look
        // like a recall regression with no trace.
        log.info(s"linkageBlocked auto-k: chose k=$chosen for n=$n distinct " +
          s"values (approx distinct prefixes: " +
          (kMin to kMax).map(c => s"k$c=${row.getLong(3 + (c - kMin))}")
            .mkString(", ") + s"; target bucket 32)")
        chosen
      }
    // scoring happens once per candidate pair during the truncate's
    // materialization, and here the threshold filters BEFORE the
    // lineage cut so only qualifying pairs are materialized. That
    // placement is safe for THIS arm precisely because the constraint
    // it creates — score(__v1, __v2) >= t — references BOTH dictionary
    // attributes: equality substitution through the expansion join
    // (__va = __v1) can never reduce it to a single corpus column, so
    // InferFiltersFromConstraints has nothing to manufacture on the
    // corpus scans. The EQUAL-value arm below has no such protection
    // (score(__v, __v) collapses to one attribute — the measured q280
    // hazard) and keeps the filter-after-truncate placement.
    // PlanAuditSpec pins the scorer absent from the final plan.
    // candidate build side = the 2-pass keyed dictionary (2n short
    // strings): hash it only while it fits ([[sizedJoinHint]]; ~88
    // bytes/row of map overhead on top of the value)
    val candHint = sizedJoinHint(2L * nVals, avgLen + 88, shufflePartitions)
    val dict = Checkpoints.truncate(
      prefixBlockedCandidates(vals, kEff, maxLenDiff, candHint)
        .withColumn("__score", score(col("__v1"), col("__v2")))
        .filter(col("__score") >= threshold))
    // only values occurring >= 2 times can form an (ida < idb) equal
    // pair — provably output-identical restriction, and the arm's
    // scoring + expansion dictionaries shrink from vocabulary-sized to
    // the duplicated subset (90k of 1.11M at sf0.1)
    val eqDict = Checkpoints.truncate(
      vals.filter(col("__n") >= 2)
        .select(col("__v"), score(col("__v"), col("__v")).as("__score")))
      .filter(col("__score") >= threshold)
    // the value dictionary has now fed everything that reads it (the
    // auto-k aggregate, the scored candidate dict, the equal-value
    // dict — all materialized above); free its pinned blocks instead of
    // letting ~sizeof(vocabulary) storage ride until the context
    // cleaner notices (r18: per-query pinned storage is what amplified
    // this operator 3.4× pass-to-pass inside the 8 GB bench JVM).
    Checkpoints.free(vals)
    // expansion joins: size-hinted with the CORPUS side as build (r18).
    // The qualifying-pair stream is the big side (it approaches the
    // output size, ~10M pairs at sf0.1) and a merge hint sorts it
    // TWICE (once per id expansion); hashing the corpus side —
    // (id, value) rows, hash-partitioned by value, per-task table =
    // corpus/shuffle-partitions rows, uniform because values are
    // near-unique — streams the pair side sort-free. The corpus row
    // count for the sizing comes from ONE count job (the only quantity
    // the dictionary aggregates cannot bound); past the budget the
    // spilling merge join returns. Never a broadcast (the measured
    // 11M-value failure): the build is the SHUFFLED corpus partition,
    // never a collected relation. corpusRows came off the dictionary's
    // occurrence counts above — no separate count job.
    val expHint = sizedJoinHint(corpusRows, avgLen + 96, shufflePartitions)
    val aSide = df.select(col(idCol).as("__ida"), col(strCol).as("__va"))
    val bSide = df.select(col(idCol).as("__idb"), col(strCol).as("__vb"))
    val unequal = aSide.hint(expHint)
      .join(dict, col("__va") === col("__v1"))
      .join(bSide.hint(expHint), col("__vb") === col("__v2"))
      .select(
        least(col("__ida"), col("__idb")).as("id1"),
        greatest(col("__ida"), col("__idb")).as("id2"),
        col("__score").as("score"))
    val equal = aSide.hint(expHint)
      .join(eqDict, col("__va") === col("__v"))
      .join(bSide.hint(expHint), col("__vb") === col("__v"))
      .filter(col("__ida") < col("__idb"))
      .select(col("__ida").as("id1"), col("__idb").as("id2"),
        col("__score").as("score"))
    unequal.unionByName(equal)
  }

  /** SimHash banded near-dup pairs. Splits the `sigBits`-bit signature into
    * `nBands` equal bit-bands; pairs sharing any band are candidates, then
    * filtered to hamming(sig1, sig2) ≤ maxHamming. With maxHamming <
    * nBands the banding is EXACT by pigeonhole (≤ maxHamming differing
    * bits cannot touch all nBands bands), so this equals the brute-force
    * O(n²) scan while costing only an equi-join. Wider signatures
    * (sigBits = 60 via [[graft.functions.SimHash60]]) cut incidental band
    * collisions on small-vocabulary corpora — fewer false candidates into
    * the hamming filter at identical shuffle shape.
    *
    * @param sigs (idCol, sigCol) with the signature in a long
    */
  def simhashPairs(
      sigs: DataFrame,
      idCol: String,
      sigCol: String,
      nBands: Int = 4,
      maxHamming: Int = 3,
      sigBits: Int = 32): DataFrame = {
    require(maxHamming < nBands, "banding is only exact when maxHamming < nBands")
    require(sigBits % nBands == 0, s"nBands=$nBands must divide sigBits=$sigBits")
    val banded = bandSignatures(sigs.select(col(idCol), col(sigCol)),
      sigCol, nBands, sigBits)
    val a = banded.select(col(idCol).as("id1"), col(sigCol).as("sig1"), col("band"), col("bval"))
    val b = banded.select(col(idCol).as("id2"), col(sigCol).as("sig2"), col("band"), col("bval"))
    a.join(b, Seq("band", "bval"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("sig1").bitwiseXOR(col("sig2"))).cast("long").as("hamming"))
      // hamming BEFORE distinct: the dedup exchange then carries only the
      // near pairs, not every incidental band collision
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Band decomposition of a packed signature column: one output row per
    * (input row, band) with `band` and the band's bit value `bval`. THE
    * single home of the band layout (and thus the pigeonhole-exactness
    * argument: two signatures within hamming ≤ nBands−1 agree on ≥ 1
    * band) — shared by the batch pair join ([[simhashPairs]]) and the
    * streaming filter ([[graft.streaming.StreamingDedup]]).
    */
  private[graft] def bandSignatures(
      df: DataFrame, sigCol: String, nBands: Int, sigBits: Int): DataFrame = {
    val bandBits = sigBits / nBands
    df.select(col("*"), explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .withColumn("bval",
        expr(s"shiftright($sigCol, cast(band * $bandBits as int)) & ${(1L << bandBits) - 1}L"))
  }

  /** EXACT-SUBSTRING duplicate spans across documents (the ExactSubstr
    * dedup of Lee et al., "Deduplicating Training Data Makes Language
    * Models Better", ACL 2022 — there via a monolithic suffix array):
    * every maximal shared substring of length ≥ `minSpan` between any
    * two documents, as (id1, id2, start1, start2, span_len) with
    * 0-based starts into the whitespace-NORMALIZED text.
    *
    * Spark-first shape instead of a suffix array (which wants the
    * corpus concatenated on one machine): positional char `gramLen`-
    * grams (narrow explode), an OCCURRENCE-frequency cap + ≥ 2 prune
    * (boilerplate grams are the occurrences² join bomb — the winnowing
    * lesson — and single-occurrence grams can never pair), one
    * equi-join on the gram, then
    * per (pair, DIAGONAL = start1 − start2) consecutive gram positions
    * collapse into maximal runs with the islands trick (pos −
    * row_number is constant exactly on a consecutive run): a run of
    * positions [p, q] is a shared substring of length q − p + gramLen.
    * Every step is an equi-join or a (pair, diagonal)-keyed window —
    * fine-grained keys, no unpartitioned window, no cross product.
    *
    * Exactness caveat, stated not hidden: a gram dropped by the df cap
    * splits any span crossing it in two on BOTH engines (the cap is
    * part of the operator's definition); spans shorter than `gramLen`
    * are invisible by construction (minSpan ≥ gramLen is required).
    */
  def sharedSubstringSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      gramLen: Int,
      minSpan: Int,
      dfCap: Long = 64L): DataFrame = {
    require(gramLen >= 2, s"gramLen must be >= 2, got $gramLen")
    require(minSpan >= gramLen, s"minSpan $minSpan < gramLen $gramLen")
    require(dfCap >= 2, s"dfCap must be >= 2, got $dfCap")
    val norm = regexp_replace(trim(col(textCol)), "\\s+", " ")
    val grams = docs
      .select(col(idCol).cast("long").as("doc_id"), norm.as("__s"))
      .filter(length(col("__s")) >= gramLen)
      .select(col("doc_id"), col("__s"),
        explode(sequence(lit(0), length(col("__s")) - gramLen)).as("pos"))
      .select(col("doc_id"), col("pos"),
        expr(s"substring(__s, pos + 1, $gramLen)").as("gram"))
    // OCCURRENCE-frequency prune (total occurrences, deliberately NOT
    // per-document df): the pair join fans out as occurrences², so the
    // cap bounds the join bomb directly — a doc-df cap would let one
    // document's 1000 internal repeats through. occurrences = 1 cannot
    // pair; same-doc pairs die at id1 < id2 (bounded waste, ≤ cap²/pair)
    // ONE shuffle of the exploded gram table, shared by the df-aggregate
    // and the semi probe (r18, guide-§2.4 "two operations keyed the same
    // way share one exchange"): the old lazy `keep` made the pruning
    // materialization run the gram explode TWICE and pay TWO full
    // exchanges (the aggregate's partial-count exchange and the shuffled
    // semi-join's raw-gram exchange — different payloads, so no reuse).
    // Repartitioning by gram first puts both consumers on top of the
    // SAME exchange: the capped dictionary is a partial aggregate over
    // it, the semi probe is co-partitioned with the dictionary it
    // filters against, and Catalyst's ReusedExchange makes the explode
    // run once and the gram table cross the network once. Scale-safe at
    // any corpus size: nothing is broadcast, nothing driver-sized, the
    // exchange is the one the aggregate always needed.
    val g2 = grams.repartition(col("gram"))
    val keep = g2.groupBy("gram").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= 2 && col("__df") <= dfCap)
      .select("gram")
    // pruned is consumed TWICE (both sides of the pair join) and its
    // lineage re-runs the full gram explode + df aggregate per consumer
    // — and it is TINY (duplicated grams only). Truncate it once: the
    // q188 lesson (a twice-consumed derived relation is only safe lazy
    // when exchange reuse is PROVEN at the target scale).
    // merge-hinted: left to itself the planner broadcasts the dictionary
    // (it fits at small SFs), which floats the semi BELOW the repartition
    // and runs the explode twice — the hint keeps both sides on the
    // shared gram partitioning (and an SMJ semi spills gracefully at any
    // dictionary size, where a broadcast caps out)
    val pruned = Checkpoints.truncate(
      g2.join(keep.hint("merge"), Seq("gram"), "left_semi"))
    val pairs = pruned.select(col("gram"), col("doc_id").as("id1"), col("pos").as("p1"))
      .join(pruned.select(col("gram"), col("doc_id").as("id2"), col("pos").as("p2")),
        Seq("gram"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("p1"), col("p2"),
        (col("p1") - col("p2")).as("diag"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id1", "id2", "diag").orderBy("p1")
    pairs
      .withColumn("__run", col("p1") - row_number().over(w))
      .groupBy("id1", "id2", "diag", "__run")
      .agg(min(col("p1")).as("start1"),
        (max(col("p1")) - min(col("p1")) + gramLen).as("span_len"))
      .filter(col("span_len") >= minSpan)
      .select(col("id1"), col("id2"), col("start1"),
        (col("start1") - col("diag")).as("start2"), col("span_len"))
  }
}
