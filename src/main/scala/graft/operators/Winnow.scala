package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
  * 2003 — the MOSS algorithm): slide a window of `w` consecutive
  * k-gram hashes over each document and keep each window's MINIMUM
  * hash, rightmost among ties. The selection guarantees that any exact
  * substring match of length ≥ `w + k − 1` between two documents shares
  * at least one selected fingerprint — position-robust exact-substring
  * dedup with a ~2/(w+1) sampling rate, a different point in the space
  * than shingle-set MinHash (q34: whole-doc resemblance) or containment
  * (q76): winnowing localizes WHERE the shared text is.
  *
  * No reference analog (SURVEY.md §2.11 LLM-pipeline surface; the
  * reference is an OPC bridge, `Program.cs:1-1320`).
  *
  * Spark shape: fingerprint selection is a pure per-document pass — a
  * normalized projection (codegen `lower`/`regexp_replace`) followed by
  * one `mapPartitions` running an O(L) monotonic-deque sliding minimum
  * per row. NO shuffle to fingerprint a corpus; only the cross-document
  * match joins, and that join is bucketed by fingerprint hash with a
  * document-frequency cap ([[matches]]) so a gram shared by half the
  * corpus (stop-phrase skew) can never detonate a join bucket — the
  * same drop-too-common discipline MOSS itself applies.
  *
  * The gram hash is the first 15 hex digits of md5 (the repo's
  * `sqlHash60` convention), so the whole selection replays exactly in
  * DuckDB (q230/q231) — integer comparisons end to end, no floats.
  */
object Winnow {

  val fpSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("pos", IntegerType, nullable = false),
    StructField("hash", LongType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  /** Normalization shared by engine and oracle: lowercase, keep only
    * [a-z0-9]. A Column so it rides codegen in the scan projection.
    */
  def normalize(c: Column): Column =
    regexp_replace(lower(c), "[^a-z0-9]", "")

  private def md5Hash60(md: java.security.MessageDigest, gram: String): Long = {
    md.reset()
    val d = md.digest(gram.getBytes(StandardCharsets.UTF_8))
    // first 15 hex digits = top 60 bits, as sqlHash60 parses them
    var h = 0L
    var i = 0
    while (i < 8) { // 7.5 bytes; take 8 then drop the low nibble
      h = (h << 8) | (d(i) & 0xffL)
      i += 1
    }
    h >>> 4
  }

  /** One document's fingerprints: (1-based gram position, hash, gram),
    * full windows only (documents with fewer than `w` k-grams yield
    * none). Rightmost-tie sliding minimum via a monotonic deque —
    * O(L) per document, O(w) state. Package-visible for the spec.
    */
  private[graft] def winnow(s: String, k: Int, w: Int): Seq[(Int, Long, String)] = {
    val g = s.length - k + 1
    if (g < w) return Nil
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = new Array[Long](g)
    var i = 0
    while (i < g) { hashes(i) = md5Hash60(md, s.substring(i, i + k)); i += 1 }
    val deque = new java.util.ArrayDeque[Int]() // gram indices, h strictly increasing front→back
    val out = Seq.newBuilder[(Int, Long, String)]
    var lastEmitted = -1
    i = 0
    while (i < g) {
      // >= pop: equal hashes yield to the newer (rightmost) index
      while (!deque.isEmpty && hashes(deque.peekLast) >= hashes(i)) deque.pollLast()
      deque.addLast(i)
      if (deque.peekFirst <= i - w) deque.pollFirst()
      if (i >= w - 1) {
        val sel = deque.peekFirst
        if (sel != lastEmitted) {
          out += ((sel + 1, hashes(sel), s.substring(sel, sel + k)))
          lastEmitted = sel
        }
      }
      i += 1
    }
    out.result()
  }

  /** Fingerprint a corpus: `(idCol: long, textCol: string)` →
    * [[fpSchema]] rows. Narrow — one pass per document, no shuffle.
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 12, w: Int = 8): DataFrame = {
    require(k >= 2 && w >= 2, s"degenerate winnow parameters k=$k w=$w")
    val prepared = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        normalize(col(textCol)).as("s"))
    val enc = RowEncoder.encoderFor(fpSchema)
    prepared.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        winnow(r.getString(1), k, w).map { case (p, h, gr) => Row(id, p, h, gr) }
      }
    }(enc)
  }

  /** Cross-document matches over [[fingerprints]] output: pairs of
    * documents sharing ≥ `minShared` distinct fingerprint hashes, with
    * the shared GRAM (not just the 60-bit hash) verified equal — the
    * join is exact, the hash only buckets it. Fingerprints whose
    * document frequency exceeds `maxDf` are dropped FIRST (corpus-wide
    * boilerplate is noise to a match detector and a skew bomb to the
    * join: a gram in n docs costs n² pair rows in its bucket).
    */
  def matches(fp: DataFrame, maxDf: Int = 8, minShared: Int = 2): DataFrame = {
    val perDoc = fp.select(col("id"), col("hash"), col("gram")).distinct()
    val rare = perDoc.groupBy("hash", "gram")
      .agg(countDistinct(col("id")).as("__df"))
      .filter(col("__df") <= maxDf)
      .select("hash", "gram")
    val kept = perDoc.join(rare, Seq("hash", "gram"))
    kept.as("a").join(kept.as("b"),
        col("a.hash") === col("b.hash") && col("a.gram") === col("b.gram") &&
          col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(countDistinct(col("a.hash")).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
