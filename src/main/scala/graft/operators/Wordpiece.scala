package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed WordPiece tokenizer — the second learned-subword family
  * beside [[Bpe]] (Schuster & Nakajima, ICASSP 2012; the BERT tokenizer,
  * Devlin et al. 2019; SURVEY.md §2.11 — the reference has no text path).
  * Two deliberate differences from BPE, both implemented here the way
  * the public trainers (HuggingFace `tokenizers`) do:
  *
  *   - TRAINING picks the pair maximizing the likelihood score
  *     count(ab) / (count(a)·count(b)) instead of the raw pair count —
  *     merges that glue already-frequent symbols are penalized;
  *   - ENCODING is greedy longest-match-first against the final piece
  *     vocabulary (max-munch per position), NOT a replay of the merge
  *     history; a word with any un-matchable position becomes `[UNK]`
  *     wholesale. Continuation pieces carry the `##` prefix.
  *
  * Scale shape is [[Bpe]]'s: corpus → distinct-word vocabulary once,
  * then per merge round one pair-count aggregate + one symbol-count
  * aggregate + a ONE-ROW argmax collect; the iterated vocabulary
  * re-persists per round with O(1) lineage. Encoding is a narrow
  * per-row map with the piece set broadcast via the closure.
  *
  * Determinism across engines: the score is one IEEE division of two
  * exactly-representable integers (pair count ≤ 2^53, symbol-count
  * product ≤ 2^53 guarded) — both Spark and DuckDB produce the
  * bit-identical double, so the (score desc, left, right) argmax is
  * replay-stable (q221's oracle). Greedy encode ties are impossible:
  * two same-length pieces matching at one position are the same string.
  */
object Wordpiece {

  val Unk = "[UNK]"
  val ContPrefix = "##"

  /** A word as WordPiece symbols: one per code point, the first plain,
    * the rest `##`-prefixed.
    */
  private[graft] def baseSymbols(w: String): Seq[String] = {
    val cps = w.codePoints().toArray.toSeq
      .map(cp => new String(Character.toChars(cp)))
    cps.head +: cps.tail.map(ContPrefix + _)
  }

  private val vocabSchema = StructType(Seq(
    StructField("syms", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("cnt", LongType, nullable = false)))

  /** Distinct-word vocabulary as WordPiece symbol sequences. */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame = {
    val words = docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("__w")).agg(count(lit(1)).as("cnt"))
    val enc = RowEncoder.encoderFor(vocabSchema)
    words.mapPartitions { it =>
      it.map(r => Row(baseSymbols(r.getString(0)), r.getLong(1)))
    }(enc)
  }

  /** Likelihood-scored adjacent pairs over a symbol vocabulary:
    * (sym_l, sym_r, cnt, cnt_l, cnt_r, score) with
    * score = cnt / (cnt_l·cnt_r). Both aggregates are map-side partial;
    * the two count joins broadcast (symbol tables are alphabet-sized,
    * bounded by vocabulary not corpus).
    */
  def pairScores(vocab: DataFrame): DataFrame = {
    val pairs = Bpe.pairCounts(vocab)
    val symSchema = StructType(Seq(
      StructField("s", StringType, nullable = false),
      StructField("sc", LongType, nullable = false)))
    val symEnc = RowEncoder.encoderFor(symSchema)
    val syms = vocab.mapPartitions { it =>
      it.flatMap { r =>
        val c = r.getLong(1)
        r.getSeq[String](0).iterator.map(Row(_, c))
      }
    }(symEnc).groupBy(col("s")).agg(sum(col("sc")).as("sc"))
    pairs
      .join(broadcast(syms.select(col("s").as("sym_l"), col("sc").as("cnt_l"))), "sym_l")
      .join(broadcast(syms.select(col("s").as("sym_r"), col("sc").as("cnt_r"))), "sym_r")
      .select(col("sym_l"), col("sym_r"), col("cnt"), col("cnt_l"), col("cnt_r"),
        // one IEEE division of exact integers — bit-identical on any
        // engine; the product is < 2^53 for any corpus this side of
        // ~10^8-occurrence symbols squared, and overflow would go
        // negative and fail the score ordering visibly, not silently
        (col("cnt").cast("double") /
          (col("cnt_l") * col("cnt_r")).cast("double")).as("score"))
  }

  /** Fuse a pair: the right symbol sheds its continuation prefix; the
    * result inherits the left's first-vs-continuation position. */
  private[graft] def fuse(a: String, b: String): String =
    a + b.stripPrefix(ContPrefix)

  private[graft] def mergeOnce(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += fuse(a, b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** One learned merge with its likelihood score and pair count. */
  final case class Merge(left: String, right: String, score: Double, cnt: Long)

  /** Learn `numMerges` WordPiece merges. Stops early when no pair
    * reaches `minCount` occurrences (the likelihood score itself has no
    * natural floor — rare-pair noise is cut by count, as the public
    * trainers do). Ties on score break by (left, right) lexicographic.
    */
  def train(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      minCount: Long = 2L): Seq[Merge] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val enc = RowEncoder.encoderFor(vocabSchema)
    var vocab = wordVocab(docs, textCol).persist()
    vocab.count()
    val merges = Seq.newBuilder[Merge]
    var k = 0
    var done = false
    try {
      while (k < numMerges && !done) {
        val top = pairScores(vocab)
          .filter(col("cnt") >= minCount)
          .orderBy(col("score").desc, col("sym_l"), col("sym_r"))
          .limit(1).collect()
        if (top.isEmpty) done = true
        else {
          val (a, b) = (top.head.getString(0), top.head.getString(1))
          merges += Merge(a, b, top.head.getDouble(5), top.head.getLong(2))
          val next = vocab.mapPartitions { it =>
            it.map(r => Row(mergeOnce(r.getSeq[String](0), a, b), r.getLong(1)))
          }(enc).persist()
          next.count()
          vocab.unpersist(blocking = false)
          vocab = next
          k += 1
        }
      }
    } finally vocab.unpersist(blocking = false)
    merges.result()
  }

  /** The encode vocabulary a training run induces: the corpus alphabet
    * (every base symbol, first and continuation spelling) plus each
    * merge's fused result — the standard "alphabet + merges" WordPiece
    * vocab. The collect is bounded by the character-set size, not the
    * corpus. Sorted for a stable literal.
    */
  def trainedPieces(
      docs: DataFrame,
      textCol: String,
      merges: Seq[Merge]): Seq[String] = {
    // a FIRST-POSITION result spelled "##..." (left symbol's content
    // begins '##', e.g. a word whose text starts "##") would be
    // mis-filed as a continuation piece by the prefix classification —
    // refuse the ambiguous vocabulary loudly (the `</w>` sentinel
    // discipline of Bpe.tokenIdMap)
    merges.foreach { m =>
      require(m.left.startsWith(ContPrefix) ||
          !fuse(m.left, m.right).startsWith(ContPrefix),
        s"first-position piece '${fuse(m.left, m.right)}' collides with " +
          s"the continuation prefix '$ContPrefix'")
    }
    val alphabet = wordVocab(docs, textCol)
      .select(explode(col("syms")).as("s")).distinct()
      .collect().map(_.getString(0)).toSeq
    (alphabet ++ merges.map(m => fuse(m.left, m.right))).distinct.sorted
  }

  /** Greedy longest-match encode of one word against the piece set.
    * Any position with no matching piece turns the WHOLE word into
    * `[UNK]` (BERT semantics — partial emission would silently corrupt
    * token statistics).
    */
  private[graft] def encodeWord(
      w: String, pieces: Set[String], maxCp: Int): Seq[String] = {
    val cps = w.codePoints().toArray.toSeq
      .map(cp => new String(Character.toChars(cp)))
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < cps.length) {
      val prefix = if (pos == 0) "" else ContPrefix
      var end = math.min(cps.length, pos + maxCp)
      var hit: String = null
      while (end > pos && hit == null) {
        val cand = prefix + cps.slice(pos, end).mkString
        if (pieces(cand)) hit = cand else end -= 1
      }
      if (hit == null) return Seq(Unk)
      out += hit
      pos = end
    }
    out.result()
  }

  /** Tokenize a corpus against a frozen piece vocabulary:
    * (doc_id, tokens ARRAY<STRING>). Narrow per-row work; the piece set
    * rides the closure. Pieces are classified first-position vs
    * continuation by the `##` prefix ([[trainedPieces]] refuses the
    * vocabularies for which that classification is ambiguous).
    */
  def tokenize(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      pieces: Seq[String]): DataFrame = {
    require(pieces.nonEmpty, "empty piece vocabulary")
    require(pieces.forall(p => !p.startsWith(ContPrefix) ||
        p.length > ContPrefix.length),
      s"bare '$ContPrefix' is not a valid piece")
    val pieceSet = pieces.toSet
    val maxCp = pieces.iterator
      .map(p => p.stripPrefix(ContPrefix))
      .map(c => c.codePointCount(0, c.length)).max
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("tokens", ArrayType(StringType, containsNull = false),
        nullable = false)))
    val enc = RowEncoder.encoderFor(schema)
    val idIdx = docs.schema.fieldIndex(idCol)
    val txtIdx = docs.schema.fieldIndex(textCol)
    docs.mapPartitions { it =>
      // per-task memo (r19): segmentation is pure per word — see
      // Bpe.memoized
      val tok = Bpe.memoized()((w: String) => encodeWord(w, pieceSet, maxCp))
      it.map { r =>
        val words = Option(r.getString(txtIdx)).getOrElse("")
          .trim.split("\\s+").filter(_.nonEmpty)
        Row(r.getLong(idIdx), words.toSeq.flatMap(tok))
      }
    }(enc)
  }
}
