package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE (byte-pair-encoding) vocabulary training — the
  * subword tokenizer-learning step of an LLM data pipeline (Sennrich et
  * al., ACL 2016; SURVEY.md §2.11 — the reference has no text path at
  * all). [[graft.functions.TextAnalysis.tokenEstimate]] approximates a
  * tokenizer; this LEARNS one from the corpus.
  *
  * Scale shape — the part that matters at 100 TB:
  *   - the corpus collapses to its DISTINCT-WORD vocabulary first
  *     (groupBy word: one shuffle of (word, count), Zipf makes this
  *     orders of magnitude smaller than the corpus; every later step
  *     touches only the vocabulary);
  *   - each merge iteration is: per-word adjacent-pair explode (narrow)
  *     → map-side-combined pair-count aggregate → an argmax collect of
  *     ONE row to the driver → a narrow per-word merge apply. The
  *     driver holds only the merge table (numMerges rows), never data;
  *   - the iterated vocabulary is re-persisted per round with the
  *     previous round unpersisted ([[PageRank]]'s idiom) so the lineage
  *     stays O(1) deep.
  *
  * Determinism: ties on pair count break by (left, right) lexicographic
  * — training is replay-stable across partitionings and engines.
  * Words are whitespace tokens as-is (no case folding — fold upstream
  * with [[graft.functions.TextCanonicalize]] if wanted) with the
  * standard `</w>` end-of-word symbol, so merges distinguish word-final
  * from word-internal contexts.
  */
object Bpe {

  val EndOfWord = "</w>"

  private val vocabSchema = StructType(Seq(
    StructField("syms", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("cnt", LongType, nullable = false)))

  /** The distinct-word vocabulary of a corpus as symbol sequences:
    * (syms = [chars..., </w>], cnt = corpus frequency of the word).
    */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame = {
    val words = docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("__w")).agg(count(lit(1)).as("cnt"))
    val enc = RowEncoder.encoderFor(vocabSchema)
    words.mapPartitions { it =>
      it.map { r =>
        val w = r.getString(0)
        Row(w.map(_.toString) :+ EndOfWord, r.getLong(1))
      }
    }(enc)
  }

  /** Adjacent-pair counts over a symbol vocabulary, weighted by word
    * frequency: (sym_l, sym_r, cnt). Map-side combined; the shuffle
    * carries one row per distinct pair per partition.
    */
  def pairCounts(vocab: DataFrame): DataFrame = {
    val pairSchema = StructType(Seq(
      StructField("sym_l", StringType, nullable = false),
      StructField("sym_r", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(pairSchema)
    vocab.mapPartitions { it =>
      it.flatMap { r =>
        val syms = r.getSeq[String](0)
        val c = r.getLong(1)
        (0 until syms.length - 1).iterator.map(i => Row(syms(i), syms(i + 1), c))
      }
    }(enc)
      .groupBy(col("sym_l"), col("sym_r")).agg(sum(col("cnt")).as("cnt"))
  }

  /** One greedy left-to-right merge pass: every non-overlapping adjacent
    * (a, b) becomes the fused symbol a+b — the standard BPE apply.
    */
  private[graft] def mergeOnce(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** One learned merge: fuse (left, right); `cnt` is the weighted pair
    * count at the time it was chosen (monotone non-increasing).
    */
  final case class Merge(left: String, right: String, cnt: Long)

  /** Learn `numMerges` BPE merges from the corpus. Stops early when no
    * pair reaches `minCount`. Returns merges in application order.
    */
  def train(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      minCount: Long = 2L): Seq[Merge] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val enc = RowEncoder.encoderFor(vocabSchema)
    var vocab = wordVocab(docs, textCol).persist()
    vocab.count() // materialize before the loop so each round is O(1) lineage
    val merges = Seq.newBuilder[Merge]
    var k = 0
    var done = false
    try {
      while (k < numMerges && !done) {
        val top = pairCounts(vocab)
          .orderBy(col("cnt").desc, col("sym_l"), col("sym_r"))
          .limit(1).collect()
        if (top.isEmpty || top.head.getLong(2) < minCount) done = true
        else {
          val (a, b, c) = (top.head.getString(0), top.head.getString(1),
            top.head.getLong(2))
          merges += Merge(a, b, c)
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

  /** Apply learned merges (in training order) to one word's symbols. */
  private[graft] def applyMerges(word: String, merges: Seq[Merge]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString) :+ EndOfWord
    merges.foreach(m => syms = mergeOnce(syms, m.left, m.right))
    syms
  }

  /** Tokenize a corpus with a learned merge table:
    * (idCol, tokens ARRAY<STRING>) — each word becomes its merged
    * subword symbols (the `</w>` marker rides the final subword).
    * Narrow per-row work; the merge table broadcasts via the closure.
    */
  def tokenize(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("tokens", ArrayType(StringType, containsNull = false),
        nullable = false)))
    val enc = RowEncoder.encoderFor(schema)
    val idIdx = docs.schema.fieldIndex(idCol)
    val txtIdx = docs.schema.fieldIndex(textCol)
    docs.mapPartitions { it =>
      it.map { r =>
        val words = Option(r.getString(txtIdx)).getOrElse("")
          .trim.split("\\s+").filter(_.nonEmpty)
        Row(r.getLong(idIdx), words.toSeq.flatMap(w => applyMerges(w, merges)))
      }
    }(enc)
  }
}
