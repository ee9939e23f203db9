package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unigram-style Viterbi segmentation (the SentencePiece-unigram
  * DECODE: Kudo 2018) under an integer-scored lexicon — the third
  * learned-subword family beside BPE (merge replay) and WordPiece
  * (greedy longest-match): segmentation is GLOBALLY optimal, not
  * greedy, so `table → ta+ble` wins when the parts outscore the whole
  * — the case max-munch structurally cannot produce.
  *
  * Integer discipline (the IncrementalAgg/Wordpiece lesson): piece
  * scores are exact integers (in unigram-LM practice: scaled
  * log-probs), so the DP compares longs, never floats, and the whole
  * segmentation replays in SQL (q243's oracle enumerates all
  * segmentations by recursive CTE and picks the same argmax).
  *
  * Determinism: ties on total score break by PREFERRING THE LONGER
  * FINAL PIECE at every DP position. Candidates at a position differ
  * in final-piece length by construction, so the chosen path is
  * unique; globally this equals ordering optimal segmentations by
  * their reversed length sequence, descending (spec-pinned against
  * brute-force enumeration).
  *
  * Coverage: a single character absent from the lexicon scores 0 and
  * counts as UNK — segmentation is total, never a failure, and the
  * UNK count is the vocabulary-coverage signal (the q227 audit shape).
  *
  * Spark shape: the lexicon is a bounded literal (require'd) riding
  * the closure; segmentation is one narrow pass over DISTINCT words —
  * O(|word| × maxPieceLen) per word, no shuffle beyond the distinct.
  */
object Unigram {

  val outSchema: StructType = StructType(Seq(
    StructField("word", StringType, nullable = false),
    StructField("pieces", StringType, nullable = false),
    StructField("score", LongType, nullable = false),
    StructField("n_pieces", IntegerType, nullable = false),
    StructField("n_unk", IntegerType, nullable = false)))

  /** One word's optimal segmentation: (pieces, score, unk count).
    * Package-visible for the spec.
    */
  private[graft] def segment(
      word: String, scores: Map[String, Long], maxLen: Int): (Seq[String], Long, Int) = {
    val n = word.length
    val bestScore = Array.fill(n + 1)(Long.MinValue)
    val bestLast = new Array[Int](n + 1)
    bestScore(0) = 0L
    var i = 1
    while (i <= n) {
      var l = 1
      val lmax = math.min(i, maxLen)
      while (l <= lmax) {
        val j = i - l
        if (bestScore(j) != Long.MinValue) {
          val sc = scores.get(word.substring(j, i)) match {
            case Some(s) => s
            case None if l == 1 => 0L // UNK single char
            case None => Long.MinValue
          }
          if (sc != Long.MinValue) {
            val tot = bestScore(j) + sc
            if (tot > bestScore(i) || (tot == bestScore(i) && l > bestLast(i))) {
              bestScore(i) = tot
              bestLast(i) = l
            }
          }
        }
        l += 1
      }
      i += 1
    }
    // backtrack
    var pos = n
    var acc: List[String] = Nil
    var unk = 0
    while (pos > 0) {
      val l = bestLast(pos)
      val p = word.substring(pos - l, pos)
      if (!scores.contains(p)) unk += 1
      acc = p :: acc
      pos -= l
    }
    (acc, bestScore(n), unk)
  }

  /** Segment `(wordCol)` rows under the literal lexicon. Pieces must be
    * non-empty with non-negative scores; the lexicon is closure-bounded.
    */
  def viterbiSegment(words: DataFrame, wordCol: String,
      lexicon: Map[String, Long]): DataFrame = {
    require(lexicon.nonEmpty, "empty lexicon")
    require(lexicon.keys.forall(_.nonEmpty), "empty-string piece")
    require(lexicon.values.forall(_ >= 0), "negative piece score")
    require(lexicon.size <= 1000000, "lexicon too large to ride the closure")
    val maxLen = lexicon.keys.map(_.length).max
    val idx = words.schema.fieldIndex(wordCol)
    val enc = RowEncoder.encoderFor(outSchema)
    words.filter(col(wordCol).isNotNull).mapPartitions { it =>
      it.map { r =>
        val w = r.getString(idx)
        val (pieces, score, unk) = segment(w, lexicon, maxLen)
        Row(w, pieces.mkString(" "), score, pieces.size, unk)
      }
    }(enc)
  }
}
