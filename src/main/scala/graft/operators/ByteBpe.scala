package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BYTE-LEVEL BPE — the fourth learned-tokenizer family beside the
  * `</w>`-marked char BPE ([[Bpe]]), WordPiece ([[Wordpiece]]) and
  * Unigram-Viterbi ([[Unigram]]), and the variant GPT-class models
  * actually ship (Radford et al. 2019, the published GPT-2 encoder):
  * text is UTF-8 BYTES first, every byte mapped through the standard
  * 256-entry byte↔printable-unicode bijection, so ANY input tokenizes
  * with zero `[UNK]`s and the vocabulary is closed by construction.
  * Spaces are not markers here — a piece CARRIES its leading space as
  * the mapped byte `Ġ`, which is how word-boundary information rides
  * the learned merges.
  *
  * Shares [[Bpe]]'s training loop verbatim ([[Bpe.trainFromVocab]]:
  * vocabulary-collapsed corpus, one-row argmax collects, O(1)
  * lineage); only the base alphabet differs (mapped bytes, no
  * end-of-word symbol). Pre-tokenization is the simplified ` ?\S+`
  * shape over whitespace-normalized text — piece 0 bare, every later
  * piece with its leading space — documented divergence from GPT-2's
  * full contraction-aware regex (a pre-tokenizer choice, not a BPE
  * semantics change).
  *
  * Determinism / oracle seams: the byte map is a fixed bijection, so
  * for a pure-ASCII corpus the mapped stream is the text with ' '→'Ġ'
  * and the whole encode replays in SQL as q194's double-space rewrite
  * chain (with a piece-boundary sentinel so merges can never span
  * pieces — see q257). Ids are exact: byte b → b (0..255), merge k's
  * result → 256+k; injective because merge results are ≥2 mapped
  * chars. [[detokenize]] inverts ids → mapped chars → bytes → UTF-8
  * losslessly, so round-trip == whitespace-normalized source (q258's
  * claim), for ANY input including multi-byte UTF-8.
  */
object ByteBpe {

  /** The published byte↔unicode table: printable bytes map to
    * themselves ('!'..'~', '¡'..'¬', '®'..'ÿ'); the remaining 68 map
    * to 256, 257, … in byte order (so 0x20 space → U+0120 'Ġ',
    * 0x0A newline → U+010A).
    */
  private[graft] val byteToChar: Array[Char] = {
    val direct = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val arr = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (direct(b)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
    }
    arr
  }

  private[graft] val charToByte: Map[Char, Int] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** Whitespace-normalized ` ?\S+` pieces: piece 0 bare, every later
    * piece carries its single leading space.
    */
  private[graft] def pretokenize(text: String): Seq[String] = {
    val words = Option(text).getOrElse("").trim.split("\\s+").filter(_.nonEmpty)
    words.zipWithIndex.map { case (w, i) => if (i == 0) w else " " + w }.toSeq
  }

  /** One piece as base symbols: one symbol per UTF-8 BYTE, each the
    * mapped printable char. No end-of-word marker — the leading-space
    * byte plays that role.
    */
  private[graft] def baseSymbols(piece: String): Seq[String] =
    piece.getBytes(StandardCharsets.UTF_8).toSeq
      .map(b => byteToChar(b & 0xff).toString)

  private val vocabSchema = StructType(Seq(
    StructField("syms", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("cnt", LongType, nullable = false)))

  /** Distinct-PIECE vocabulary (the byte-level twin of
    * [[Bpe.wordVocab]]): ` ?\S+` pieces exploded per document, counted,
    * then split to mapped-byte symbols.
    */
  def pieceVocab(docs: DataFrame, textCol: String): DataFrame = {
    val enc = RowEncoder.encoderFor(vocabSchema)
    val pieceSchema = StructType(Seq(
      StructField("piece", StringType, nullable = false)))
    val pEnc = RowEncoder.encoderFor(pieceSchema)
    val txtIdx = docs.schema.fieldIndex(textCol)
    docs.mapPartitions { it =>
      it.flatMap(r => pretokenize(r.getString(txtIdx)).map(Row(_)))
    }(pEnc)
      .groupBy(col("piece")).agg(count(lit(1)).as("cnt"))
      .mapPartitions { it =>
        it.map(r => Row(baseSymbols(r.getString(0)), r.getLong(1)))
      }(enc)
  }

  /** Learn `numMerges` byte-level merges — [[Bpe.trainFromVocab]] over
    * the piece vocabulary.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 2L): Seq[Bpe.Merge] =
    Bpe.trainFromVocab(pieceVocab(docs, textCol), numMerges, minCount)

  private[graft] def applyMerges(piece: String, merges: Seq[Bpe.Merge]): Seq[String] = {
    var arr: Array[String] = baseSymbols(piece).toArray
    val it = merges.iterator
    while (it.hasNext && arr.length > 1) { // 1 symbol left: rest are no-ops
      val m = it.next()
      arr = Bpe.mergeOnceArr(arr, m.left, m.right)
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(arr)
  }

  /** Tokenize to mapped-space token strings: (doc_id, tokens
    * ARRAY<STRING>). Narrow per-row work, merge table via closure.
    */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Bpe.Merge]): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("tokens", ArrayType(StringType, containsNull = false),
        nullable = false)))
    val enc = RowEncoder.encoderFor(schema)
    val idIdx = docs.schema.fieldIndex(idCol)
    val txtIdx = docs.schema.fieldIndex(textCol)
    docs.mapPartitions { it =>
      // per-task memo (r19): pieces repeat Zipf-style, same as Bpe.tokenize
      val tok = Bpe.memoized()((p: String) => applyMerges(p, merges))
      it.map { r =>
        Row(r.getLong(idIdx), pretokenize(r.getString(txtIdx)).flatMap(tok))
      }
    }(enc)
  }

  /** Deterministic token→id map: byte b → b (0..255), merge k's result
    * → 256+k. Injective: a merge result is ≥2 mapped chars, a base
    * symbol exactly 1. Every possible input byte has an id, so there
    * is no UNK arm at all — the property that makes byte-level the
    * shipped variant.
    */
  def tokenIdMap(merges: Seq[Bpe.Merge]): Map[String, Int] = {
    val merged = merges.zipWithIndex
      .map { case (m, k) => (m.left + m.right) -> (256 + k) }
    require(merged.map(_._1).distinct.size == merged.size,
      "merge table repeats a result symbol")
    merged.toMap
  }

  private def idOf(tok: String, ids: Map[String, Int]): Int =
    ids.getOrElse(tok, {
      require(tok.length == 1 && charToByte.contains(tok.charAt(0)),
        s"token '$tok' is neither a merge result nor a mapped byte")
      charToByte(tok.charAt(0))
    })

  /** [[tokenize]] to integer ids: (doc_id, ids ARRAY<INT>). */
  def tokenizeIds(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Bpe.Merge]): DataFrame = {
    val ids = tokenIdMap(merges)
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("ids", ArrayType(IntegerType, containsNull = false),
        nullable = false)))
    val enc = RowEncoder.encoderFor(schema)
    val idIdx = docs.schema.fieldIndex(idCol)
    val txtIdx = docs.schema.fieldIndex(textCol)
    docs.mapPartitions { it =>
      val tok = Bpe.memoized()((p: String) =>
        applyMerges(p, merges).map(idOf(_, ids)))
      it.map { r =>
        Row(r.getLong(idIdx), pretokenize(r.getString(txtIdx)).flatMap(tok))
      }
    }(enc)
  }

  /** Invert [[tokenizeIds]]: ids → mapped chars → BYTES → UTF-8 text.
    * No marker bookkeeping at all (spaces are real bytes in the
    * stream), so this is exact for any input — including text whose
    * chars are multi-byte UTF-8, whose bytes reassemble verbatim.
    * Unknown ids fail loudly.
    */
  def detokenize(idsDf: DataFrame, merges: Seq[Bpe.Merge]): DataFrame = {
    val rev = tokenIdMap(merges).map(_.swap)
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false)))
    val enc = RowEncoder.encoderFor(schema)
    val idIdx = idsDf.schema.fieldIndex("doc_id")
    val arrIdx = idsDf.schema.fieldIndex("ids")
    idsDf.mapPartitions { it =>
      it.map { r =>
        val mapped = r.getSeq[Int](arrIdx).map { id =>
          if (id < 256) {
            require(id >= 0, s"unknown token id $id")
            byteToChar(id).toString
          } else rev.getOrElse(id, sys.error(s"unknown token id $id"))
        }.mkString
        val bytes = mapped.map { c =>
          charToByte.getOrElse(c, sys.error(s"non-byte char '$c' in token stream"))
            .toByte
        }.toArray
        Row(r.getLong(idIdx), new String(bytes, StandardCharsets.UTF_8))
      }
    }(enc)
  }
}
