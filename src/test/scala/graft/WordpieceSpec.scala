package graft

import graft.operators.Wordpiece
import org.apache.spark.sql.functions._

/** WordPiece training + greedy encode: the likelihood argmax (the
  * designed difference from BPE's count argmax), max-munch semantics,
  * whole-word UNK, and the continuation-prefix sentinel guard.
  */
class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  test("baseSymbols: first plain, continuations ##-prefixed, per code point") {
    assert(Wordpiece.baseSymbols("abc") == Seq("a", "##b", "##c"))
    // a supplementary-plane char is ONE symbol
    val w = "a😀b"
    assert(Wordpiece.baseSymbols(w) == Seq("a", "##😀", "##b"))
  }

  test("training argmax is the likelihood score, not the raw pair count") {
    // pair (a,##b) has count 6 but symbol a is inflated to 26 by the
    // standalone 'a' words → score 6/(26·6); pair (c,##d) has count
    // only 4 but score 4/(4·4) — WordPiece must pick (c,##d) first,
    // where BPE's count argmax would pick (a,##b)
    val corpus = (Seq.fill(6)("ab") ++ Seq.fill(4)("cd") ++ Seq.fill(20)("a"))
      .mkString(" ")
    val docs = Seq((1L, corpus)).toDF("doc_id", "text")
    val m = Wordpiece.train(docs, "text", numMerges = 1)
    assert(m.map(x => (x.left, x.right)) == Seq(("c", "##d")))
    assert(m.head.cnt == 4L)
    assert(m.head.score == 4.0 / (4.0 * 4.0))
  }

  test("merge fuses continuations correctly and chains into longer pieces") {
    // "abc" x 5: merge 1 fuses the best-scoring pair, merge 2 chains it
    val docs = Seq((1L, Seq.fill(5)("abc").mkString(" "))).toDF("doc_id", "text")
    val ms = Wordpiece.train(docs, "text", numMerges = 2)
    // all pairs score 5/(5·5) — ties break (left, right) lexicographic:
    // (##b,##c) < (a,##b), so merge 1 = ##b+##c = ##bc, then (a,##bc)
    assert(ms.map(x => (x.left, x.right)) ==
      Seq(("##b", "##c"), ("a", "##bc")))
    assert(Wordpiece.fuse("##b", "##c") == "##bc")
    assert(Wordpiece.fuse("a", "##bc") == "abc")
    val pieces = Wordpiece.trainedPieces(docs, "text", ms)
    assert(pieces.contains("abc") && pieces.contains("##bc"))
  }

  test("encodeWord: greedy max-munch, not merge replay") {
    val pieces = Set("a", "ab", "abc", "##c", "##bc", "##d")
    def enc(w: String) = Wordpiece.encodeWord(w, pieces, 3)
    assert(enc("abc") == Seq("abc"))          // longest first-piece wins
    assert(enc("abcc") == Seq("abc", "##c"))  // then continuations
    assert(enc("abcd") == Seq("abc", "##d"))
    assert(enc("a") == Seq("a"))
    // 'x' matches nothing → the WHOLE word is [UNK], even though 'a'
    // would have matched the prefix
    assert(enc("ax") == Seq(Wordpiece.Unk))
    assert(enc("x") == Seq(Wordpiece.Unk))
  }

  test("tokenize: word order preserved, empty text yields no tokens") {
    val pieces = Seq("a", "ab", "##c")
    val docs = Seq((1L, " ab  ac a "), (2L, ""), (3L, "zz"))
      .toDF("doc_id", "text")
    val got = Wordpiece.tokenize(docs, "doc_id", "text", pieces)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("ab", "a", "##c", "a"))
    assert(got(2L) == Seq.empty)
    assert(got(3L) == Seq(Wordpiece.Unk))
  }

  test("a first-position piece spelled '##…' is refused (sentinel collision)") {
    // a word starting "##" would fuse '#'+'###' into the first-position
    // piece "##" — indistinguishable from a continuation spelling
    val docs = Seq((1L, Seq.fill(3)("##").mkString(" "))).toDF("doc_id", "text")
    val ms = Wordpiece.train(docs, "text", numMerges = 1)
    assert(ms.nonEmpty)
    val e = intercept[IllegalArgumentException] {
      Wordpiece.trainedPieces(docs, "text", ms)
    }
    assert(e.getMessage.contains("continuation prefix"))
    // and the bare prefix itself is not a piece
    val e2 = intercept[IllegalArgumentException] {
      Wordpiece.tokenize(docs, "doc_id", "text", Seq("a", "##"))
    }
    assert(e2.getMessage.contains("not a valid piece"))
  }

  test("train+trainedPieces+tokenize round: every non-UNK token re-spells its word") {
    val docs = Seq((1L, "the cat sat the cat the")).toDF("doc_id", "text")
    val ms = Wordpiece.train(docs, "text", numMerges = 4, minCount = 1L)
    val pieces = Wordpiece.trainedPieces(docs, "text", ms)
    val toks = Wordpiece.tokenize(docs, "doc_id", "text", pieces)
      .select(explode(col("tokens")).as("t")).as[String].collect()
    // the alphabet covers the corpus, so no UNK can appear
    assert(!toks.contains(Wordpiece.Unk))
    // stripping ## and rejoining reconstructs the text's words
    val rebuilt = toks.map(_.stripPrefix("##")).mkString
    assert(rebuilt == "thecatsatthecatthe")
  }
}
