package graft

import graft.operators.{Bpe, ByteBpe}

/** Byte-level BPE: the published byte↔unicode bijection pinned, the
  * classic low/lower trajectory, lossless round trips over multi-byte
  * UTF-8 (the no-UNK property that makes byte-level the shipped
  * variant), and id-space injectivity.
  */
class ByteBpeSpec extends SparkSpec {

  test("byte↔unicode table is the published construction") {
    val m = ByteBpe.byteToChar
    // printable ranges map to themselves
    assert(m(97) == 'a' && m(33) == '!' && m(126) == '~' && m(255) == 'ÿ')
    assert(m(161) == '¡' && m(174) == '®')
    // the 68 non-printables map to 256.. in byte order
    assert(m(0) == 256.toChar)
    assert(m(10) == 266.toChar) // \n
    assert(m(32) == 'Ġ') // space — U+0120
    assert(m(127) == 289.toChar)
    assert(m(160) == 322.toChar)
    assert(m(173) == 323.toChar)
    // bijection: 256 distinct chars, inverse round-trips
    assert(m.distinct.length == 256)
    (0 until 256).foreach(b => assert(ByteBpe.charToByte(m(b)) == b))
  }

  test("pretokenize: piece 0 bare, later pieces carry their space") {
    assert(ByteBpe.pretokenize("  low  lower went ") ==
      Seq("low", " lower", " went"))
    assert(ByteBpe.pretokenize("") == Seq.empty)
    assert(ByteBpe.pretokenize(null) == Seq.empty)
  }

  test("baseSymbols: one symbol per UTF-8 byte, mapped") {
    assert(ByteBpe.baseSymbols(" lo") == Seq("Ġ", "l", "o"))
    // 'é' is 2 UTF-8 bytes (0xC3 0xA9) → two mapped symbols
    assert(ByteBpe.baseSymbols("é").length == 2)
    // '☃' is 3 UTF-8 bytes
    assert(ByteBpe.baseSymbols("☃").length == 3)
  }

  test("classic trajectory: low low low lower") {
    val s = spark
    import s.implicits._
    val docs = Seq("low low low lower").toDF("text")
    val merges = ByteBpe.train(docs, "text", numMerges = 5, minCount = 2L)
    // pieces: low×1, ' low'×2, ' lower'×1 → lo=4 ties ow=4 (left lex
    // wins), then low=4, then Ġ+low=3, then nothing reaches 2
    assert(merges == Seq(
      Bpe.Merge("l", "o", 4), Bpe.Merge("lo", "w", 4),
      Bpe.Merge("Ġ", "low", 3)))
  }

  test("tokenize applies merges per piece; merges never span pieces") {
    val s = spark
    import s.implicits._
    val merges = Seq(Bpe.Merge("l", "o", 4), Bpe.Merge("lo", "w", 4),
      Bpe.Merge("Ġ", "low", 3))
    val docs = Seq((1L, "low low slow")).toDF("doc_id", "text")
    val toks = ByteBpe.tokenize(docs, "doc_id", "text", merges)
      .collect().head.getSeq[String](1)
    // 'slow' contains 'low' mid-piece → 's' + 'low' (merge applies),
    // but the PIECE-initial Ġ of ' slow' must not fuse with the
    // previous piece's final token
    assert(toks == Seq("low", "Ġlow", "Ġ", "s", "low"))
  }

  test("round trip is lossless over multi-byte UTF-8 — the no-UNK property") {
    val s = spark
    import s.implicits._
    val merges = Seq(Bpe.Merge("l", "o", 4), Bpe.Merge("lo", "w", 4))
    val text = "héllo ☃ low  Ġ  weird"
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    val back = ByteBpe.detokenize(
      ByteBpe.tokenizeIds(docs, "doc_id", "text", merges), merges)
      .collect().head.getString(1)
    // == whitespace-normalized source. Literal 'Ġ' in the SOURCE
    // survives: its UTF-8 bytes (0xC4 0xA0) are data, never the space
    // marker (byte-space has no sentinel ambiguity by construction).
    assert(back == text.trim.replaceAll("\\s+", " "))
  }

  test("empty and whitespace-only docs round trip to empty") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val back = ByteBpe.detokenize(
      ByteBpe.tokenizeIds(docs, "doc_id", "text", Seq.empty), Seq.empty)
      .orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(back == Seq("", ""))
  }

  test("token ids: bytes 0..255 are themselves, merge k is 256+k; injective") {
    val merges = Seq(Bpe.Merge("l", "o", 4), Bpe.Merge("lo", "w", 4))
    val ids = ByteBpe.tokenIdMap(merges)
    assert(ids == Map("lo" -> 256, "low" -> 257))
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "low!")).toDF("doc_id", "text")
    val got = ByteBpe.tokenizeIds(docs, "doc_id", "text", merges)
      .collect().head.getSeq[Int](1)
    assert(got == Seq(257, 33)) // 'low' merged, '!' = byte 33
  }

  test("duplicate merge results are refused") {
    val e = intercept[IllegalArgumentException](ByteBpe.tokenIdMap(
      Seq(Bpe.Merge("l", "o", 4), Bpe.Merge("l", "o", 3))))
    assert(e.getMessage.contains("repeats"))
  }
}
