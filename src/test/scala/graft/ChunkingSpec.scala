package graft

import graft.operators.Chunking

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunkByTokens windows with overlap and keeps the short tail") {
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    // size 4, overlap 2 → stride 2: starts 1,3,5,7,9
    val got = Chunking.chunkByTokens(df, "doc_id", "text", chunkSize = 4, overlap = 2)
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_tokens", "chunk_text")
      .as[(Long, Long, String)].collect()
    assert(got.length === 5)
    assert(got(0) === ((0L, 4L, "t1 t2 t3 t4")))
    assert(got(1) === ((1L, 4L, "t3 t4 t5 t6")))
    assert(got(4) === ((4L, 2L, "t9 t10"))) // trailing partial chunk kept
  }

  test("a document shorter than one window yields exactly one chunk") {
    val df = Seq((1L, "only three tokens")).toDF("doc_id", "text")
    val got = Chunking.chunkByTokens(df, "doc_id", "text", chunkSize = 32, overlap = 8)
      .select("chunk_idx", "n_tokens", "chunk_text")
      .as[(Long, Long, String)].collect()
    assert(got.toSeq === Seq((0L, 3L, "only three tokens")))
  }

  test("dropping each chunk's overlap reconstructs the token stream exactly") {
    // lossless-coverage invariant over a sweep of lengths incl. edge cases
    // around multiples of the stride
    for (n <- Seq(1, 2, 7, 23, 24, 25, 47, 48, 49, 100)) {
      val toks = (1 to n).map("t" + _)
      val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val chunks = Chunking.chunkByTokens(df, "doc_id", "text", chunkSize = 32, overlap = 8)
        .orderBy("chunk_idx").select("chunk_text").as[String].collect()
        .map(_.split(" ").toSeq)
      val rebuilt = chunks.head ++ chunks.tail.flatMap(_.drop(8))
      assert(rebuilt === toks, s"n=$n")
    }
  }

  test("consecutive chunks overlap by exactly `overlap` tokens") {
    val df = Seq((1L, (1 to 100).map("w" + _).mkString(" "))).toDF("doc_id", "text")
    val chunks = Chunking.chunkByTokens(df, "doc_id", "text", chunkSize = 10, overlap = 3)
      .orderBy("chunk_idx").select("chunk_text").as[String].collect()
      .map(_.split(" ").toSeq)
    chunks.sliding(2).foreach {
      case Array(a, b) =>
        val ov = math.min(3, b.length) // tail chunk may be shorter than the overlap
        assert(a.takeRight(ov) === b.take(ov))
      case _ =>
    }
  }

  test("contentDefinedChunks: boundaries re-derive by brute force; chunks cover the text") {
    val rnd = new scala.util.Random(7)
    val text = (1 to 120).map(_ => "abcdefgh nopqrs tuv "(rnd.nextInt(20))).mkString
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val got = Chunking.contentDefinedChunks(df, "doc_id", "text", 16, 8, 4)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start", "len", "chunk_hash")
      .as[(Int, Long, Long, Long)].collect()
    // exact cover, in order, no gaps
    assert(got.head._2 == 1L)
    got.sliding(2).foreach {
      case Array(a, b) => assert(b._2 == a._2 + a._3, s"gap between $a and $b")
      case _ =>
    }
    assert(got.last._2 + got.last._3 - 1 == text.length.toLong)
    // brute-force re-derivation: window hash % 8 == 0 with the min-len fold
    def rh2(s: String): Long = {
      var h = s.head.toLong
      for (c <- s.tail) h = (h * 31 + c) % 1000000007L
      h
    }
    val cands = (16 to text.length).filter(i => rh2(text.substring(i - 16, i)) % 8 == 0)
    val accepted = cands.foldLeft(List(0L)) { (acc, i) =>
      if (i - acc.head >= 4) i.toLong :: acc else acc
    }.reverse.tail
    val expEnds = if (accepted.lastOption.contains(text.length.toLong)) accepted
      else accepted :+ text.length.toLong
    assert(got.map(c => c._2 + c._3 - 1).toSeq == expEnds, "rolling vs brute-force bounds")
    // every non-tail chunk respects the min length
    got.dropRight(1).foreach(c => assert(c._3 >= 4L, s"chunk $c below minLen"))
    // chunk hashes are the rolling hash of the chunk text
    got.foreach { c =>
      assert(c._4 == rh2(text.substring((c._2 - 1).toInt, (c._2 - 1 + c._3).toInt)))
    }
  }

  test("contentDefinedChunks: a prefix insertion only disturbs the first chunk(s)") {
    val rnd = new scala.util.Random(11)
    val base = (1 to 400).map(_ => "the quick brown fox ..,;x"(rnd.nextInt(25))).mkString
    val df = Seq((1L, base), (2L, "INSERTED PREFIX " + base)).toDF("doc_id", "text")
    val chunks = Chunking.contentDefinedChunks(df, "doc_id", "text", 16, 32, 12)
      .select("doc_id", "chunk_hash").as[(Long, Long)].collect()
    val a = chunks.filter(_._1 == 1L).map(_._2).toSet
    val b = chunks.filter(_._1 == 2L).map(_._2).toSet
    // fixed-width chunking shares ZERO chunks after a 16-char shift; CDC
    // re-aligns at the first boundary past the edit and shares the rest
    val shared = (a intersect b).size
    assert(shared >= a.size / 2,
      s"CDC must re-align after an insertion: shared=$shared of ${a.size}")
    // edge: empty and sub-window docs
    val tiny = Chunking.contentDefinedChunks(
      Seq((1L, ""), (2L, "short")).toDF("doc_id", "text"), "doc_id", "text", 16, 32, 12)
      .select("doc_id", "start", "len").as[(Long, Long, Long)].collect()
    assert(!tiny.exists(_._1 == 1L), "empty doc yields no chunks")
    assert(tiny.filter(_._1 == 2L).toSeq == Seq((2L, 1L, 5L)), "whole-doc chunk")
  }

  test("contentDefinedChunks: astral chars don't shift boundaries (code-point space)") {
    // an emoji is 2 UTF-16 units but 1 code point; Spark's length/substr
    // and the boundary hash must agree on ONE index space or every chunk
    // after the first astral char extracts shifted text
    val text = "x😀yz" * 30 // 120 code points, 150 UTF-16 units
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val got = Chunking.contentDefinedChunks(df, "doc_id", "text", 8, 4, 2)
      .orderBy("chunk_idx").select("start", "len").as[(Long, Long)].collect()
    assert(got.head._1 == 1L)
    got.sliding(2).foreach {
      case Array(a, b) => assert(b._1 == a._1 + a._2, s"gap between $a and $b")
      case _ =>
    }
    val cpLen = text.codePointCount(0, text.length).toLong
    assert(got.last._1 + got.last._2 - 1 == cpLen,
      s"chunks must tile the code-point length $cpLen, got ${got.toSeq}")
  }
}
