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
}
