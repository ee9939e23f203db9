package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Document chunking for context-window-bounded consumers: split each
  * document into overlapping token windows (size `chunkSize`, stride
  * `chunkSize - overlap`), the standard pre-tokenization step of an LLM
  * training/embedding pipeline. No reference analog (extension surface per
  * SURVEY.md §2.11).
  *
  * Narrow plan: tokenize → explode the window starts → slice. No shuffle
  * at all — chunking parallelizes embarrassingly at any corpus size, and
  * output order inside a document is the deterministic `chunk_idx`.
  * Trailing chunks shorter than `chunkSize` are kept (the tail of a
  * document is still data); a document shorter than one window yields
  * exactly one chunk.
  */
object Chunking {

  def chunkByTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(1), size(col("__toks")), lit(stride)))
          .as(Seq("__pos", "__start")))
      .select(col(idCol), col("__pos").cast("long").as("chunk_idx"),
        expr(s"slice(__toks, __start, $chunkSize)").as("__chunk"))
      .select(col(idCol), col("chunk_idx"),
        size(col("__chunk")).cast("long").as("n_tokens"),
        concat_ws(" ", col("__chunk")).as("chunk_text"))
  }
}
