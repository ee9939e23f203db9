package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Gopher/MassiveText document-quality rule battery (Rae et al.
  * 2021, table A1 — the filter set every later corpus pipeline
  * inherits; no reference analog, SURVEY.md §2.11 LLM-pipeline
  * surface). Complements the existing signals ([[graft.functions
  * .TextAnalysis]] ratios, q84's shingle repetition, the trainable
  * classifier): these are the FORMAT rules — duplicate lines, bullet
  * and ellipsis lines, symbol noise, non-alphabetic words, stopword
  * presence — plus the composed pass/fail verdict.
  *
  * Scale design: word-level signals are pure array expressions over the
  * tokenized text (codegen, no shuffle); line-level signals (duplicate
  * line fraction, duplicated-line CHAR fraction) go through ONE
  * explode → (doc, line) count → per-doc fold — the aggregation is
  * map-side partial and never materializes an O(lines²) comparison, so
  * a 100 k-line document costs O(lines), not the quadratic array-filter
  * equivalent. One equi-join stitches the two sides back together.
  *
  * "Lines" here are sentence-grade segments (split on ". ") — the
  * engine's documents corpus is single-line prose, and the rule
  * semantics only need SOME stable segmentation; a newline-segmented
  * corpus passes its real lines through the same machinery by changing
  * `lineSep`.
  */
object GopherFilter {

  /** Gopher's stopword-presence list: a document should contain at
    * least [[MinStopwords]] distinct words from this set.
    */
  val Stopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  val MinStopwords = 2

  /** Whitespace tokens, empties dropped (leading/trailing split
    * artifacts would otherwise skew every per-word ratio).
    */
  def words(text: Column): Column =
    filter(split(trim(text), "\\s+"), w => w =!= "")

  /** Per-document signals + verdict.
    *
    * @return `idCol, n_words, mean_word_len, alpha_frac, symbol_ratio,
    *         n_stop, n_lines, dup_line_frac, dup_line_char_frac,
    *         bullet_frac, ellipsis_frac, pass` — fractions rounded to
    *         6 (mean word length 4) so results hash-compare across
    *         engines; `pass` is 1/0 (BIGINT travels better than BOOLEAN
    *         through parquet→oracle compares).
    */
  def signals(df: DataFrame, idCol: String, textCol: String,
      lineSep: String = "\\. "): DataFrame = {
    val w = words(col(textCol))
    val nWords = size(w).cast("long")
    val meanLen = when(nWords > 0,
      aggregate(transform(w, x => length(x)), lit(0), (a, x) => a + x)
        .cast("double") / nWords.cast("double"))
    val alphaFrac = when(nWords > 0,
      size(filter(w, x => x.rlike("[A-Za-z]"))).cast("double") /
        nWords.cast("double"))
    // symbol noise: '#' characters and '...' runs per word (Gopher's
    // symbol-to-word ratio)
    val hashes = length(col(textCol)) -
      length(replace(col(textCol), lit("#"), lit("")))
    val dots = (length(col(textCol)) -
      length(replace(col(textCol), lit("..."), lit("")))) / 3
    val symbolRatio = when(nWords > 0,
      (hashes + dots).cast("double") / nWords.cast("double"))
    val wLower = transform(w, x => lower(x))
    val nStop = Stopwords.map(s =>
      when(array_contains(wLower, s), 1L).otherwise(0L)).reduce(_ + _)

    val segs = filter(transform(split(col(textCol), lineSep), s => trim(s)),
      s => s =!= "")
    val bulletFrac = when(size(segs) > 0,
      size(filter(segs, s =>
        s.startsWith("- ") || s.startsWith("* ") || s.startsWith("•")))
        .cast("double") / size(segs).cast("double"))
    val ellipsisFrac = when(size(segs) > 0,
      size(filter(segs, s =>
        s.endsWith("...") || s.endsWith("…")))
        .cast("double") / size(segs).cast("double"))

    val wordSide = df.select(col(idCol),
      nWords.as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(alphaFrac, 6).as("alpha_frac"),
      round(symbolRatio, 6).as("symbol_ratio"),
      nStop.as("n_stop"),
      round(bulletFrac, 6).as("bullet_frac"),
      round(ellipsisFrac, 6).as("ellipsis_frac"))

    // line-duplication side: ONE explode, count per (doc, line), fold
    val perLine = df.select(col(idCol), explode(segs).as("__line"))
      .groupBy(col(idCol), col("__line"))
      .agg(count(lit(1)).as("__n"), length(col("__line")).as("__len"))
    val lineStats = perLine.groupBy(col(idCol))
      .agg(sum(col("__n")).as("n_lines"),
        count(lit(1)).as("__distinct"),
        sum(col("__n") * col("__len")).as("__chars"),
        sum(when(col("__n") > 1, col("__n") * col("__len"))
          .otherwise(0L)).as("__dup_chars"))
      .select(col(idCol), col("n_lines"),
        round(lit(1.0d) - col("__distinct").cast("double") /
          col("n_lines").cast("double"), 6).as("dup_line_frac"),
        round(when(col("__chars") > 0,
          col("__dup_chars").cast("double") / col("__chars").cast("double")),
          6).as("dup_line_char_frac"))

    val joined = wordSide.join(lineStats, Seq(idCol), "left")
      .withColumn("n_lines", coalesce(col("n_lines"), lit(0L)))
    joined.withColumn("pass", gopherPass(joined).cast("long"))
      .select(col(idCol), col("n_words"), col("mean_word_len"),
        col("alpha_frac"), col("symbol_ratio"), col("n_stop"),
        col("n_lines"), col("dup_line_frac"), col("dup_line_char_frac"),
        col("bullet_frac"), col("ellipsis_frac"), col("pass"))
  }

  /** The composed Gopher verdict over [[signals]] columns — published
    * MassiveText bounds except the word-count floor (Gopher's 50 →
    * kept at 50; callers tune per corpus).
    */
  def gopherPass(s: DataFrame): Column =
    s("n_words").between(50L, 100000L) &&
      s("mean_word_len").between(3.0d, 10.0d) &&
      s("symbol_ratio") < 0.1d &&
      s("alpha_frac") > 0.8d &&
      s("n_stop") >= MinStopwords.toLong &&
      coalesce(s("dup_line_frac") < 0.3d, lit(true)) &&
      coalesce(s("dup_line_char_frac") < 0.2d, lit(true)) &&
      coalesce(s("bullet_frac") < 0.9d, lit(true)) &&
      coalesce(s("ellipsis_frac") < 0.3d, lit(true))

  // ------------------------------------------------------- readability

  /** Flesch reading ease (Flesch 1948) over the battery's own
    * word/sentence splits, with the classic vowel-group syllable
    * heuristic: syllables(w) = max(1, vowel runs − 1 if w ends in a
    * silent-ish 'e' and has more than one run). Counts stay EXACT
    * LONGS; the score is the one published formula — 206.835 −
    * 1.015·(words/sentences) − 84.6·(syllables/words) — as a single
    * IEEE tree, rounded 4 dp (the q105 rule), NULL when either count
    * is zero (a 0/0 reading-ease differs by engine and ANSI mode).
    * A heuristic, not linguistics — the DOCUMENTED estimator is the
    * contract, and the oracle replays it run for run.
    */
  def fleschSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = filter(split(trim(lower(col(textCol))), "\\s+"), w => w =!= "")
    val segs = filter(
      transform(split(col(textCol), "[.!?]+"), s => trim(s)), s => s =!= "")
    def runs(w: Column) = regexp_count(w, lit("[aeiouy]+")).cast("long")
    val syl = aggregate(ws, lit(0L), (acc, w) =>
      acc + greatest(lit(1L),
        runs(w) - when(endswith(w, lit("e")) && runs(w) > 1, 1L).otherwise(0L)))
    df.select(col(idCol),
        size(ws).cast("long").as("n_words"),
        size(segs).cast("long").as("n_sentences"),
        syl.as("n_syllables"))
      .withColumn("flesch",
        when(col("n_words") > 0 && col("n_sentences") > 0,
          round(lit(206.835) -
            lit(1.015) * (col("n_words").cast("double") / col("n_sentences").cast("double")) -
            lit(84.6) * (col("n_syllables").cast("double") / col("n_words").cast("double")),
            4)))
  }
}
