package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → training text extraction — the first pass of every web-corpus
  * pipeline (no reference analog; SURVEY.md §2.11 LLM-pipeline surface.
  * The reference ingests OPC telemetry, but a corpus engine's raw input
  * is crawled HTML, and "strip the markup, keep the prose" has to run
  * INSIDE the engine to avoid a second pass over 100 TB).
  *
  * Design: every function here is a pure [[Column]] expression built
  * from `regexp_replace` / `regexp_extract_all` / `replace` — so the
  * whole chain stays inside whole-stage codegen (no UDF, no
  * mapPartitions), pushes through partition pruning like any projection,
  * and is exactly replayable in an external SQL engine (the q215/q216
  * oracles run the identical chain in DuckDB's RE2 dialect; the regexes
  * below deliberately use only syntax Java and RE2 share: `(?is)`
  * flags, non-greedy `.*?`, character classes — no lookaround, no
  * backreferences).
  *
  * Extraction model (regex-grade, like the C4 pipeline's original
  * extractor — NOT a browser-grade DOM parser):
  *   - `<script>`/`<style>` elements and `<!-- -->` comments drop with
  *     their CONTENT;
  *   - block-level tags become line breaks (so "<p>a</p><p>b</p>"
  *     keeps a/b on separate lines — structure the quality filters
  *     downstream need);
  *   - remaining tags strip; the common named entities decode
  *     (`&amp;` LAST, per the standard, so "&amp;lt;" yields the
  *     literal "&lt;");
  *   - whitespace normalizes (runs of spaces collapse, every run of
  *     block breaks collapses to ONE newline — each output line is a
  *     block, the shape the line-level quality filters expect —
  *     edges trim).
  *
  * Documented limits (the standard regex-extractor caveats): an
  * attribute VALUE containing a literal `>` splits its tag early; a
  * CDATA section without an embedded `>` strips as one opaque tag;
  * numeric character references (`&#NNN;`) pass through undecoded.
  * Real-world rate of all three is low and none of them reorders
  * surviving prose.
  */
object HtmlExtract {

  /** Drop elements whose content must not surface as text, with their
    * bodies: script, style, comments. Case-insensitive, dot-matches-all,
    * non-greedy so adjacent elements don't fuse.
    */
  def stripNonContent(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", "")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", "")
    regexp_replace(noStyle, "(?s)<!--.*?-->", "")
  }

  private val blockTags =
    "p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|blockquote|title|" +
      "section|article|header|footer|nav|form|pre"

  /** Opening/closing block-level tags become newlines BEFORE the generic
    * tag strip, so block structure survives as line structure.
    */
  def blockBreaks(html: Column): Column =
    regexp_replace(html, s"(?is)</?($blockTags)(\\s[^>]*)?>", "\n")

  /** Remove every remaining tag (inline markup: a, span, b, em, ...). */
  def stripTags(html: Column): Column =
    regexp_replace(html, "(?s)<[^>]*>", "")

  /** Decode the common named entities. `&amp;` decodes LAST: the
    * escaped-escape "&amp;lt;" must yield the literal text "&lt;", not
    * a second round of decoding.
    */
  def decodeEntities(text: Column): Column = {
    val steps: Seq[(String, String)] = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ",
      "&amp;" -> "&")
    steps.foldLeft(text) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
  }

  /** Whitespace normalization: CR and tab runs become single spaces,
    * spaces around line breaks drop, 2+ line breaks collapse to a single
    * newline (one line per block — the q215 oracle and the object-level
    * contract both encode this; blank lines do NOT survive), edges trim.
    */
  def normalizeWs(text: Column): Column = {
    val sp = regexp_replace(text, "[ \\t\\r]+", " ")
    val tightLines = regexp_replace(sp, " ?\\n ?", "\n")
    // NOT trim(): Spark's (and DuckDB's) trim strips spaces only — the
    // edges here are newlines from boundary block tags
    regexp_replace(
      regexp_replace(tightLines, "\\n{2,}", "\n"), "^\\s+|\\s+$", "")
  }

  /** The full chain: markup in, normalized training prose out. */
  def htmlText(html: Column): Column =
    normalizeWs(decodeEntities(stripTags(blockBreaks(stripNonContent(html)))))

  /** Document title: first `<title>` element's decoded, trimmed text
    * (empty string when absent — callers filter, not null-check).
    */
  def htmlTitle(html: Column): Column =
    trim(decodeEntities(
      regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)))

  /** Every double-quoted href value, in document order (the outlink
    * list — dedup/normalize downstream with
    * [[graft.functions.UrlFunctions]]).
    */
  def htmlLinks(html: Column): Column =
    regexp_extract_all(html, lit("(?is)href=\"([^\"]*)\""), lit(1))

  /** Anchor-text character count: the length of the tag-stripped text
    * inside `<a>...</a>` elements. The numerator of [[linkDensity]].
    */
  def anchorChars(html: Column): Column = {
    val anchors = regexp_extract_all(
      stripNonContent(html), lit("(?is)<a[^>]*>(.*?)</a>"), lit(1))
    aggregate(
      transform(anchors, a =>
        length(decodeEntities(regexp_replace(a, "(?s)<[^>]*>", "")))),
      lit(0), (acc, x) => acc + x)
  }

  /** Link density = anchor-text chars / total extracted-text chars —
    * THE classic boilerplate signal (boilerpipe/jusText): navigation
    * and footer blocks are mostly links, prose is mostly not. Null when
    * the page extracts to empty text.
    */
  def linkDensity(html: Column): Column = {
    val total = length(htmlText(html))
    when(total > 0, anchorChars(html).cast("double") / total.cast("double"))
  }
}
