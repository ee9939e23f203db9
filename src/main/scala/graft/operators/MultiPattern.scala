package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aho-Corasick multi-pattern literal scan (Aho & Corasick, CACM 1975)
  * — the blocklist/leak-term/contamination-marker scanner for corpus
  * curation: find and count every occurrence of every pattern in one
  * O(text) pass per document, INDEPENDENT of pattern count. The
  * regex-based PII pass (q145) covers structured patterns; this covers
  * the 10^4-literal blocklist, where per-pattern `contains` scans (or a
  * union regex) cost O(patterns × text) and die first at 100 TB.
  *
  * No reference analog (SURVEY.md §2.11 surface).
  *
  * Spark shape: the automaton is built ONCE on the driver from the
  * (small, bounded — require'd) pattern list and ships to executors by
  * closure broadcast; scanning is a narrow `mapPartitions` — no
  * shuffle, no per-pattern passes. Match semantics: OVERLAPPING
  * occurrences (every end position where a pattern matches counts), the
  * automaton's natural output and exactly replayable in SQL as a
  * per-position substring probe (q234's oracle).
  */
object MultiPattern {

  /** Trie + failure links + output links, flattened to arrays. Build is
    * O(total pattern length × alphabet-as-hashmap); the scan touches
    * `goto` via per-node hash maps — fine for curation blocklists
    * (thousands of entries); a byte-alphabet dense table is the obvious
    * refinement if profiles ever demand it.
    */
  final class Automaton private[MultiPattern] (
      gotoFn: Array[scala.collection.mutable.HashMap[Char, Int]],
      fail: Array[Int],
      out: Array[Array[Int]],
      val nPatterns: Int) extends Serializable {

    /** Overlapping occurrence count per pattern index. */
    def count(text: String): Array[Int] = {
      val counts = new Array[Int](nPatterns)
      var node = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (node != 0 && !gotoFn(node).contains(c)) node = fail(node)
        node = gotoFn(node).getOrElse(c, 0)
        val o = out(node)
        var j = 0
        while (j < o.length) { counts(o(j)) += 1; j += 1 }
        i += 1
      }
      counts
    }
  }

  /** Build the automaton. Patterns must be non-empty and distinct; the
    * list is driver-resident and broadcast, so its size is require-bounded.
    */
  def automaton(patterns: Seq[String]): Automaton = {
    require(patterns.nonEmpty, "empty pattern list")
    require(patterns.forall(_.nonEmpty), "empty-string pattern")
    require(patterns.distinct.size == patterns.size, "duplicate patterns")
    require(patterns.map(_.length.toLong).sum <= 10_000_000L,
      "pattern set too large to broadcast as an automaton")
    val gotoFn = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Char, Int])
    val outB = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    // trie
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { c =>
        node = gotoFn(node).getOrElseUpdate(c, {
          gotoFn += scala.collection.mutable.HashMap.empty[Char, Int]
          outB += Nil
          gotoFn.size - 1
        })
      }
      outB(node) = pi :: outB(node)
    }
    // BFS failure links; output links flatten through the fail chain so
    // the scan never walks it (every match is already on its end node)
    val fail = new Array[Int](gotoFn.size)
    val queue = scala.collection.mutable.Queue.empty[Int]
    gotoFn(0).values.foreach { v => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      gotoFn(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !gotoFn(f).contains(c)) f = fail(f)
        fail(v) = if (gotoFn(f).contains(c) && gotoFn(f)(c) != v) gotoFn(f)(c) else 0
        outB(v) = outB(v) ++ outB(fail(v))
        queue += v
      }
    }
    new Automaton(gotoFn.toArray, fail, outB.map(_.toArray).toArray, patterns.size)
  }

  val matchSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("pattern", StringType, nullable = false),
    StructField("n_matches", LongType, nullable = false)))

  /** Scan `(idCol: long, textCol: string)` against the pattern list:
    * one row per (document, pattern) with a POSITIVE overlapping
    * occurrence count (zero-count pairs are omitted — emitting the
    * docs × patterns zero matrix would be the scan's own blowup).
    */
  def countMatches(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val ac = automaton(patterns)
    val pats = patterns.toArray
    val prepared = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
    val enc = RowEncoder.encoderFor(matchSchema)
    prepared.mapPartitions { it =>
      it.flatMap { r =>
        val counts = ac.count(r.getString(1))
        val id = r.getLong(0)
        counts.indices.iterator.filter(counts(_) > 0)
          .map(i => Row(id, pats(i), counts(i).toLong))
      }
    }(enc)
  }
}
