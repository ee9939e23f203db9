package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TextAnalysis}
import graft.operators.{Apng, Bpe, ByteBpe, Curation, Dedup, Multimodal, RangeJoin, SimilaritySearch}
import Q.t

/** The LLM-data-pipeline query inventory over `documents`/`embeddings`
  * (SURVEY.md §2.11): dedup (exact, MinHash-LSH, SimHash), similarity
  * search, text analysis, multimodal plumbing — each with a DuckDB oracle
  * where the semantics are SQL-expressible.
  *
  * Shared primitive: the 60-bit md5-prefix hash ([[Dedup.hash60]]),
  * `('0x' || substr(md5(x), 1, 15))::BIGINT` on the DuckDB side.
  */
object ExtendedQueries {

  /** Stopword list shared by the Spark impls and oracle SQL below. */
  val Stop: Seq[String] = Seq("the", "a", "of", "and", "is", "in", "to")
  private val stopSql = Stop.map(s => s"'$s'").mkString(", ")

  /** DuckDB SQL for per-doc distinct 3-word shingles (mirrors
    * [[Dedup.shingles]]). `private[queries]`: PipelineQueries' end-to-end
    * dedup oracle (q108) reuses the same chain.
    */
  private[queries] val shinglesCte =
    """words AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
      |        FROM words WHERE len(w) >= 3))""".stripMargin

  /** DuckDB SQL replicating the full MinHash-LSH pipeline (12 hashes,
    * 4 rows/band — mirrors [[Dedup.nearDupPairsMinHash]]'s defaults) up
    * through candidate verification: `inter` has (id1, id2, i = shingle
    * intersection) for every banded candidate, `sizes` the per-doc shingle
    * counts. Shared by q34's pair oracle and q108's end-to-end dedup
    * oracle.
    */
  /** shingles + signatures + band keys — shared by the all-pairs oracle
    * ([[minhashCtes]]) and q166's incremental-probe oracle.
    */
  private[queries] val sigBandsCtes: String =
    s"""$shinglesCte,
       |sig AS (
       |  SELECT doc_id, seed,
       |    min((('0x' || substr(md5(shingle), 1, 10))::BIGINT
       |       + seed * ('0x' || substr(md5('~' || shingle), 1, 10))::BIGINT)
       |      % 1099511627776) AS mh
       |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 11)) AS seed)
       |  GROUP BY doc_id, seed),
       |bands AS (
       |  SELECT doc_id, seed // 4 AS band,
       |    string_agg(mh::VARCHAR, ',' ORDER BY seed) AS bkey
       |  FROM sig GROUP BY doc_id, band)""".stripMargin

  private[queries] val minhashCtes: String =
    s"""$sigBandsCtes,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.id1, c.id2, count(*) AS i
       |  FROM cand c
       |  JOIN sh s1 ON s1.doc_id = c.id1
       |  JOIN sh s2 ON s2.doc_id = c.id2 AND s2.shingle = s1.shingle
       |  GROUP BY c.id1, c.id2)""".stripMargin

  /** DuckDB SQL computing per-doc `bits`-wide SimHash (mirrors
    * [[graft.functions.SimHash32]] / [[graft.functions.SimHash60]]).
    */
  private def simhashCteBits(bits: Int) =
    s"""toks AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
       |  FROM documents),
       |h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
       |votes AS (
       |  SELECT doc_id, b, sum(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS vote
       |  FROM h CROSS JOIN (SELECT unnest(generate_series(0, ${bits - 1})) AS b)
       |  GROUP BY doc_id, b),
       |sig AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN vote > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
       |  FROM votes GROUP BY doc_id)""".stripMargin

  private val simhashCte = simhashCteBits(32)

  /** The q192/q193 axis-sign cell (SimilaritySearch.axisSignCell with
    * nBits = 8) as DuckDB SQL: bit j set iff embedding[j] ≥ 0 — pure
    * sign tests on the stored floats, zero arithmetic, bit-exact across
    * engines. DuckDB lists are 1-based like Spark's element_at.
    */
  private val semCellSql: String =
    (0 until 8).map(j =>
      s"CASE WHEN embedding[${j + 1}] >= 0 THEN ${1 << j} ELSE 0 END")
      .mkString("(", " + ", ")")

  private def sqlHash60(e: String) = s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  /** q204's ranked top-5 set over a vector expression: rank by
    * (cosine rounded to 6 dp DESC, neighbor_id) — the rounding pins
    * ranked SETS across engines at near-ties.
    */
  private def matryoshkaTopSqlVec(vec: String): String =
    s"""SELECT query_id, neighbor_id FROM (
       |    SELECT q.query_id, e.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.query_id ORDER BY
       |        round(list_cosine_similarity((q.embedding$vec)::DOUBLE[], (e.embedding$vec)::DOUBLE[]), 6) DESC,
       |        e.vec_id) AS rk
       |    FROM q JOIN embeddings e ON e.vec_id <> q.query_id) WHERE rk <= 5""".stripMargin
  private val matryoshkaTopSql: String = matryoshkaTopSqlVec("")
  private def matryoshkaTopSqlDim(d: Int): String = matryoshkaTopSqlVec(s"[1:$d]")

  /** q199/q200's INTEGER document features, as matching Spark Column /
    * DuckDB SQL pairs: char count, whitespace-token count, digit count,
    * vowel count — integer-valued by construction, which is what makes
    * the classifier's gradient/margin arithmetic exact cross-engine.
    */
  private def qualityFeatures =
    array(
      col("n_chars").cast("double"),
      size(split(trim(col("text")), "\\s+")).cast("double"),
      (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", "")))
        .cast("double"),
      (length(col("text")) - length(regexp_replace(col("text"), "[aeiou]", "")))
        .cast("double"))
  private val qfSqlF0 = "n_chars::DOUBLE"
  private val qfSqlF1 = """len(string_split_regex(trim(text), '\s+'))::DOUBLE"""
  private val qfSqlF2 =
    """(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE"""
  private val qfSqlF3 =
    """(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')))::DOUBLE"""

  /** The q194/q195 FROZEN merge table: Bpe.train(documents, 16 merges)
    * at sf0.01, replayed here as a literal so tokenization is a pure
    * per-row function (the training trajectory itself is q187 +
    * BpeSpec). Invariant the oracle's string-rewrite replay relies on:
    * no LEFT symbol contains '</w>' (structurally true of any learned
    * BPE table — '</w>'-bearing symbols are word-final, nothing follows
    * them), so a merge pattern can never span a word boundary in the
    * flattened document stream.
    */
  private val bpeFrozenMerges: Seq[Bpe.Merge] = Seq(
    Bpe.Merge("e", "r", 4568), Bpe.Merge("e", "</w>", 4473),
    Bpe.Merge("n", "</w>", 2834), Bpe.Merge("er", "</w>", 2779),
    Bpe.Merge("o", "w", 2747), Bpe.Merge("ow", "</w>", 2747),
    Bpe.Merge("o", "r", 2696), Bpe.Merge("s", "t", 2676),
    Bpe.Merge("h", "</w>", 1884), Bpe.Merge("a", "t", 1845),
    Bpe.Merge("l", "u", 1831), Bpe.Merge("i", "n", 1796),
    Bpe.Merge("a", "</w>", 1788), Bpe.Merge("g", "</w>", 1777),
    Bpe.Merge("y", "</w>", 1767), Bpe.Merge("a", "r", 1758))

  /** DuckDB replay of [[Bpe.tokenize]] under [[bpeFrozenMerges]] as a
    * string-rewrite chain over `text`. Symbol stream encoding: every
    * symbol rides as ' sym ' so adjacent symbols are separated by
    * exactly TWO spaces; word gaps (5 spaces after the per-char wrap)
    * become the ' </w> ' end-of-word symbol; each merge (l, r) is then
    * replace(' l  r ', ' lr ') — string replace's non-overlapping
    * left-to-right scan IS mergeOnce's semantics. The result's tokens
    * are the double-space-separated fields.
    */
  /** The q197 token→id rule as a DuckDB CASE over a lambda variable
    * `x`: mirrors [[Bpe.tokenIdMap]] — bare `</w>` → 0x110000, merge
    * k's result → 0x110001+k, single chars → their code point.
    */
  private val bpeIdCaseSql: String =
    "CASE x WHEN '</w>' THEN 1114112 " +
      bpeFrozenMerges.zipWithIndex.map { case (m, k) =>
        s"WHEN '${m.left}${m.right}' THEN ${1114113 + k}"
      }.mkString(" ") +
      " ELSE unicode(x) END"

  private val bpeChainSql: String = {
    val wrapped = """regexp_replace(regexp_replace(trim(text), '\s+', ' ', 'g'), '(.)', ' \1 ', 'g')"""
    val withEow = s"replace($wrapped, '     ', '  </w>  ') || ' </w> '"
    val chain = bpeFrozenMerges.foldLeft(withEow) { (e, m) =>
      s"replace($e, ' ${m.left}  ${m.right} ', ' ${m.left}${m.right} ')"
    }
    s"trim($chain)"
  }

  /** The q257/q258 FROZEN BYTE-LEVEL merge table: ByteBpe.train
    * (documents, 16 merges) at sf0.01, a literal so tokenization is a
    * pure per-row function (training's trajectory is ByteBpeSpec).
    * 'Ġ' is the mapped space byte (U+0120) — several merges fuse it
    * with a following word-initial char, exactly GPT-2's shape.
    */
  private val byteBpeFrozenMerges: Seq[Bpe.Merge] = Seq(
    Bpe.Merge("Ġ", "s", 5345), Bpe.Merge("e", "r", 4568),
    Bpe.Merge("i", "n", 2760), Bpe.Merge("o", "w", 2747),
    Bpe.Merge("o", "r", 2696), Bpe.Merge("m", "er", 1852),
    Bpe.Merge("a", "t", 1845), Bpe.Merge("l", "u", 1831),
    Bpe.Merge("Ġ", "c", 1826), Bpe.Merge("a", "s", 1801),
    Bpe.Merge("Ġ", "b", 1788), Bpe.Merge("Ġ", "v", 1782),
    Bpe.Merge("a", "r", 1758), Bpe.Merge("p", "ar", 1758),
    Bpe.Merge("Ġ", "f", 1756), Bpe.Merge("Ġ", "a", 1747))

  /** DuckDB replay of [[ByteBpe.tokenize]] under
    * [[byteBpeFrozenMerges]], the q194 double-space rewrite chain
    * adapted to byte space. This corpus is pure ASCII (checked:
    * code points 32..121), so the byte↔unicode map is the identity
    * except ' '→'Ġ' — the ONE mapped replace below. Byte-BPE merges
    * must never span a PIECE boundary (each ` ?\S+` piece tokenizes
    * independently), and in byte space every piece boundary sits
    * immediately before a 'Ġ', so a sentinel token 'ø' (a mapped char
    * that cannot occur in this corpus's symbols) is planted before
    * each 'Ġ', blocks any cross-piece match, and is stripped after
    * the chain.
    */
  private val byteBpeChainSql: String = {
    val mapped =
      """replace(regexp_replace(trim(text), '\s+', ' ', 'g'), ' ', 'Ġ')"""
    val wrapped = "regexp_replace(" + mapped + """, '(.)', ' \1 ', 'g')"""
    val sent = "replace(" + wrapped + ", ' Ġ ', ' ø  Ġ ')"
    val chain = byteBpeFrozenMerges.foldLeft(sent) { (e, m) =>
      s"replace($e, ' ${m.left}  ${m.right} ', ' ${m.left}${m.right} ')"
    }
    s"trim(replace($chain, '  ø  ', '  '))"
  }

  /** WordPiece piece vocabulary frozen from a 16-merge
    * [[Wordpiece.train]] run on this corpus at sf0.01 (alphabet +
    * fused results via [[Wordpiece.trainedPieces]]) — a literal, so
    * q222 is a pure function of the data at any SF; characters outside
    * this alphabet become `[UNK]` identically on both engines.
    */
  private val wpFrozenPieces: Seq[String] =
    ("##a,##b,##bl,##c,##ch,##d,##e,##g,##h,##i,##in,##k,##l,##m,##n," +
      "##o,##p,##r,##s,##sh,##t,##u,##w,##y,a,ag,agg,b,bi,big,c,d,f,fi," +
      "g,h,j,k,l,li,lin,m,o,p,q,qu,r,s,t,th,v,w,wi,win,wind").split(',').toSeq

  private val wpPiecesSql: String =
    wpFrozenPieces.map(p => s"'$p'").mkString("[", ",", "]")

  /** DuckDB replay of [[Wordpiece.tokenize]] under [[wpFrozenPieces]]:
    * greedy max-munch per distinct word as a recursive CTE (LEFT JOIN
    * the piece list at the cursor — first pieces plain, continuations
    * via the ## prefix — and take max_by length; ties impossible), plus
    * the per-doc word fanout. Shared by q222 (token streams) and q227
    * (vocab-coverage audit). Use after `WITH RECURSIVE`; exposes
    * `final(w, toks)` and `docw(doc_id, i, w)`.
    */
  private val wpEncodeCtes: String =
    s"""pieces(p) AS (SELECT unnest($wpPiecesSql)),
      |words AS (SELECT DISTINCT w FROM (
      |    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
      |    FROM documents) t
      |  WHERE w <> ''),
      |step(w, pos, toks, failed) AS (
      |  SELECT w, 1, '', false FROM words
      |  UNION ALL
      |  SELECT t.w,
      |    CASE WHEN t.best IS NULL THEN length(t.w) + 1
      |         ELSE t.pos + length(t.best)
      |              - CASE WHEN t.pos = 1 THEN 0 ELSE 2 END END,
      |    CASE WHEN t.best IS NULL THEN '[UNK]'
      |         WHEN t.toks = '' THEN t.best
      |         ELSE t.toks || ' ' || t.best END,
      |    t.best IS NULL
      |  FROM (
      |    SELECT s.w, s.pos, s.toks, max_by(p.p, length(p.p)) AS best
      |    FROM step s LEFT JOIN pieces p
      |      ON CASE WHEN s.pos = 1
      |              THEN p.p NOT LIKE '##%'
      |                   AND substr(s.w, 1, length(p.p)) = p.p
      |              ELSE p.p LIKE '##%'
      |                   AND substr(s.w, s.pos, length(p.p) - 2)
      |                       = substr(p.p, 3) END
      |    WHERE s.pos <= length(s.w) AND NOT s.failed
      |    GROUP BY s.w, s.pos, s.toks) t),
      |final AS (SELECT w, toks FROM step WHERE pos > length(w)),
      |docw AS (
      |  SELECT doc_id, i, ws[i] AS w FROM (
      |    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
      |    FROM documents) d,
      |    LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) g
      |  WHERE ws[i] <> '')""".stripMargin

  /** DuckDB CTEs shared by the APNG video oracles (q180–q182): the
    * synthetic fixture's canvas dims / frame count / patch dims per
    * document, and the per-frame fanout. Mirrors
    * [[graft.operators.Apng.syntheticApngs]].
    */
  private val apngCtes: String =
    """dims AS (
      |  SELECT doc_id, 9 + doc_id % 8 AS w, 8 + doc_id % 7 AS h,
      |    2 + doc_id % 3 AS f,
      |    (9 + doc_id % 8 + 1) // 2 AS fw, (8 + doc_id % 7 + 1) // 2 AS fh
      |  FROM documents),
      |frames AS (
      |  SELECT d.*, unnest(generate_series(0, f - 1)) AS k FROM dims d)""".stripMargin

  val all: Seq[Q] = Seq(

    // ----------------------------------------------------------- dedup
    Q("q33_exact_dedup",
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Dedup.exactDedup(t(s, d, "documents"), "doc_id", "text")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    },

    Q("q34_minhash_lsh_pairs",
      s"""WITH $minhashCtes
         |SELECT i.id1, i.id2,
         |  round(i.i::DOUBLE / (z1.sz + z2.sz - i.i), 6) AS jaccard
         |FROM inter i
         |JOIN sizes z1 ON z1.doc_id = i.id1
         |JOIN sizes z2 ON z2.doc_id = i.id2
         |WHERE i.i::DOUBLE / (z1.sz + z2.sz - i.i) >= 0.5
         |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      Dedup.nearDupPairsMinHash(t(s, d, "documents"), "doc_id", "text",
          shingleK = 3, numHashes = 12, rowsPerBand = 4, threshold = 0.5)
        .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id1", "id2")
    },

    Q("q166_incremental_neardup",
      // INCREMENTAL near-dup — the production ingest shape: documents
      // with doc_id % 5 = 0 arrive as a new batch and probe the LSH
      // index of the other 80% by band-key equi-join; the corpus never
      // self-joins and is never re-banded. matched_id is a corpus doc or
      // an EARLIER same-batch doc (the batch self-dedups in the same
      // pass). The oracle recomputes bands for everything and keeps
      // exactly the pairs whose candidate involves a new doc, oriented
      // (new, matched).
      s"""WITH $sigBandsCtes,
         |cand AS (
         |  SELECT DISTINCT
         |    CASE WHEN b.doc_id % 5 = 0 THEN b.doc_id ELSE a.doc_id END AS new_id,
         |    CASE WHEN b.doc_id % 5 = 0 THEN a.doc_id ELSE b.doc_id END AS matched_id
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         |  WHERE a.doc_id % 5 = 0 OR b.doc_id % 5 = 0),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT c.new_id, c.matched_id, count(*) AS i
         |  FROM cand c
         |  JOIN sh s1 ON s1.doc_id = c.new_id
         |  JOIN sh s2 ON s2.doc_id = c.matched_id AND s2.shingle = s1.shingle
         |  GROUP BY c.new_id, c.matched_id)
         |SELECT i.new_id, i.matched_id,
         |  round(i.i::DOUBLE / (z1.sz + z2.sz - i.i), 6) AS jaccard
         |FROM inter i
         |JOIN sizes z1 ON z1.doc_id = i.new_id
         |JOIN sizes z2 ON z2.doc_id = i.matched_id
         |WHERE i.i::DOUBLE / (z1.sz + z2.sz - i.i) >= 0.5
         |ORDER BY new_id, matched_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val index = Dedup.buildLshIndex(
        docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text")
      Dedup.incrementalNearDups(index,
          docs.filter(col("doc_id") % 5 === 0), "doc_id", "text")
        .select(col("new_id"), col("matched_id"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy("new_id", "matched_id")
    },

    Q("q58_dup_clusters",
      // connected components over a pair graph — the cluster-assignment
      // step downstream of every near-dup pair pipeline. The pair graph
      // here is chosen for oracle checkability: consecutive orders of each
      // customer form a path, so the true component of an order is
      // "all orders of its customer" and the min label is the customer's
      // min order key — trivially SQL-expressible, while the Spark side
      // must genuinely propagate labels along the path (diameter = orders
      // per customer).
      """WITH m AS (
        |  SELECT o_custkey, min(o_orderkey) AS c, count(*) AS n
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_orderkey AS id, m.c AS cluster
        |FROM orders JOIN m USING (o_custkey)
        |WHERE m.n >= 2 ORDER BY id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      val pairs = t(s, d, "orders")
        .select(col("o_orderkey").as("id2"),
          lag("o_orderkey", 1).over(w).as("id1"))
        .filter(col("id1").isNotNull)
        .select("id1", "id2")
      Dedup.dupClusters(pairs)
        .select(col("id").as("id"), col("cluster").as("cluster"))
        .orderBy("id")
    },

    Q("q35_simhash_signatures",
      s"""WITH $simhashCte
         |SELECT doc_id, simhash FROM sig ORDER BY doc_id""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      t(s, d, "documents")
        .select(col("doc_id"),
          GraftFunctions.simhash32(TextAnalysis.tokens(col("text"))).as("simhash"))
        .orderBy("doc_id")
    },

    Q("q36_simhash_neardup_pairs",
      // brute-force oracle; the Spark side uses banded LSH, which is EXACT
      // for hamming <= 3 with 4 bands (pigeonhole) — see Dedup.simhashPairs
      s"""WITH $simhashCte
         |SELECT a.doc_id AS id1, b.doc_id AS id2,
         |  bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
         |FROM sig a JOIN sig b
         |  ON a.doc_id < b.doc_id AND bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      val sigs = t(s, d, "documents")
        .select(col("doc_id"),
          GraftFunctions.simhash32(TextAnalysis.tokens(col("text"))).as("simhash"))
      Dedup.simhashPairs(sigs, "doc_id", "simhash", nBands = 4, maxHamming = 3)
        .orderBy("id1", "id2")
    },

    Q("q55_simhash60_neardup_pairs",
      // 60-bit signature (4 × 15-bit bands, still exact by pigeonhole at
      // hamming <= 3): far fewer incidental band collisions than 32-bit on
      // this small-vocabulary corpus — same shuffle shape, smaller
      // candidate stream into the hamming filter
      s"""WITH ${simhashCteBits(60)}
         |SELECT a.doc_id AS id1, b.doc_id AS id2,
         |  bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
         |FROM sig a JOIN sig b
         |  ON a.doc_id < b.doc_id AND bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      val sigs = t(s, d, "documents")
        .select(col("doc_id"),
          GraftFunctions.simhash60(TextAnalysis.tokens(col("text"))).as("simhash"))
      Dedup.simhashPairs(sigs, "doc_id", "simhash",
          nBands = 4, maxHamming = 3, sigBits = 60)
        .orderBy("id1", "id2")
    },

    // ------------------------------------------------- text analysis
    Q("q37_text_metrics",
      s"""WITH m AS (
         |  SELECT doc_id,
         |    len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens,
         |    list_sum(list_transform(string_split_regex(trim(text), '\\s+'),
         |      t -> length(t)))::DOUBLE
         |      / len(string_split_regex(trim(text), '\\s+')) AS avg_tok_len,
         |    (length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))::DOUBLE
         |      / length(text) AS punct_ratio,
         |    len(list_filter(string_split_regex(trim(text), '\\s+'),
         |      t -> lower(t) IN ($stopSql)))::DOUBLE
         |      / len(string_split_regex(trim(text), '\\s+')) AS stop_ratio,
         |    greatest(len(string_split_regex(trim(text), '[^A-Za-z0-9]+'))::BIGINT,
         |      ceil(length(text) / 4.0)::BIGINT) AS token_estimate
         |  FROM documents)
         |SELECT doc_id, n_tokens, round(avg_tok_len, 6) AS avg_tok_len,
         |  round(punct_ratio, 6) AS punct_ratio, round(stop_ratio, 6) AS stop_ratio,
         |  token_estimate,
         |  round(0.4 * least(1.0, n_tokens / 64.0) + 0.3 * (1.0 - coalesce(punct_ratio, 0.0))
         |    + 0.3 * least(1.0, coalesce(stop_ratio, 0.0) * 4.0), 6) AS quality
         |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
      // layered projections: split once (level 1), raw metrics once
      // (level 2), rounding + the quality composite over level-2
      // attributes (level 3). The HOF metrics are interpreted, so sharing
      // must be structural — see TextAnalysis scaladoc.
      t(s, d, "documents")
        .select(col("doc_id"), col("text"),
          TextAnalysis.tokens(col("text")).as("__toks"))
        .select(col("doc_id"),
          TextAnalysis.tokenCountOf(col("__toks")).as("n_tokens"),
          TextAnalysis.avgTokenLenOf(col("__toks")).as("__avg"),
          TextAnalysis.punctRatio(col("text")).as("__punct"),
          TextAnalysis.stopwordRatioOf(col("__toks"), Stop).as("__stop"),
          TextAnalysis.tokenEstimate(col("text")).as("token_estimate"))
        .select(col("doc_id"), col("n_tokens"),
          round(col("__avg"), 6).as("avg_tok_len"),
          round(col("__punct"), 6).as("punct_ratio"),
          round(col("__stop"), 6).as("stop_ratio"),
          col("token_estimate"),
          round(lit(0.4d) * least(lit(1.0d), col("n_tokens").cast("double") / 64.0d)
            + lit(0.3d) * (lit(1.0d) - coalesce(col("__punct"), lit(0.0d)))
            + lit(0.3d) * least(lit(1.0d), coalesce(col("__stop"), lit(0.0d)) * 4.0d),
            6).as("quality"))
        .orderBy("doc_id")
    },

    Q("q38_language_id",
      """WITH s AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> lower(t) IN ('the','a','of','and','is')))::BIGINT AS s_en,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> lower(t) IN ('der','die','das','und','ist')))::BIGINT AS s_de,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> lower(t) IN ('le','la','les','et','est')))::BIGINT AS s_fr,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> lower(t) IN ('el','los','las','y','es')))::BIGINT AS s_es
        |  FROM documents),
        |p AS (
        |  SELECT lang, CASE
        |    WHEN s_en = greatest(s_en, s_de, s_fr, s_es) AND greatest(s_en, s_de, s_fr, s_es) > 0 THEN 'en'
        |    WHEN s_de = greatest(s_en, s_de, s_fr, s_es) AND greatest(s_en, s_de, s_fr, s_es) > 0 THEN 'de'
        |    WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) AND greatest(s_en, s_de, s_fr, s_es) > 0 THEN 'fr'
        |    WHEN s_es = greatest(s_en, s_de, s_fr, s_es) AND greatest(s_en, s_de, s_fr, s_es) > 0 THEN 'es'
        |    ELSE 'und' END AS lang_pred
        |  FROM s)
        |SELECT lang, lang_pred, count(*) AS n FROM p
        |GROUP BY lang, lang_pred ORDER BY lang, lang_pred""".stripMargin) { (s, d) =>
      // split once, score each language once, then the argmax cascade over
      // score attributes — the cascade references every score repeatedly
      val scored = t(s, d, "documents")
        .select(col("lang"), TextAnalysis.tokens(col("text")).as("__toks"))
        .select(col("lang") +:
          TextAnalysis.langScoresOf(col("__toks")).map { case (l, c) => c.as(s"__s_$l") }: _*)
      scored
        .select(col("lang"), TextAnalysis.languageIdFromScores(
          TextAnalysis.LangMarkers.map { case (l, _) => l -> col(s"__s_$l") }).as("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "lang_pred")
    },

    Q("q39_doc_fingerprint",
      """SELECT doc_id,
        |  list_reduce(list_transform(regexp_split_to_array(text, ''),
        |    c -> ord(c)::BIGINT), (x, y) -> (x * 31 + y) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      t(s, d, "documents")
        .select(col("doc_id"), GraftFunctions.rollingHash(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    // -------------------------------------------- similarity search
    Q("q40_ann_topk",
      """WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS cosine
        |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id)
        |SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank,
        |  neighbor_id, round(cosine, 6) AS cosine
        |FROM scored QUALIFY rank <= 5 ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      SimilaritySearch.bruteForceTopK(
          emb, emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    },

    Q("q189_filtered_ann",
      // FILTERED vector search, pre-filter semantics: neighbors restrict
      // to label % 3 = 0 BEFORE ranking, so each query's k results are
      // its true top-k among qualifying vectors (post-filtering an
      // unfiltered top-k under-returns — SimilaritySearchSpec shows the
      // divergence). The label filter pushes to the corpus scan
      // (plan-audited PushedFilters).
      """WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS cosine
        |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id AND e.label % 3 = 0)
        |SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank,
        |  neighbor_id, round(cosine, 6) AS cosine
        |FROM scored QUALIFY rank <= 5 ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      SimilaritySearch.filteredTopK(
          emb, emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
          k = 5, predicate = col("label") % 3 === 0)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    },

    Q("q190_ann_same_label",
      // per-query attribute-matched search: each query ranks only
      // neighbors sharing ITS label — the predicate varies per query, so
      // it rides the broadcast join as an equi-key instead of a corpus
      // filter; the scan shape (one unshuffled corpus pass, bounded
      // top-k partials) is q40's
      """WITH q AS (SELECT vec_id AS query_id, embedding, label FROM embeddings WHERE vec_id % 50 = 0),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS cosine
        |  FROM q JOIN embeddings e ON e.label = q.label AND e.vec_id <> q.query_id)
        |SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank,
        |  neighbor_id, round(cosine, 6) AS cosine
        |FROM scored QUALIFY rank <= 5 ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      SimilaritySearch.sameAttrTopK(
          emb, emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
          "label", k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    },

    Q("q204_matryoshka_recall",
      // Matryoshka truncation eval — "how many dims can retrieval
      // afford to drop?": recall@5 of exact search over 8/16/32-dim
      // PREFIXES against the full 64-dim ground truth. Both rankings
      // order by (cosine ROUNDED to 6 dp DESC, neighbor_id), which
      // pins the ranked SETS bit-stably across engines even at
      // truncation-induced near-ties; recall is integer hits over one
      // IEEE division. The dimension-budget knob of an embedding
      // pipeline, measured not guessed.
      s"""WITH q AS (
        |  SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
        |nq AS (SELECT count(*) AS n FROM q),
        |gold AS ($matryoshkaTopSql),
        |${Seq(8, 16, 32).map(d =>
            s"t$d AS (${matryoshkaTopSqlDim(d)})").mkString(",\n")}
        |${Seq(8, 16, 32).map(d =>
            s"SELECT CAST($d AS INT) AS dim, round((SELECT count(*) FROM t$d JOIN gold USING (query_id, neighbor_id))::DOUBLE / (n * 5), 6) AS recall FROM nq")
          .mkString("\nUNION ALL\n")}
        |ORDER BY dim""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      SimilaritySearch.matryoshkaRecall(
          emb, emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
          dims = Seq(8, 16, 32), k = 5)
        .orderBy("dim")
    },

    Q("q41_embedding_neardup",
      """SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
        |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      SimilaritySearch.nearDupPairsBlocked(
          t(s, d, "embeddings"), "vec_id", "embedding", "label", threshold = 0.35)
        .select(col("id1"), col("id2"), round(col("cosine"), 6).as("cosine"))
        .orderBy("id1", "id2")
    },

    Q("q192_semdedup_pairs",
      // SemDeDup — embedding-SPACE near-dup discovery (no metadata
      // blocking like q41's label): vectors land in coarse cells, exact
      // cosine runs within cells only. This oracle-paired variant uses
      // the axis-sign cell (bit j = sign of dim j — SRP-LSH with the
      // canonical basis), which DuckDB replays BIT-EXACTLY from the
      // stored floats; the trained-quantizer path (semDedupIvf) shares
      // this pair machinery and is recall-floored in
      // SimilaritySearchSpec. Cell equi-join: Σ|cell|² candidates,
      // never corpus².
      s"""WITH c AS (
        |  SELECT vec_id, embedding, $semCellSql AS cell FROM embeddings)
        |SELECT a.vec_id AS id1, b.vec_id AS id2, CAST(a.cell AS INT) AS cell,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
        |FROM c a JOIN c b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
        |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      SimilaritySearch.semanticDupPairs(
          t(s, d, "embeddings"), "vec_id", "embedding",
          SimilaritySearch.axisSignCell(col("embedding"), 8), threshold = 0.35)
        .select(col("id1"), col("id2"), col("cell").cast("int").as("cell"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("id1", "id2")
    },

    Q("q193_semdedup_removals",
      // the removal decision over q192's pair set: drop a doc iff a
      // SMALLER-id doc in its cell is within the cosine threshold;
      // keep_witness = the smallest such neighbor. A min over the pair
      // set — deterministic and SQL-replayable, unlike a greedy sweep.
      s"""WITH c AS (
        |  SELECT vec_id, embedding, $semCellSql AS cell FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2
        |  FROM c a JOIN c b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35)
        |SELECT id2 AS removed, min(id1) AS keep_witness
        |FROM p GROUP BY id2 ORDER BY removed""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      SimilaritySearch.semanticRemovals(
          t(s, d, "embeddings"), "vec_id", "embedding",
          SimilaritySearch.axisSignCell(col("embedding"), 8), threshold = 0.35)
        .orderBy("removed")
    },

    Q("q201_semdedup_admission",
      // the ADMISSION decision of an incremental semantic-dedup ingest
      // (q192/q193 between two table halves): corpus = 80% of the
      // embeddings, batch = the arriving 20%; a batch row is rejected
      // with the smallest same-cell corpus duplicate as witness
      // ('corpus'), survivors then keep-first dedup among themselves
      // ('batch'). The sign cell makes every decision SQL-replayable;
      // the SAVED-INDEX twin (trained cells, static partition pruning,
      // O(batch) append) is q202 + the SimilaritySearchSpec lifecycle.
      s"""WITH c AS (
        |  SELECT vec_id, embedding, $semCellSql AS cell FROM embeddings),
        |corpus AS (SELECT * FROM c WHERE vec_id % 5 < 4),
        |batch AS (SELECT * FROM c WHERE vec_id % 5 = 4),
        |corp_rej AS (
        |  SELECT b.vec_id, min(k.vec_id) AS keep_witness, 'corpus' AS witness_in
        |  FROM batch b JOIN corpus k ON k.cell = b.cell
        |  WHERE list_cosine_similarity(b.embedding::DOUBLE[], k.embedding::DOUBLE[]) >= 0.35
        |  GROUP BY b.vec_id),
        |surv AS (
        |  SELECT * FROM batch
        |  WHERE vec_id NOT IN (SELECT vec_id FROM corp_rej)),
        |batch_rej AS (
        |  SELECT b.vec_id, min(a.vec_id) AS keep_witness, 'batch' AS witness_in
        |  FROM surv b JOIN surv a ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(b.embedding::DOUBLE[], a.embedding::DOUBLE[]) >= 0.35
        |  GROUP BY b.vec_id)
        |SELECT vec_id, keep_witness, witness_in FROM corp_rej
        |UNION ALL SELECT vec_id, keep_witness, witness_in FROM batch_rej
        |ORDER BY vec_id""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      SimilaritySearch.admissionDecisions(
          emb.filter(col("vec_id") % 5 < 4), emb.filter(col("vec_id") % 5 === 4),
          "vec_id", "embedding",
          SimilaritySearch.axisSignCell(col("embedding"), 8), threshold = 0.35)
        .orderBy("vec_id")
    },

    Q.noOracle("q202_semdedup_admit_lifecycle") { (s, d) =>
      // the SAVED-INDEX admission lifecycle end to end (the q175 stance
      // for semantic dedup): build the IVF index on 80% of the
      // embeddings, save, ADMIT the remaining 20% against it —
      // statically-pruned probe, corpus-dup rejection, intra-batch
      // keep-first, O(batch) append of survivors — then report the
      // rejection table. Trained cells are not SQL-replayable (k-means),
      // so no oracle; the decision semantics are oracle-paired in q201
      // and the lifecycle (incl. append visibility to a second batch)
      // is SimilaritySearchSpec-pinned.
      GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      val path = Q.scratchDir("graft-q202") + "/idx"
      val corpus = emb.filter(col("vec_id") % 5 < 4)
      val (cents, assigned) = SimilaritySearch.ivfBuildIndex(
        corpus, "vec_id", "embedding", nCells = 16, iters = 3)
      SimilaritySearch.ivfSaveIndex(path, cents, assigned)
      val adm = SimilaritySearch.semDedupAdmit(
        s, path, emb.filter(col("vec_id") % 5 === 4),
        "vec_id", "embedding", threshold = 0.35)
      // release the admitted side's checkpoint blocks (Checkpoints.free —
      // a plain unpersist is a no-op on a LogicalRDD leaf); the returned
      // frame IS the rejected checkpoint, so that one must stay live
      graft.operators.Checkpoints.free(adm.admitted)
      adm.rejected
        .select(col("vec_id"), col("keep_witness"), col("witness_in"))
        .orderBy("vec_id")
    },

    Q("q202b_semdedup_index_decisions",
      // VERDICT r13 task #7 — the saved-index admission DECISIONS,
      // oracle-paired: trained cells are not SQL-replayable (k-means),
      // but GIVEN the saved index artifacts every decision is — cell
      // assignment is an argmax over the centroids parquet, the corpus
      // witness a min over the cell's inverted list, intra-batch
      // keep-first the q193/q201 min-witness algebra. The oracle reads
      // the SAME parquet artifacts the Spark run wrote (per-run root
      // interpolated at class-load, so the dumped SQL names exactly this
      // JVM's files: Verify runs before the DuckDB oracles) and replays
      // all three.
      // Unlike q202 this query does NOT append (pure decisions), so the
      // artifacts the oracle reads are exactly what the query probed.
      s"""WITH cents AS (
        |  SELECT cell, centroid
        |  FROM read_parquet('${Q.oracleArtifactRoot}/q202b_idx/centroids/*.parquet')),
        |lists AS (
        |  SELECT neighbor_id, __cvec, CAST(__cell AS INT) AS cell
        |  FROM read_parquet('${Q.oracleArtifactRoot}/q202b_idx/lists/*/*.parquet',
        |                    hive_partitioning = 1)),
        |b AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 4),
        |bc AS (
        |  SELECT vec_id, embedding, cell FROM (
        |    SELECT b.vec_id, b.embedding, c.cell,
        |      row_number() OVER (PARTITION BY b.vec_id
        |        ORDER BY list_cosine_similarity(b.embedding::DOUBLE[], c.centroid::DOUBLE[]) DESC,
        |          c.cell) AS rn
        |    FROM b CROSS JOIN cents c) WHERE rn = 1),
        |corp_rej AS (
        |  SELECT bc.vec_id, min(l.neighbor_id) AS keep_witness, 'corpus' AS witness_in
        |  FROM bc JOIN lists l ON l.cell = bc.cell
        |  WHERE list_cosine_similarity(bc.embedding::DOUBLE[], l.__cvec::DOUBLE[]) >= 0.35
        |  GROUP BY bc.vec_id),
        |surv AS (SELECT * FROM bc WHERE vec_id NOT IN (SELECT vec_id FROM corp_rej)),
        |batch_rej AS (
        |  SELECT s.vec_id, min(a.vec_id) AS keep_witness, 'batch' AS witness_in
        |  FROM surv s JOIN surv a ON a.cell = s.cell AND a.vec_id < s.vec_id
        |  WHERE list_cosine_similarity(s.embedding::DOUBLE[], a.embedding::DOUBLE[]) >= 0.35
        |  GROUP BY s.vec_id)
        |SELECT vec_id, keep_witness, witness_in FROM corp_rej
        |UNION ALL SELECT vec_id, keep_witness, witness_in FROM batch_rej
        |ORDER BY vec_id""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      val path = Q.oracleArtifactDir("q202b_idx")
      val corpus = emb.filter(col("vec_id") % 5 < 4)
      val (cents, assigned) = SimilaritySearch.ivfBuildIndex(
        corpus, "vec_id", "embedding", nCells = 16, iters = 3)
      SimilaritySearch.ivfSaveIndex(path, cents, assigned)
      SimilaritySearch.semDedupDecisions(
          s, path, emb.filter(col("vec_id") % 5 === 4),
          "vec_id", "embedding", threshold = 0.35)
        .orderBy("vec_id")
    },

    Q("q176_retrieval_eval",
      // retrieval-quality gate: recall@5 / MRR / nDCG@5 of the exact
      // top-5 run (q40's scoring chain) against same-label relevance —
      // the eval step an embedding pipeline promotes or rejects models
      // on. nDCG discounts by 1/ln(rank+1): the ln-vs-log2 base change
      // cancels in the dcg/idcg ratio, and ln of small integers agrees
      // across engines where log2 implementations may differ in the
      // last bit. recall and mrr are exact rationals.
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding, label FROM embeddings
        |  WHERE vec_id % 50 = 0),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS cosine
        |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
        |run AS (
        |  SELECT query_id, neighbor_id,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM scored QUALIFY rank <= 5),
        |gold AS (
        |  SELECT q.query_id, e.vec_id AS item
        |  FROM q JOIN embeddings e ON e.label = q.label AND e.vec_id <> q.query_id),
        |nrel AS (SELECT query_id, count(*) AS n_rel FROM gold GROUP BY query_id),
        |rel AS (
        |  SELECT r.query_id, r.rank FROM run r
        |  JOIN gold g ON g.query_id = r.query_id AND g.item = r.neighbor_id),
        |agg AS (
        |  SELECT query_id, count(*) AS hits, sum(1.0 / ln(rank + 1)) AS dcg,
        |    min(rank) AS firstrel
        |  FROM rel GROUP BY query_id),
        |ideal AS (
        |  SELECT query_id, sum(1.0 / ln(x + 1)) AS idcg
        |  FROM (SELECT query_id, unnest(generate_series(1, least(n_rel, 5))) AS x
        |        FROM nrel)
        |  GROUP BY query_id)
        |SELECT n.query_id, n.n_rel, coalesce(a.hits, 0) AS hits,
        |  round(coalesce(a.hits, 0) / n.n_rel, 6) AS recall,
        |  round(coalesce(1.0 / a.firstrel, 0), 6) AS mrr,
        |  round(coalesce(a.dcg / i.idcg, 0), 6) AS ndcg
        |FROM nrel n LEFT JOIN agg a USING (query_id)
        |JOIN ideal i USING (query_id)
        |ORDER BY query_id""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") % 50 === 0)
      val run = SimilaritySearch.bruteForceTopK(
        emb, queries, "vec_id", "embedding", k = 5)
      val gold = queries.select(col("vec_id").as("query_id"), col("label"))
        .join(emb.select(col("vec_id").as("neighbor_id"), col("label")), "label")
        .filter(col("neighbor_id") =!= col("query_id"))
        .select("query_id", "neighbor_id")
      graft.operators.RetrievalEval.binaryMetrics(
          run, gold, "query_id", "neighbor_id", "rank", k = 5)
        .select(col("query_id"), col("n_rel"), col("hits"),
          round(col("recall"), 6).as("recall"), round(col("mrr"), 6).as("mrr"),
          round(col("ndcg"), 6).as("ndcg"))
        .orderBy("query_id")
    },

    Q.noOracle("q42_lsh_topk") { (s, d) =>
      // SRP-LSH is approximate (recall < 1): no SQL oracle; recall vs the
      // exact q40 result is asserted in SimilaritySearchSpec.
      GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      // planes/tables tuned on the synthetic embeddings: they are weakly
      // clustered (max intra-label cosine ≈ 0.45), so per-plane collision
      // probability is only ~0.65 — few planes + many tables is the right
      // trade (recall ≈ 0.7 vs exact q40 at this setting, asserted ≥ 0.5
      // in QueriesSpec)
      SimilaritySearch.lshTopK(
          emb, emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
          k = 5, nPlanes = 4, nTables = 8)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    },

    Q("q42b_lsh_topk_replay",
      // VERDICT r14 task #3 — q42's SRP-LSH result, ORACLE-PAIRED with
      // zero artifacts: the hyperplanes are md5-derived constants
      // (planeComponent = first-15-hex-chars-of-md5 / 2^59 − 1, the
      // q281 hash idiom), so the oracle regenerates them in SQL,
      // replays every bucket bit as an ordered list_dot_product sign
      // (sequential fold, same IEEE tree as the SrpBits codegen loop),
      // joins same-(table, bucket) candidates, dedups across tables and
      // re-ranks by exact cosine — the whole approximate pipeline is
      // deterministic GIVEN the planes, and the planes are pure hashes.
      """WITH planes AS (
        |  SELECT t, p, list(comp ORDER BY d) AS w
        |  FROM (
        |    SELECT t.t, p.p, d.d,
        |      (('0x' || substr(md5(t.t::VARCHAR || ':' || p.p::VARCHAR || ':'
        |          || d.d::VARCHAR), 1, 15))::BIGINT)::DOUBLE
        |        / 576460752303423488.0 - 1.0 AS comp
        |    FROM (SELECT unnest(generate_series(0, 7)) AS t) t,
        |         (SELECT unnest(generate_series(0, 3)) AS p) p,
        |         (SELECT unnest(generate_series(0, 63)) AS d) d)
        |  GROUP BY t, p),
        |bk AS (
        |  SELECT e.vec_id, pl.t,
        |    sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], pl.w) > 0.0
        |      THEN (1 << pl.p)::BIGINT ELSE 0 END)::BIGINT AS bucket
        |  FROM embeddings e, planes pl GROUP BY 1, 2),
        |q AS (SELECT vec_id AS query_id, embedding FROM embeddings
        |      WHERE vec_id % 50 = 0),
        |qb AS (SELECT b.vec_id AS query_id, b.t, b.bucket
        |       FROM bk b JOIN q ON q.query_id = b.vec_id),
        |cand AS (
        |  SELECT DISTINCT qb.query_id, cb.vec_id AS neighbor_id
        |  FROM qb JOIN bk cb ON cb.t = qb.t AND cb.bucket = qb.bucket
        |  WHERE cb.vec_id <> qb.query_id),
        |scored AS (
        |  SELECT c.query_id, c.neighbor_id,
        |    list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS cosine
        |  FROM cand c JOIN q ON q.query_id = c.query_id
        |  JOIN embeddings e ON e.vec_id = c.neighbor_id)
        |SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank,
        |  neighbor_id, round(cosine, 6) AS cosine
        |FROM scored QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      SimilaritySearch.lshTopK(
          emb, emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
          k = 5, nPlanes = 4, nTables = 8)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    },

    Q("q54b_ivf_topk_replay",
      // VERDICT r14 task #3 — q54's IVF probe, ORACLE-PAIRED via the
      // q202b artifact-replay stance: trained centroids are not
      // SQL-replayable (k-means), but GIVEN the saved index every probe
      // decision is — cell ranking is (cosine DESC, cell) over the
      // centroids parquet, candidates are the probed cells' inverted
      // lists, the re-rank is exact cosine with the (cosine DESC, id)
      // tie-break every exact-top-k twin already hash-matches. The
      // engine probes the SAME saved artifacts the oracle reads
      // (ivfQueryIndex over ivfSaveIndex output — the static-pruned
      // probe path, so the replay covers the production read path, not
      // a shortcut).
      s"""WITH cents AS (
        |  SELECT cell, centroid
        |  FROM read_parquet('${Q.oracleArtifactRoot}/q54b_idx/centroids/*.parquet')),
        |lists AS (
        |  SELECT neighbor_id, __cvec, CAST(__cell AS INT) AS cell
        |  FROM read_parquet('${Q.oracleArtifactRoot}/q54b_idx/lists/*/*.parquet',
        |                    hive_partitioning = 1)),
        |q AS (SELECT vec_id AS query_id, embedding FROM embeddings
        |      WHERE vec_id % 50 = 0),
        |pc AS (
        |  SELECT query_id, cell FROM (
        |    SELECT q.query_id, c.cell,
        |      row_number() OVER (PARTITION BY q.query_id
        |        ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
        |                   c.centroid::DOUBLE[]) DESC, c.cell) AS rn
        |    FROM q CROSS JOIN cents c) WHERE rn <= 6),
        |cand AS (
        |  SELECT q.query_id, l.neighbor_id,
        |    list_cosine_similarity(q.embedding::DOUBLE[], l.__cvec::DOUBLE[]) AS cosine
        |  FROM q JOIN pc ON pc.query_id = q.query_id
        |  JOIN lists l ON l.cell = pc.cell
        |  WHERE l.neighbor_id <> q.query_id)
        |SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank,
        |  neighbor_id, round(cosine, 6) AS cosine
        |FROM cand QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      val path = Q.oracleArtifactDir("q54b_idx")
      val (cents, assigned) = SimilaritySearch.ivfBuildIndex(
        emb, "vec_id", "embedding", nCells = 16, iters = 3)
      SimilaritySearch.ivfSaveIndex(path, cents, assigned)
      val (lc, lists) = SimilaritySearch.ivfLoadIndex(s, path)
      SimilaritySearch.ivfQueryIndex(
          lc, lists, emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
          k = 5, nProbe = 6)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    },

    Q.noOracle("q54_ivf_topk") { (s, d) =>
      // IVF (k-means inverted lists, Lloyd's over DataFrames) — the
      // data-adaptive ANN scale path; approximate, so no SQL oracle.
      // Recall vs exact q40 asserted in QueriesSpec (beats SRP-LSH on
      // clustered data because the partition adapts to it).
      GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      SimilaritySearch.ivfTopK(
          emb, emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
          k = 5, nCells = 16, nProbe = 6, iters = 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    },

    Q.noOracle("q175_ivf_incremental") { (s, d) =>
      // INCREMENTAL index maintenance end to end: build IVF on 60% of the
      // embeddings, save, append the remaining 40% in two batches against
      // the saved quantizer (the TxTable.upsertDelta LSM stance — O(batch)
      // appends, no retrain), OPTIMIZE folds each cell's append files,
      // then probe. Approximate (no SQL oracle); SimilaritySearchSpec
      // pins append==bulk-assignment equality and the recall floor, and
      // cellImbalance is the documented re-train signal.
      GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      val path = Q.scratchDir("graft-q175") + "/idx"
      val seed = emb.filter(col("vec_id") % 5 < 3)
      val (cents, assigned) = SimilaritySearch.ivfBuildIndex(
        seed, "vec_id", "embedding", nCells = 16, iters = 3)
      SimilaritySearch.ivfSaveIndex(path, cents, assigned)
      SimilaritySearch.ivfAppendIndex(
        s, path, emb.filter(col("vec_id") % 5 === 3), "vec_id", "embedding")
      SimilaritySearch.ivfAppendIndex(
        s, path, emb.filter(col("vec_id") % 5 === 4), "vec_id", "embedding")
      SimilaritySearch.compactIndexLists(s, path, "lists")
      val (lc, lists) = SimilaritySearch.ivfLoadIndex(s, path)
      SimilaritySearch.ivfQueryIndex(
          lc, lists, emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
          k = 5, nProbe = 6)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    },

    Q("q175b_ivf_incremental_replay",
      // VERDICT r15 task #3 — q175's incremental-maintenance lifecycle
      // ORACLE-PAIRED via the q54b/q163b artifact stance: the trained
      // quantizer is not SQL-replayable, but GIVEN the saved centroids
      // every assignment ever made — seed build, both append batches —
      // is a pure argmax over read_parquet. The engine runs the FULL
      // lifecycle (build on 60%, save, two O(batch) appends against the
      // saved quantizer, compact) and then emits what is physically ON
      // DISK in the compacted lists; the oracle recomputes each
      // vector's cell independently (cosine DESC, lowest cell on ties —
      // assignCell's array_position semantics). Hash equality therefore
      // certifies three things at once: append assignment == bulk SQL
      // argmax, save/append/compact preserve list content byte-for-id,
      // and no row is lost or duplicated across the two appends and the
      // compaction swap. The remaining q175 residue (probe top-k over
      // these lists) is the already-paired q54b read path.
      s"""WITH cents AS (
        |  SELECT cell, centroid
        |  FROM read_parquet('${Q.oracleArtifactRoot}/q175b_idx/centroids/*.parquet')),
        |a AS (
        |  SELECT e.vec_id, c.cell,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY coalesce(list_cosine_similarity(e.embedding::DOUBLE[],
        |                 c.centroid::DOUBLE[]), -2.0) DESC, c.cell) AS rn
        |  FROM embeddings e CROSS JOIN cents c)
        |SELECT vec_id AS neighbor_id,
        |  CASE WHEN vec_id % 5 < 3 THEN 'seed'
        |       WHEN vec_id % 5 = 3 THEN 'b1' ELSE 'b2' END AS batch,
        |  CAST(cell AS BIGINT) AS cell
        |FROM a WHERE rn = 1 ORDER BY neighbor_id""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      val path = Q.oracleArtifactDir("q175b_idx")
      val seed = emb.filter(col("vec_id") % 5 < 3)
      val (cents, assigned) = SimilaritySearch.ivfBuildIndex(
        seed, "vec_id", "embedding", nCells = 16, iters = 3)
      SimilaritySearch.ivfSaveIndex(path, cents, assigned)
      SimilaritySearch.ivfAppendIndex(
        s, path, emb.filter(col("vec_id") % 5 === 3), "vec_id", "embedding")
      SimilaritySearch.ivfAppendIndex(
        s, path, emb.filter(col("vec_id") % 5 === 4), "vec_id", "embedding")
      SimilaritySearch.compactIndexLists(s, path, "lists")
      val (_, lists) = SimilaritySearch.ivfLoadIndex(s, path)
      lists.select(col("neighbor_id"),
          when(col("neighbor_id") % 5 < 3, lit("seed"))
            .when(col("neighbor_id") % 5 === 3, lit("b1"))
            .otherwise(lit("b2")).as("batch"),
          col("__cell").cast("long").as("cell"))
        .orderBy("neighbor_id")
    },

    Q("q170_hard_negatives",
      // hard-negative mining for contrastive training: per query the
      // rank-(6..15] cosine band — informative negatives below the
      // likely-positive top-5. Same scan shape as exact top-k (broadcast
      // queries, one corpus pass, bounded per-partition partials); the
      // oracle is the windowed rank band.
      """WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS cosine
        |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id)
        |SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank,
        |  neighbor_id, round(cosine, 6) AS cosine
        |FROM scored QUALIFY rank > 5 AND rank <= 15
        |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      SimilaritySearch.hardNegatives(
          emb, emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
          kSkip = 5, kTake = 10)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    },

    Q("q172_contrastive_triplets",
      // contrastive (anchor, positive, negative) construction: per
      // anchor the most-similar SAME-label vector and the hardest
      // DIFFERENT-label vector — two label-filtered bounded-partial
      // scans, no corpus window. Tie order (cosine desc, id asc) matches
      // the oracle's ranking exactly.
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding, label FROM embeddings
        |  WHERE vec_id % 50 = 0),
        |sp AS (
        |  SELECT q.query_id, e.vec_id AS positive_id,
        |    list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS pos_cos,
        |    row_number() OVER (PARTITION BY q.query_id ORDER BY
        |      list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
        |      e.vec_id) AS rk
        |  FROM q JOIN embeddings e
        |    ON e.vec_id <> q.query_id AND e.label = q.label),
        |sn AS (
        |  SELECT q.query_id, e.vec_id AS negative_id,
        |    list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS neg_cos,
        |    row_number() OVER (PARTITION BY q.query_id ORDER BY
        |      list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
        |      e.vec_id) AS rk
        |  FROM q JOIN embeddings e
        |    ON e.vec_id <> q.query_id AND e.label <> q.label)
        |SELECT sp.query_id, sp.positive_id, round(sp.pos_cos, 6) AS pos_cos,
        |  sn.negative_id, round(sn.neg_cos, 6) AS neg_cos
        |FROM sp JOIN sn USING (query_id)
        |WHERE sp.rk = 1 AND sn.rk = 1 ORDER BY query_id""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      SimilaritySearch.contrastiveTriplets(
          emb, emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding", "label")
        .select(col("query_id"), col("positive_id"),
          round(col("pos_cos"), 6).as("pos_cos"),
          col("negative_id"), round(col("neg_cos"), 6).as("neg_cos"))
        .orderBy("query_id")
    },

    Q("q163b_ivfpq_topk_replay",
      // VERDICT r14 task #3, third twin — the IVF-PQ probe oracle-paired
      // via the q202b artifact stance: trained centroids/codebooks are
      // not SQL-replayable, but GIVEN the saved index every step is
      // deterministic — cell probing is (cosine DESC, cell) over the
      // centroids parquet; the per-query ADC LUT is m×ksub ordered
      // sub-vector dot products against the codebooks parquet (replayed
      // as explicit list_reduce left-folds — the identical IEEE
      // sequence as the engine's aggregate() lambda, not an engine
      // sum() whose order is unspecified); the ADC score is an ordered
      // m-term fold of LUT lookups by the saved codes; the shortlist is
      // (adc DESC, neighbor_id) top k·refine; the final answer is the
      // exact-cosine re-rank of the shortlist. The engine probes the
      // SAME saved artifacts through ivfPqQueryIndex — the production
      // saved-index read path.
      s"""WITH cents AS (
        |  SELECT cell, centroid
        |  FROM read_parquet('${Q.oracleArtifactRoot}/q163b_idx/centroids/*.parquet')),
        |books AS (
        |  SELECT sub, code, centroid
        |  FROM read_parquet('${Q.oracleArtifactRoot}/q163b_idx/codebooks/*.parquet')),
        |codes AS (
        |  SELECT neighbor_id, __codes, CAST(__cell AS INT) AS cell
        |  FROM read_parquet('${Q.oracleArtifactRoot}/q163b_idx/codes/*/*.parquet',
        |                    hive_partitioning = 1)),
        |q AS (SELECT vec_id AS query_id, embedding FROM embeddings
        |      WHERE vec_id % 50 = 0),
        |pc AS (
        |  SELECT query_id, cell FROM (
        |    SELECT q.query_id, c.cell,
        |      row_number() OVER (PARTITION BY q.query_id
        |        ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
        |                   c.centroid::DOUBLE[]) DESC, c.cell) AS rn
        |    FROM q CROSS JOIN cents c) WHERE rn <= 6),
        |lut AS (
        |  SELECT q.query_id, b.sub, b.code,
        |    list_reduce(
        |      list_transform(generate_series(1, 8), t ->
        |        q.embedding[b.sub * 8 + t]::DOUBLE * b.centroid[t]::DOUBLE),
        |      (a, x) -> a + x) AS lutval
        |  FROM q CROSS JOIN books b),
        |lutl AS (
        |  SELECT query_id, list(lutval ORDER BY sub, code) AS lut
        |  FROM lut GROUP BY query_id),
        |adc AS (
        |  SELECT pc.query_id, cd.neighbor_id,
        |    list_reduce(
        |      list_transform(generate_series(0, 7), s ->
        |        l.lut[s * 16 + cd.__codes[s + 1] + 1]),
        |      (a, x) -> a + x) AS score
        |  FROM pc JOIN codes cd ON cd.cell = pc.cell
        |  JOIN lutl l ON l.query_id = pc.query_id
        |  WHERE cd.neighbor_id <> pc.query_id),
        |short AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY score DESC, neighbor_id) AS rn
        |    FROM adc) WHERE rn <= 40),
        |rer AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS cosine
        |  FROM short s JOIN q ON q.query_id = s.query_id
        |  JOIN embeddings e ON e.vec_id = s.neighbor_id)
        |SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank,
        |  neighbor_id, round(cosine, 6) AS cosine
        |FROM rer QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      val path = Q.oracleArtifactDir("q163b_idx")
      val (cents, books, coded) = SimilaritySearch.ivfPqBuildIndex(
        emb, "vec_id", "embedding", nCells = 16, m = 8, ksub = 16, iters = 3)
      SimilaritySearch.ivfPqSaveIndex(path, cents, books, coded)
      val (lc, lb, lcoded) = SimilaritySearch.ivfPqLoadIndex(s, path)
      SimilaritySearch.ivfPqQueryIndex(
          lc, lb, lcoded, emb, emb.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", k = 5, nProbe = 6, refine = 8)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    },

    Q.noOracle("q163_ivfpq_topk") { (s, d) =>
      // IVF-PQ: int8 product-quantization codes over the inverted lists
      // (m bytes/vector instead of 4·dim — the 100 TB ANN memory story),
      // ADC shortlist, exact re-rank of shortlist ids only. Approximate,
      // so no SQL oracle; recall floor vs exact q40 asserted in
      // SimilaritySearchSpec and QueriesSpec.
      GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      SimilaritySearch.ivfPqTopK(
          emb, emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
          k = 5, nCells = 16, m = 8, ksub = 16, nProbe = 6, refine = 8, iters = 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    },

    // ------------------------------------------------- multimodal
    Q("q43_blob_metadata",
      // documents.text re-interpreted as an opaque BLOB column: byte
      // length + content hash — the typed-metadata side of multimodal
      // ingestion (decode itself is the stubbed q44)
      """SELECT doc_id, octet_length(text::BLOB)::BIGINT AS n_bytes, md5(text) AS blob_md5
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Multimodal.withBlob(t(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id"), length(col("blob")).cast("long").as("n_bytes"),
          md5(col("blob")).as("blob_md5"))
        .orderBy("doc_id")
    },

    Q("q44_multimodal_decode",
      // REAL image decode, oracle-checked: the engine builds a genuine
      // 24-bit padded BMP per document (deterministic pixel formula) and
      // parses it back with the pure-JVM decoder — header fields, 4-byte
      // row padding, bottom-up rows, BGR channel order all exercised. The
      // oracle predicts the decoded stats from the generation formula
      // alone, so ANY parser bug breaks the hash. weighted_r is a
      // position-sensitive checksum (Σ i·R(i)) that catches orientation
      // errors the order-independent means would mask. Sums stay < 2^53:
      // exact in both engines; CASTs pin BIGINT vs HUGEINT.
      """WITH dims AS (
        |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents),
        |px AS (
        |  SELECT doc_id, w, h, unnest(generate_series(0, w * h - 1)) AS i FROM dims)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(w * h AS BIGINT) AS n_pixels,
        |  round(avg((3 * doc_id + 7 * i) % 256), 6) AS mean_r,
        |  round(avg((2 * doc_id + 5 * i) % 256), 6) AS mean_g,
        |  round(avg((doc_id + 3 * i) % 256), 6) AS mean_b,
        |  CAST(sum(i * ((3 * doc_id + 7 * i) % 256)) AS BIGINT) AS weighted_r
        |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin) { (s, d) =>
      Multimodal.decodeBmpFeatures(
          Multimodal.syntheticBmps(t(s, d, "documents").select("doc_id"), s), s)
        .select(col("doc_id"), col("width"), col("height"), col("n_pixels"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"),
          col("weighted_r"))
        .orderBy("doc_id")
    },

    Q("q179_image_dhash",
      // perceptual image fingerprints over the REAL BMP decode path:
      // dHash = 9×8 nearest-neighbor luma grid, bit y·8+x iff
      // luma(x) < luma(x+1) — the image-dedup signature that feeds the
      // same pigeonhole-banded pairing as text SimHash
      // (MultimodalSpec pins perturbation locality + banded pairing).
      // The oracle replays the synthetic fixture's pixel FORMULA, the
      // grid sampling arithmetic, and the bit packing in SQL — bit 63
      // rides an explicit min-long literal (a 1<<63 shift overflows
      // DuckDB's checked BIGINT) OR-folded with the rest.
      """WITH dims AS (
        |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents),
        |cells AS (
        |  SELECT d.doc_id, gx.gx, gy.gy,
        |    ((gy.gy * d.h) // 8) * d.w + ((gx.gx * d.w) // 9) AS i
        |  FROM dims d,
        |    (SELECT unnest(generate_series(0, 8)) AS gx) gx,
        |    (SELECT unnest(generate_series(0, 7)) AS gy) gy),
        |lum AS (
        |  SELECT doc_id, gx, gy,
        |    299 * ((3 * doc_id + 7 * i) % 256)
        |  + 587 * ((2 * doc_id + 5 * i) % 256)
        |  + 114 * ((doc_id + 3 * i) % 256) AS luma
        |  FROM cells),
        |bits AS (
        |  SELECT a.doc_id, a.gy * 8 + a.gx AS bit
        |  FROM lum a JOIN lum b
        |    ON b.doc_id = a.doc_id AND b.gy = a.gy AND b.gx = a.gx + 1
        |  WHERE a.gx < 8 AND a.luma < b.luma)
        |SELECT d.doc_id,
        |  coalesce(bit_or(CASE WHEN bit = 63 THEN (-9223372036854775807 - 1)::BIGINT
        |                       ELSE (1::BIGINT << bit::INT) END), 0) AS dhash
        |FROM dims d LEFT JOIN bits USING (doc_id)
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      Multimodal.imageDHashes(
          Multimodal.syntheticBmps(t(s, d, "documents").select("doc_id"), s), s)
        .orderBy("doc_id")
    },

    Q("q191_image_dhash_all",
      // UNIFIED perceptual fingerprints over a MIXED-format corpus —
      // the format-sniffing dispatch (BMP / PNG 0/2/6 / baseline JPEG /
      // GIF incl. interlace) is the capability a real crawl needs: one
      // dHash space across every still-image decoder the repo owns.
      // The oracle replays each format's own fixture formula (BMP/PNG
      // the RGB triple, PNG gray the single sample ×1000, JPEG the
      // block-constant gray value — integer-exact end to end per q133 —
      // GIF the palette map g=2v,b=3v) over the shared 9×8 grid
      // arithmetic and bit packing. Any dispatch, decoder, or sampling
      // disagreement between formats breaks the hash.
      """WITH dims AS (
        |  SELECT doc_id, doc_id % 4 AS fmt,
        |    CASE doc_id % 4 WHEN 0 THEN 8 + doc_id % 9 WHEN 1 THEN 8 + doc_id % 11
        |         WHEN 2 THEN 8 * (1 + doc_id % 5) ELSE 8 + doc_id % 13 END AS w,
        |    CASE doc_id % 4 WHEN 0 THEN 8 + doc_id % 7 WHEN 1 THEN 8 + doc_id % 5
        |         WHEN 2 THEN 8 * (1 + doc_id % 3) ELSE 8 + doc_id % 6 END AS h
        |  FROM documents),
        |cells AS (
        |  SELECT d.doc_id, d.fmt, d.w, gx.gx, gy.gy,
        |    ((gy.gy * d.h) // 8) * d.w + ((gx.gx * d.w) // 9) AS i
        |  FROM dims d,
        |    (SELECT unnest(generate_series(0, 8)) AS gx) gx,
        |    (SELECT unnest(generate_series(0, 7)) AS gy) gy),
        |lum AS (
        |  SELECT doc_id, gx, gy,
        |    CASE
        |      WHEN fmt = 2 THEN
        |        1000 * ((5 * doc_id + 11 * (((i // w) // 8) * (w // 8) + (i % w) // 8)) % 256)
        |      WHEN fmt = 3 THEN
        |        299 * ((5 * doc_id + 7 * i) % 256)
        |      + 587 * ((2 * ((5 * doc_id + 7 * i) % 256)) % 256)
        |      + 114 * ((3 * ((5 * doc_id + 7 * i) % 256)) % 256)
        |      WHEN fmt = 1 AND doc_id % 3 = 0 THEN 1000 * ((3 * doc_id + 7 * i) % 256)
        |      ELSE 299 * ((3 * doc_id + 7 * i) % 256)
        |         + 587 * ((2 * doc_id + 5 * i) % 256)
        |         + 114 * ((doc_id + 3 * i) % 256)
        |    END AS luma
        |  FROM cells),
        |bits AS (
        |  SELECT a.doc_id, a.gy * 8 + a.gx AS bit
        |  FROM lum a JOIN lum b
        |    ON b.doc_id = a.doc_id AND b.gy = a.gy AND b.gx = a.gx + 1
        |  WHERE a.gx < 8 AND a.luma < b.luma)
        |SELECT d.doc_id, CAST(d.fmt AS INT) AS fmt,
        |  coalesce(bit_or(CASE WHEN bit = 63 THEN (-9223372036854775807 - 1)::BIGINT
        |                       ELSE (1::BIGINT << bit::INT) END), 0) AS dhash
        |FROM dims d LEFT JOIN bits USING (doc_id)
        |GROUP BY d.doc_id, d.fmt ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      Multimodal.imageDHashes(
          Multimodal.syntheticMixedImages(t(s, d, "documents").select("doc_id"), s), s)
        .withColumn("fmt", (col("doc_id") % 4).cast("int"))
        .select(col("doc_id"), col("fmt"), col("dhash"))
        .orderBy("doc_id")
    },

    Q("q196_image_neardup_crossformat",
      // END-TO-END cross-format image dedup — the capability the
      // unified hash space exists for: a corpus of mixed BMP/PNG/JPEG/
      // GIF where every BMP also rides as a PNG RE-ENCODE of the same
      // logical image (doc_id + 1e6 — the re-upload-in-another-
      // container scenario). imageDHashes sniffs per row, and the SAME
      // pigeonhole banding as text SimHash pairs the re-encodes at
      // hamming 0 ACROSS container formats. The oracle derives every
      // row's dHash from its pixel formula (re-encodes reuse their
      // source's BMP formula — lossless pixels, equal hash by
      // construction) and brute-forces pairs at hamming ≤ 3; banding
      // (4 × 16-bit bands) is exact there by pigeonhole, so equality
      // with brute force IS the claim.
      """WITH rows AS (
        |  SELECT doc_id, doc_id AS src, doc_id % 4 AS fmt FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, doc_id AS src, 0 AS fmt
        |  FROM documents WHERE doc_id % 4 = 0),
        |dims AS (
        |  SELECT doc_id, src, fmt,
        |    CASE fmt WHEN 0 THEN 8 + src % 9 WHEN 1 THEN 8 + src % 11
        |         WHEN 2 THEN 8 * (1 + src % 5) ELSE 8 + src % 13 END AS w,
        |    CASE fmt WHEN 0 THEN 8 + src % 7 WHEN 1 THEN 8 + src % 5
        |         WHEN 2 THEN 8 * (1 + src % 3) ELSE 8 + src % 6 END AS h
        |  FROM rows),
        |cells AS (
        |  SELECT d.doc_id, d.src, d.fmt, d.w, gx.gx, gy.gy,
        |    ((gy.gy * d.h) // 8) * d.w + ((gx.gx * d.w) // 9) AS i
        |  FROM dims d,
        |    (SELECT unnest(generate_series(0, 8)) AS gx) gx,
        |    (SELECT unnest(generate_series(0, 7)) AS gy) gy),
        |lum AS (
        |  SELECT doc_id, gx, gy,
        |    CASE
        |      WHEN fmt = 2 THEN
        |        1000 * ((5 * src + 11 * (((i // w) // 8) * (w // 8) + (i % w) // 8)) % 256)
        |      WHEN fmt = 3 THEN
        |        299 * ((5 * src + 7 * i) % 256)
        |      + 587 * ((2 * ((5 * src + 7 * i) % 256)) % 256)
        |      + 114 * ((3 * ((5 * src + 7 * i) % 256)) % 256)
        |      WHEN fmt = 1 AND src % 3 = 0 THEN 1000 * ((3 * src + 7 * i) % 256)
        |      ELSE 299 * ((3 * src + 7 * i) % 256)
        |         + 587 * ((2 * src + 5 * i) % 256)
        |         + 114 * ((src + 3 * i) % 256)
        |    END AS luma
        |  FROM cells),
        |bits AS (
        |  SELECT a.doc_id, a.gy * 8 + a.gx AS bit
        |  FROM lum a JOIN lum b
        |    ON b.doc_id = a.doc_id AND b.gy = a.gy AND b.gx = a.gx + 1
        |  WHERE a.gx < 8 AND a.luma < b.luma),
        |sig AS (
        |  SELECT d.doc_id,
        |    coalesce(bit_or(CASE WHEN bit = 63 THEN (-9223372036854775807 - 1)::BIGINT
        |                         ELSE (1::BIGINT << bit::INT) END), 0) AS dhash
        |  FROM dims d LEFT JOIN bits USING (doc_id)
        |  GROUP BY d.doc_id)
        |SELECT a.doc_id AS id1, b.doc_id AS id2,
        |  bit_count(xor(a.dhash, b.dhash))::BIGINT AS hamming
        |FROM sig a JOIN sig b
        |  ON a.doc_id < b.doc_id AND bit_count(xor(a.dhash, b.dhash)) <= 3
        |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      val sigs = Multimodal.imageDHashes(
        Multimodal.syntheticCrossEncodedImages(
          t(s, d, "documents").select("doc_id"), s), s)
      Dedup.simhashPairs(sigs, "doc_id", "dhash",
          nBands = 4, maxHamming = 3, sigBits = 64)
        .orderBy("id1", "id2")
    },

    Q("q180_apng_frames",
      // INTER-FRAME video decode, oracle-checked end to end: the engine
      // builds a real APNG per document (frame 0 full-canvas via IDAT,
      // frames k >= 1 as fdAT PATCH rectangles) and composites through
      // the fcTL dispose/blend rules. The oracle replays the closed form
      // of the composite — per pixel, the NEWEST covering patch m <= k
      // wins (arg_max over the covering set), else the frame-0 formula —
      // so any bug in fdAT parsing, sequence numbers, patch offsets, or
      // compositing shifts a mean or the position-sensitive weighted_r.
      s"""WITH $apngCtes,
        |px AS (
        |  SELECT doc_id, w, h, fw, fh, k,
        |    unnest(generate_series(0, w * h - 1)) AS i
        |  FROM frames),
        |cov AS (
        |  SELECT p.doc_id, p.k, p.i, p.fw, m.m,
        |    (p.i % p.w) - ((p.doc_id + 3 * m.m) % (p.w - p.fw + 1)) AS dx,
        |    (p.i // p.w) - ((p.doc_id + 5 * m.m) % (p.h - p.fh + 1)) AS dy
        |  FROM px p JOIN (SELECT unnest(generate_series(1, 3)) AS m) m ON m.m <= p.k
        |  WHERE dx >= 0 AND dx < p.fw AND dy >= 0 AND dy < p.fh),
        |sel AS (
        |  SELECT doc_id, k, i, max(m) AS m, arg_max(dy * fw + dx, m) AS j
        |  FROM cov GROUP BY doc_id, k, i),
        |val AS (
        |  SELECT p.doc_id, p.k, p.w, p.h, p.i,
        |    CASE WHEN s.m IS NULL THEN (3 * p.doc_id + 7 * p.i) % 256
        |         ELSE (3 * p.doc_id + 7 * s.j + 13 * s.m) % 256 END AS r,
        |    CASE WHEN s.m IS NULL THEN (2 * p.doc_id + 5 * p.i) % 256
        |         ELSE (2 * p.doc_id + 5 * s.j + 13 * s.m) % 256 END AS g,
        |    CASE WHEN s.m IS NULL THEN (p.doc_id + 3 * p.i) % 256
        |         ELSE (p.doc_id + 3 * s.j + 13 * s.m) % 256 END AS b
        |  FROM px p LEFT JOIN sel s
        |    ON s.doc_id = p.doc_id AND s.k = p.k AND s.i = p.i)
        |SELECT doc_id, CAST(k AS INT) AS frame_idx, CAST(w AS INT) AS width,
        |  CAST(h AS INT) AS height, CAST(w * h AS BIGINT) AS n_pixels,
        |  round(avg(r), 6) AS mean_r, round(avg(g), 6) AS mean_g,
        |  round(avg(b), 6) AS mean_b,
        |  CAST(sum(i * r) AS BIGINT) AS weighted_r
        |FROM val GROUP BY doc_id, k, w, h
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      Apng.decodeApngFrameFeatures(
          Apng.syntheticApngs(t(s, d, "documents").select("doc_id"), s), s)
        .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
          col("n_pixels"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"),
          col("weighted_r"))
        .orderBy("doc_id", "frame_idx")
    },

    Q("q181_video_frame_dhash",
      // per-frame perceptual fingerprints over COMPOSITED video frames:
      // q179's dHash grid arithmetic replayed on top of q180's
      // newest-covering-patch closed form — only the 9×8 grid sample
      // points are materialized, not every pixel
      s"""WITH $apngCtes,
        |cells AS (
        |  SELECT f.doc_id, f.w, f.h, f.fw, f.fh, f.k, gx.gx, gy.gy,
        |    ((gy.gy * f.h) // 8) * f.w + ((gx.gx * f.w) // 9) AS i
        |  FROM frames f,
        |    (SELECT unnest(generate_series(0, 8)) AS gx) gx,
        |    (SELECT unnest(generate_series(0, 7)) AS gy) gy),
        |cov AS (
        |  SELECT c.doc_id, c.k, c.gx, c.gy, c.fw, m.m,
        |    (c.i % c.w) - ((c.doc_id + 3 * m.m) % (c.w - c.fw + 1)) AS dx,
        |    (c.i // c.w) - ((c.doc_id + 5 * m.m) % (c.h - c.fh + 1)) AS dy
        |  FROM cells c JOIN (SELECT unnest(generate_series(1, 3)) AS m) m ON m.m <= c.k
        |  WHERE dx >= 0 AND dx < c.fw AND dy >= 0 AND dy < c.fh),
        |sel AS (
        |  SELECT doc_id, k, gx, gy, max(m) AS m, arg_max(dy * fw + dx, m) AS j
        |  FROM cov GROUP BY doc_id, k, gx, gy),
        |lum AS (
        |  SELECT c.doc_id, c.k, c.gx, c.gy,
        |    299 * (CASE WHEN s.m IS NULL THEN (3 * c.doc_id + 7 * c.i) % 256
        |                ELSE (3 * c.doc_id + 7 * s.j + 13 * s.m) % 256 END)
        |  + 587 * (CASE WHEN s.m IS NULL THEN (2 * c.doc_id + 5 * c.i) % 256
        |                ELSE (2 * c.doc_id + 5 * s.j + 13 * s.m) % 256 END)
        |  + 114 * (CASE WHEN s.m IS NULL THEN (c.doc_id + 3 * c.i) % 256
        |                ELSE (c.doc_id + 3 * s.j + 13 * s.m) % 256 END) AS luma
        |  FROM cells c LEFT JOIN sel s
        |    ON s.doc_id = c.doc_id AND s.k = c.k AND s.gx = c.gx AND s.gy = c.gy),
        |bits AS (
        |  SELECT a.doc_id, a.k, a.gy * 8 + a.gx AS bit
        |  FROM lum a JOIN lum b
        |    ON b.doc_id = a.doc_id AND b.k = a.k AND b.gy = a.gy AND b.gx = a.gx + 1
        |  WHERE a.gx < 8 AND a.luma < b.luma)
        |SELECT f.doc_id, CAST(f.k AS INT) AS frame_idx,
        |  coalesce(bit_or(CASE WHEN bit = 63 THEN (-9223372036854775807 - 1)::BIGINT
        |                       ELSE (1::BIGINT << bit::INT) END), 0) AS dhash
        |FROM frames f LEFT JOIN bits ON bits.doc_id = f.doc_id AND bits.k = f.k
        |GROUP BY f.doc_id, f.k ORDER BY f.doc_id, frame_idx""".stripMargin) { (s, d) =>
      Apng.apngFrameDHashes(
          Apng.syntheticApngs(t(s, d, "documents").select("doc_id"), s), s)
        .orderBy("doc_id", "frame_idx")
    },

    Q("q182_video_signatures",
      // temporal video fingerprint: scene cuts (consecutive-frame dHash
      // hamming > 16) + the 64-bit majority-vote fold — the oracle
      // builds per-frame dhashes exactly as q181, then replays the lag
      // comparison and the strict-majority bit vote
      s"""WITH $apngCtes,
        |cells AS (
        |  SELECT f.doc_id, f.w, f.h, f.fw, f.fh, f.k, gx.gx, gy.gy,
        |    ((gy.gy * f.h) // 8) * f.w + ((gx.gx * f.w) // 9) AS i
        |  FROM frames f,
        |    (SELECT unnest(generate_series(0, 8)) AS gx) gx,
        |    (SELECT unnest(generate_series(0, 7)) AS gy) gy),
        |cov AS (
        |  SELECT c.doc_id, c.k, c.gx, c.gy, c.fw, m.m,
        |    (c.i % c.w) - ((c.doc_id + 3 * m.m) % (c.w - c.fw + 1)) AS dx,
        |    (c.i // c.w) - ((c.doc_id + 5 * m.m) % (c.h - c.fh + 1)) AS dy
        |  FROM cells c JOIN (SELECT unnest(generate_series(1, 3)) AS m) m ON m.m <= c.k
        |  WHERE dx >= 0 AND dx < c.fw AND dy >= 0 AND dy < c.fh),
        |sel AS (
        |  SELECT doc_id, k, gx, gy, max(m) AS m, arg_max(dy * fw + dx, m) AS j
        |  FROM cov GROUP BY doc_id, k, gx, gy),
        |lum AS (
        |  SELECT c.doc_id, c.k, c.gx, c.gy,
        |    299 * (CASE WHEN s.m IS NULL THEN (3 * c.doc_id + 7 * c.i) % 256
        |                ELSE (3 * c.doc_id + 7 * s.j + 13 * s.m) % 256 END)
        |  + 587 * (CASE WHEN s.m IS NULL THEN (2 * c.doc_id + 5 * c.i) % 256
        |                ELSE (2 * c.doc_id + 5 * s.j + 13 * s.m) % 256 END)
        |  + 114 * (CASE WHEN s.m IS NULL THEN (c.doc_id + 3 * c.i) % 256
        |                ELSE (c.doc_id + 3 * s.j + 13 * s.m) % 256 END) AS luma
        |  FROM cells c LEFT JOIN sel s
        |    ON s.doc_id = c.doc_id AND s.k = c.k AND s.gx = c.gx AND s.gy = c.gy),
        |bits AS (
        |  SELECT a.doc_id, a.k, a.gy * 8 + a.gx AS bit
        |  FROM lum a JOIN lum b
        |    ON b.doc_id = a.doc_id AND b.k = a.k AND b.gy = a.gy AND b.gx = a.gx + 1
        |  WHERE a.gx < 8 AND a.luma < b.luma),
        |fh AS (
        |  SELECT f.doc_id, f.k,
        |    coalesce(bit_or(CASE WHEN bit = 63 THEN (-9223372036854775807 - 1)::BIGINT
        |                         ELSE (1::BIGINT << bit::INT) END), 0) AS dhash
        |  FROM frames f LEFT JOIN bits ON bits.doc_id = f.doc_id AND bits.k = f.k
        |  GROUP BY f.doc_id, f.k),
        |prevs AS (
        |  SELECT doc_id, dhash,
        |    lag(dhash) OVER (PARTITION BY doc_id ORDER BY k) AS prev
        |  FROM fh),
        |cuts AS (
        |  SELECT doc_id, CAST(count(*) AS INT) AS n_frames,
        |    CAST(count(*) FILTER (WHERE prev IS NOT NULL
        |      AND bit_count(xor(dhash, prev)) > 16) AS INT) AS n_cuts
        |  FROM prevs GROUP BY doc_id),
        |vote AS (
        |  SELECT fh.doc_id, b.b,
        |    sum(CASE WHEN ((dhash >> b.b) & 1) = 1 THEN 1 ELSE 0 END) AS nset,
        |    count(*) AS nf
        |  FROM fh CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) b
        |  GROUP BY fh.doc_id, b.b),
        |sig AS (
        |  SELECT doc_id,
        |    coalesce(bit_or(CASE WHEN 2 * nset > nf THEN
        |      CASE WHEN b = 63 THEN (-9223372036854775807 - 1)::BIGINT
        |           ELSE (1::BIGINT << b::INT) END END), 0) AS signature
        |  FROM vote GROUP BY doc_id)
        |SELECT c.doc_id, c.n_frames, c.n_cuts, s.signature
        |FROM cuts c JOIN sig s USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Apng.videoSignatures(
          Apng.syntheticApngs(t(s, d, "documents").select("doc_id"), s), s,
          cutBits = 16)
        .orderBy("doc_id")
    },

    Q("q183_video_neardup_pairs",
      // video near-dup end to end: a 1-in-17 deterministic document
      // sample carries videos built from seed = doc_id % 23 (rows
      // sharing a seed are byte-identical videos — the controlled-dup
      // fixture), temporal signatures pair through the SAME
      // pigeonhole-banded machinery as text SimHash / image dHash
      // (4 bands over 64 bits is exact for hamming <= 3), and the
      // oracle verifies with an all-pairs filter over the sample —
      // banding-vs-exact equality IS the correctness claim. The oracle
      // computes signatures once per distinct SEED (23 rows), not per
      // document, then fans out through the doc->seed map.
      s"""WITH docs AS (
        |  SELECT doc_id, doc_id % 23 AS seed FROM documents WHERE doc_id % 17 = 0),
        |dims AS (
        |  SELECT DISTINCT seed, 9 + seed % 8 AS w, 8 + seed % 7 AS h,
        |    2 + seed % 3 AS f,
        |    (9 + seed % 8 + 1) // 2 AS fw, (8 + seed % 7 + 1) // 2 AS fh
        |  FROM docs),
        |frames AS (
        |  SELECT d.*, unnest(generate_series(0, f - 1)) AS k FROM dims d),
        |cells AS (
        |  SELECT f.seed, f.w, f.h, f.fw, f.fh, f.k, gx.gx, gy.gy,
        |    ((gy.gy * f.h) // 8) * f.w + ((gx.gx * f.w) // 9) AS i
        |  FROM frames f,
        |    (SELECT unnest(generate_series(0, 8)) AS gx) gx,
        |    (SELECT unnest(generate_series(0, 7)) AS gy) gy),
        |cov AS (
        |  SELECT c.seed, c.k, c.gx, c.gy, c.fw, m.m,
        |    (c.i % c.w) - ((c.seed + 3 * m.m) % (c.w - c.fw + 1)) AS dx,
        |    (c.i // c.w) - ((c.seed + 5 * m.m) % (c.h - c.fh + 1)) AS dy
        |  FROM cells c JOIN (SELECT unnest(generate_series(1, 3)) AS m) m ON m.m <= c.k
        |  WHERE dx >= 0 AND dx < c.fw AND dy >= 0 AND dy < c.fh),
        |sel AS (
        |  SELECT seed, k, gx, gy, max(m) AS m, arg_max(dy * fw + dx, m) AS j
        |  FROM cov GROUP BY seed, k, gx, gy),
        |lum AS (
        |  SELECT c.seed, c.k, c.gx, c.gy,
        |    299 * (CASE WHEN s.m IS NULL THEN (3 * c.seed + 7 * c.i) % 256
        |                ELSE (3 * c.seed + 7 * s.j + 13 * s.m) % 256 END)
        |  + 587 * (CASE WHEN s.m IS NULL THEN (2 * c.seed + 5 * c.i) % 256
        |                ELSE (2 * c.seed + 5 * s.j + 13 * s.m) % 256 END)
        |  + 114 * (CASE WHEN s.m IS NULL THEN (c.seed + 3 * c.i) % 256
        |                ELSE (c.seed + 3 * s.j + 13 * s.m) % 256 END) AS luma
        |  FROM cells c LEFT JOIN sel s
        |    ON s.seed = c.seed AND s.k = c.k AND s.gx = c.gx AND s.gy = c.gy),
        |bits AS (
        |  SELECT a.seed, a.k, a.gy * 8 + a.gx AS bit
        |  FROM lum a JOIN lum b
        |    ON b.seed = a.seed AND b.k = a.k AND b.gy = a.gy AND b.gx = a.gx + 1
        |  WHERE a.gx < 8 AND a.luma < b.luma),
        |fh AS (
        |  SELECT f.seed, f.k,
        |    coalesce(bit_or(CASE WHEN bit = 63 THEN (-9223372036854775807 - 1)::BIGINT
        |                         ELSE (1::BIGINT << bit::INT) END), 0) AS dhash
        |  FROM frames f LEFT JOIN bits ON bits.seed = f.seed AND bits.k = f.k
        |  GROUP BY f.seed, f.k),
        |vote AS (
        |  SELECT fh.seed, b.b,
        |    sum(CASE WHEN ((dhash >> b.b) & 1) = 1 THEN 1 ELSE 0 END) AS nset,
        |    count(*) AS nf
        |  FROM fh CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) b
        |  GROUP BY fh.seed, b.b),
        |sig AS (
        |  SELECT seed,
        |    coalesce(bit_or(CASE WHEN 2 * nset > nf THEN
        |      CASE WHEN b = 63 THEN (-9223372036854775807 - 1)::BIGINT
        |           ELSE (1::BIGINT << b::INT) END END), 0) AS signature
        |  FROM vote GROUP BY seed),
        |docsig AS (
        |  SELECT d.doc_id, s.signature FROM docs d JOIN sig s USING (seed))
        |SELECT a.doc_id AS id1, b.doc_id AS id2,
        |  bit_count(xor(a.signature, b.signature))::BIGINT AS hamming
        |FROM docsig a JOIN docsig b
        |  ON a.doc_id < b.doc_id
        | AND bit_count(xor(a.signature, b.signature)) <= 3
        |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      val sample = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") % 17 === 0)
        .withColumn("seed", col("doc_id") % 23)
      val sigs = Apng.videoSignatures(Apng.syntheticApngsSeeded(sample, s), s)
        .select(col("doc_id"), col("signature"))
      Dedup.simhashPairs(sigs, "doc_id", "signature",
          nBands = 4, maxHamming = 3, sigBits = 64)
        .orderBy("id1", "id2")
    },

    Q("q184_audio_fingerprint",
      // perceptual AUDIO fingerprints over the REAL PCM16 decode path:
      // Haitsma–Kalker structure (sub-band energies, sign of the
      // time×band double difference) in exact integer arithmetic —
      // window 45 samples, 9 sub-bands of 5, 8 bits per frame from
      // frame 1. The oracle replays samples from the fixture formula,
      // the |s| energy sums, both difference layers, and the bit
      // packing; docs under 2 frames (n < 90) emit nothing by contract.
      """WITH dims AS (SELECT doc_id, 64 + doc_id % 129 AS n FROM documents),
        |frames AS (
        |  SELECT doc_id, unnest(generate_series(0, n // 45 - 1)) AS f
        |  FROM dims WHERE n // 45 >= 2),
        |be AS (
        |  SELECT doc_id, f, b.b,
        |    sum(abs(((13 * doc_id + 31 * (f * 45 + b.b * 5 + k.k)) % 65536) - 32768)) AS e
        |  FROM frames
        |  CROSS JOIN (SELECT unnest(generate_series(0, 8)) AS b) b
        |  CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS k) k
        |  GROUP BY doc_id, f, b.b),
        |diffs AS (
        |  SELECT a.doc_id, a.f, a.b, a.e - bb.e AS d
        |  FROM be a JOIN be bb
        |    ON bb.doc_id = a.doc_id AND bb.f = a.f AND bb.b = a.b + 1
        |  WHERE a.b < 8),
        |bits AS (
        |  SELECT c.doc_id, c.f, c.b
        |  FROM diffs c JOIN diffs p
        |    ON p.doc_id = c.doc_id AND p.f = c.f - 1 AND p.b = c.b
        |  WHERE c.f >= 1 AND c.d - p.d > 0)
        |SELECT f2.doc_id, CAST(f2.f AS INT) AS frame_idx,
        |  CAST(coalesce(sum(1::BIGINT << bits.b::INT), 0) AS BIGINT) AS fp
        |FROM (SELECT doc_id, f FROM frames WHERE f >= 1) f2
        |LEFT JOIN bits ON bits.doc_id = f2.doc_id AND bits.f = f2.f
        |GROUP BY f2.doc_id, f2.f
        |ORDER BY f2.doc_id, frame_idx""".stripMargin) { (s, d) =>
      Multimodal.audioFingerprints(
          Multimodal.syntheticWavs(t(s, d, "documents").select("doc_id"), s), s)
        .orderBy("doc_id", "frame_idx")
    },

    Q("q186_jaccard_join_exact",
      // EXACT set-similarity join (prefix filtering, AllPairs/PPJoin
      // family): every pair with shingle-Jaccard >= 1/2, NO recall loss
      // — the engine exposes only each doc's rarest n-ceil(n/2)+1
      // shingles as join keys (global df order) and verifies candidates
      // with integer arithmetic; the oracle is the brute-force
      // all-sharing-pairs filter over the full corpus, so
      // prefix-pruning-vs-exact equality IS the correctness claim (cf.
      // q183's banding argument, but lossless by construction rather
      // than pigeonhole-bounded).
      """WITH words AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
        |        FROM words WHERE len(w) >= 3)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id1, id2, CAST(i AS BIGINT) AS inter,
        |  CAST(z1.n AS BIGINT) AS n1, CAST(z2.n AS BIGINT) AS n2
        |FROM inter
        |JOIN sizes z1 ON z1.doc_id = id1
        |JOIN sizes z2 ON z2.doc_id = id2
        |WHERE 3 * i >= z1.n + z2.n
        |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      Dedup.prefixJaccardJoin(
          t(s, d, "documents"), "doc_id", "text", tNum = 1, tDen = 2)
        .orderBy("id1", "id2")
    },

    Q("q188_lsh_recall_eval",
      // the approximation audit the "measure, don't guess" rule demands:
      // MinHash-LSH pair recall measured against the EXACT prefix-join
      // ground truth (q186) on the same corpus and threshold. LSH output
      // is exact-verified (candidates filter on true Jaccard), so
      // lsh ⊆ exact and n_missed is pure banding loss. All-integer
      // threshold arithmetic (3·i ≥ n1+n2 ⇔ J ≥ 1/2) — no float
      // boundary on either engine. One row: (n_exact, n_lsh, n_missed).
      s"""WITH $minhashCtes,
         |lsh AS (
         |  SELECT i.id1, i.id2 FROM inter i
         |  JOIN sizes z1 ON z1.doc_id = i.id1
         |  JOIN sizes z2 ON z2.doc_id = i.id2
         |  WHERE 3 * i.i >= z1.sz + z2.sz),
         |exact0 AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |exact AS (
         |  SELECT e.id1, e.id2 FROM exact0 e
         |  JOIN sizes z1 ON z1.doc_id = e.id1
         |  JOIN sizes z2 ON z2.doc_id = e.id2
         |  WHERE 3 * e.i >= z1.sz + z2.sz)
         |SELECT
         |  CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
         |  CAST((SELECT count(*) FROM lsh) AS BIGINT) AS n_lsh,
         |  CAST((SELECT count(*) FROM
         |    (SELECT id1, id2 FROM exact EXCEPT SELECT id1, id2 FROM lsh) t)
         |    AS BIGINT) AS n_missed""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      // each pair set is consumed TWICE (its count + the anti-join), so
      // materialize each ONCE: at sf0.1 exchange reuse hid the doubled
      // lineage, at sf1 it re-ran both full pipelines a second time —
      // the round-13 scale-step's one superlinear outlier (19× at 10×
      // data; components q186/q34 measure ≈linear). The pair sets are
      // thousands of rows — checkpoint cost is noise.
      val exact = graft.operators.Checkpoints.truncate(
        Dedup.prefixJaccardJoin(docs, "doc_id", "text", 1, 2)
          .select("id1", "id2"))
      val lsh = graft.operators.Checkpoints.truncate(
        Dedup.nearDupPairsMinHash(docs, "doc_id", "text",
            shingleK = 3, numHashes = 12, rowsPerBand = 4, threshold = 0.5)
          .select("id1", "id2"))
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(lsh.agg(count(lit(1)).as("n_lsh")))
        .crossJoin(exact.join(lsh, Seq("id1", "id2"), "left_anti")
          .agg(count(lit(1)).as("n_missed")))
    },

    Q("q187_bpe_pair_counts",
      // the first layer of distributed BPE training (Bpe.train): the
      // corpus collapses to its distinct-word vocabulary, words become
      // char symbols + '</w>', adjacent pairs count weighted by word
      // frequency — the exact argmax input of merge 1, with training's
      // (cnt desc, left, right) tie order. The oracle replays word
      // splitting, the end-of-word symbol, and the weighted pair count;
      // the iterative trajectory itself is pinned in BpeSpec (merge k+1
      // depends on merge k — not single-layer SQL).
      """WITH words AS (
        |  SELECT w AS word, count(*) AS c FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents) t
        |  WHERE w <> '' GROUP BY w),
        |syms AS (
        |  SELECT word, c, i,
        |    CASE WHEN i <= length(word) THEN substr(word, i, 1)
        |         ELSE '</w>' END AS s
        |  FROM words, LATERAL (SELECT unnest(generate_series(1, length(word) + 1)) AS i) g),
        |pairs AS (
        |  SELECT a.s AS sym_l, b.s AS sym_r, a.c
        |  FROM syms a JOIN syms b ON b.word = a.word AND b.i = a.i + 1)
        |SELECT sym_l, sym_r, CAST(sum(c) AS BIGINT) AS cnt
        |FROM pairs GROUP BY sym_l, sym_r
        |ORDER BY cnt DESC, sym_l, sym_r LIMIT 20""".stripMargin) { (s, d) =>
      import graft.operators.Bpe
      Bpe.pairCounts(Bpe.wordVocab(t(s, d, "documents"), "text"))
        .orderBy(col("cnt").desc, col("sym_l"), col("sym_r"))
        .limit(20)
    },

    Q("q194_bpe_tokenize",
      // the ENCODE side of BPE: every document tokenized with a frozen
      // 16-merge table (trained once by Bpe.train on this corpus at
      // sf0.01 and frozen as a literal, so the query is a pure function
      // of the data — training's own trajectory is q187 + BpeSpec). The
      // oracle replays greedy left-to-right merge application as a
      // string-rewrite chain: each symbol rides as ' sym ' in a
      // double-space-separated stream, so replace(' l  r ', ' lr ')
      // has EXACTLY mergeOnce's non-overlapping left-to-right
      // semantics, and word boundaries cannot false-match because a
      // word-final symbol always carries '</w>' while a merge's left
      // symbol never does. n_tokens drives the budget family (q195).
      s"""SELECT doc_id,
        |  CASE WHEN trim(text) = '' THEN 0
        |       ELSE len(string_split($bpeChainSql, '  ')) END::BIGINT AS n_tokens,
        |  CASE WHEN trim(text) = '' THEN md5('')
        |       ELSE md5(replace($bpeChainSql, '  ', ' ')) END AS tok_md5
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      import graft.operators.Bpe
      Bpe.tokenize(t(s, d, "documents"), "doc_id", "text", bpeFrozenMerges)
        .select(col("doc_id"), size(col("tokens")).cast("long").as("n_tokens"),
          md5(array_join(col("tokens"), " ")).as("tok_md5"))
        .orderBy("doc_id")
    },

    Q("q195_bpe_budget_select",
      // q171's token-budget fill re-run on REAL tokenizer counts: the
      // 40% budget, per-score bucket walk, and basis-point hash gate are
      // unchanged, but the token mass is now n_tokens from the frozen
      // BPE table (q194) instead of a char-count estimate — budgets in
      // actual subword tokens, the unit LLM training data is priced in.
      s"""WITH tk AS (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN trim(text) = '' THEN 0
        |         ELSE len(string_split($bpeChainSql, '  ')) END::BIGINT AS n_tokens
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, n_tokens, least(9, n_chars // 100) AS score FROM tk),
        |tot AS (SELECT sum(n_tokens) * 2 // 5 AS budget FROM s),
        |b AS (SELECT score, sum(n_tokens) AS btok FROM s GROUP BY score),
        |c AS (SELECT score, btok,
        |    coalesce(sum(btok) OVER (ORDER BY score DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
        |  FROM b),
        |r AS (SELECT score,
        |    CASE WHEN bef >= budget THEN 0
        |         WHEN bef + btok <= budget THEN 10000
        |         ELSE (budget - bef) * 10000 // btok END AS bp
        |  FROM c, tot)
        |SELECT s.doc_id, CAST(s.score AS BIGINT) AS score, s.n_tokens
        |FROM s JOIN r USING (score)
        |WHERE ${sqlHash60("s.doc_id::VARCHAR")} % 10000 < r.bp
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      import graft.operators.Bpe
      val docs = t(s, d, "documents")
      val toks = Bpe.tokenize(docs, "doc_id", "text", bpeFrozenMerges)
        .select(col("doc_id"), size(col("tokens")).cast("long").as("n_tokens"))
      val scored = docs.select(col("doc_id").as("__did"),
          least(lit(9L), expr("n_chars div 100")).as("score"))
        .join(toks, col("__did") === col("doc_id")).drop("__did")
      Curation.budgetSelectFraction(scored, "score", "n_tokens", "doc_id", 2L, 5L)
        .select(col("doc_id"), col("score").cast("long").as("score"), col("n_tokens"))
        .orderBy("doc_id")
    },

    Q("q221_wordpiece_pair_scores",
      // the merge-1 argmax input of WORDPIECE training
      // (Wordpiece.train) — the second learned-tokenizer family beside
      // BPE, whose argmax is the LIKELIHOOD score cnt/(cnt_l·cnt_r),
      // not the raw pair count (q187). The oracle replays the ##
      // symbol spelling, both aggregates, and the score division —
      // one IEEE divide of exactly-representable integers, so the
      // double is bit-identical cross-engine and the (score desc,
      // left, right) order is replay-stable. The iterative trajectory
      // is pinned in WordpieceSpec.
      """WITH words AS (
        |  SELECT w AS word, count(*) AS c FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents) t
        |  WHERE w <> '' GROUP BY w),
        |syms AS (
        |  SELECT word, c, i,
        |    CASE WHEN i = 1 THEN substr(word, 1, 1)
        |         ELSE '##' || substr(word, i, 1) END AS s
        |  FROM words, LATERAL (SELECT unnest(generate_series(1, length(word))) AS i) g),
        |symcnt AS (SELECT s, CAST(sum(c) AS BIGINT) AS sc FROM syms GROUP BY s),
        |pairs AS (
        |  SELECT a.s AS sym_l, b.s AS sym_r, a.c
        |  FROM syms a JOIN syms b ON b.word = a.word AND b.i = a.i + 1),
        |pc AS (SELECT sym_l, sym_r, CAST(sum(c) AS BIGINT) AS cnt
        |  FROM pairs GROUP BY sym_l, sym_r)
        |SELECT p.sym_l, p.sym_r, p.cnt, l.sc AS cnt_l, r.sc AS cnt_r,
        |  CAST(p.cnt AS DOUBLE) / CAST(l.sc * r.sc AS DOUBLE) AS score
        |FROM pc p
        |JOIN symcnt l ON l.s = p.sym_l
        |JOIN symcnt r ON r.s = p.sym_r
        |ORDER BY score DESC, sym_l, sym_r LIMIT 20""".stripMargin) { (s, d) =>
      import graft.operators.Wordpiece
      Wordpiece.pairScores(Wordpiece.wordVocab(t(s, d, "documents"), "text"))
        .orderBy(col("score").desc, col("sym_l"), col("sym_r"))
        .limit(20)
    },

    Q("q222_wordpiece_tokenize",
      // the ENCODE side of WordPiece: greedy longest-match-first
      // against the frozen piece vocabulary (wpFrozenPieces) — NOT a
      // merge replay like BPE's q194; a word with an unmatchable
      // position becomes [UNK] wholesale. The oracle replays max-munch
      // per distinct word as a recursive CTE: each step left-joins the
      // piece list at the current code-point position (first pieces
      // plain, continuations via the ## prefix) and takes max_by
      // length — ties are impossible (equal-length matches at one
      // position are the same string). Per-doc token streams then
      // reassemble in word order.
      s"""WITH RECURSIVE
        |$wpEncodeCtes,
        |joined AS (
        |  SELECT dw.doc_id, string_agg(f.toks, ' ' ORDER BY dw.i) AS alltoks
        |  FROM docw dw JOIN final f ON f.w = dw.w GROUP BY dw.doc_id)
        |SELECT d.doc_id,
        |  CAST(CASE WHEN j.alltoks IS NULL THEN 0
        |       ELSE len(string_split(j.alltoks, ' ')) END AS BIGINT)
        |    AS n_tokens,
        |  md5(coalesce(j.alltoks, '')) AS tok_md5
        |FROM documents d LEFT JOIN joined j ON j.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      import graft.operators.Wordpiece
      Wordpiece.tokenize(t(s, d, "documents"), "doc_id", "text", wpFrozenPieces)
        .select(col("doc_id"), size(col("tokens")).cast("long").as("n_tokens"),
          md5(array_join(col("tokens"), " ")).as("tok_md5"))
        .orderBy("doc_id")
    },

    Q("q227_vocab_coverage",
      // tokenizer-fairness audit #2 (with q210's fertility): per-language
      // VOCAB COVERAGE under the frozen WordPiece pieces — the fraction
      // of words that fall out of the vocabulary entirely ([UNK]). An
      // UNK word yields exactly one token, so the engine counts [UNK]
      // tokens per doc; the oracle counts UNK words through the shared
      // max-munch replay. Integer counts + one exact division keep the
      // compare bit-stable.
      s"""WITH RECURSIVE
        |$wpEncodeCtes,
        |wl AS (
        |  SELECT d.lang, f.toks
        |  FROM docw dw
        |  JOIN documents d ON d.doc_id = dw.doc_id
        |  JOIN final f ON f.w = dw.w)
        |SELECT lang, count(*)::BIGINT AS n_words,
        |  CAST(count(*) FILTER (WHERE toks = '[UNK]') AS BIGINT) AS n_unk,
        |  round(count(*) FILTER (WHERE toks = '[UNK]')::DOUBLE
        |    / count(*)::DOUBLE, 6) AS unk_rate
        |FROM wl GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      import graft.operators.Wordpiece
      val docs = t(s, d, "documents")
      val unk = Wordpiece.tokenize(docs, "doc_id", "text", wpFrozenPieces)
        .select(col("doc_id").as("__did"),
          size(filter(col("tokens"), x => x === lit(Wordpiece.Unk)))
            .cast("long").as("n_unk"))
      docs
        .select(col("doc_id"), col("lang"),
          size(filter(split(trim(col("text")), "\\s+"),
            w => length(w) > 0)).cast("long").as("n_words"))
        .join(unk, col("__did") === col("doc_id")).drop("__did")
        .groupBy("lang")
        .agg(sum(col("n_words")).as("n_words"),
          sum(col("n_unk")).as("n_unk"),
          round(sum(col("n_unk")).cast("double")
            / sum(col("n_words")).cast("double"), 6).as("unk_rate"))
        .orderBy("lang")
    },

    Q("q210_tokenizer_fertility",
      // tokenizer fairness audit: per-language fertility (subword tokens
      // per whitespace word) and compression (chars per token) under the
      // frozen BPE table — the disparity metric behind "this tokenizer
      // taxes language X" analyses. All-integer sums + ONE division per
      // metric keep the doubles bit-exact cross-engine (rounded 6 dp for
      // the output grid).
      s"""WITH tk AS (
        |  SELECT doc_id, lang, n_chars,
        |    len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_words,
        |    CASE WHEN trim(text) = '' THEN 0
        |         ELSE len(string_split($bpeChainSql, '  ')) END::BIGINT
        |      AS n_tokens
        |  FROM documents)
        |SELECT lang, count(*)::BIGINT AS n_docs,
        |  CAST(sum(n_words) AS BIGINT) AS total_words,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  round(sum(n_tokens)::DOUBLE / sum(n_words)::DOUBLE, 6) AS fertility,
        |  round(sum(n_chars)::DOUBLE / sum(n_tokens)::DOUBLE, 6)
        |    AS chars_per_token
        |FROM tk GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      import graft.operators.Bpe
      val docs = t(s, d, "documents")
      val toks = Bpe.tokenize(docs, "doc_id", "text", bpeFrozenMerges)
        .select(col("doc_id").as("__did"), size(col("tokens")).cast("long").as("n_tokens"))
      docs
        .select(col("doc_id"), col("lang"), col("n_chars"),
          size(Dedup.tokens(col("text"))).cast("long").as("n_words"))
        .join(toks, col("doc_id") === col("__did"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_words").as("total_words"),
          sum("n_tokens").as("total_tokens"),
          round(sum("n_tokens").cast("double") / sum("n_words").cast("double"), 6)
            .as("fertility"),
          round(sum("n_chars").cast("double") / sum("n_tokens").cast("double"), 6)
            .as("chars_per_token"))
        .orderBy("lang")
    },

    Q("q197_bpe_token_ids",
      // the ID space a training pipeline actually ships: single-char
      // tokens are their code point, bare '</w>' is 0x110000, merge k's
      // result is 0x110001+k — injective by construction, stable across
      // corpora for the same table. The oracle maps the replayed token
      // stream through the same rule (a 16-arm CASE + unicode()) and
      // checks the full id sequence via order-sensitive md5.
      s"""SELECT doc_id,
        |  CASE WHEN trim(text) = '' THEN 0
        |       ELSE len(string_split($bpeChainSql, '  ')) END::BIGINT AS n_tokens,
        |  CASE WHEN trim(text) = '' THEN 0
        |       ELSE list_sum(list_transform(string_split($bpeChainSql, '  '),
        |         x -> $bpeIdCaseSql)) END::BIGINT AS ids_sum,
        |  CASE WHEN trim(text) = '' THEN md5('')
        |       ELSE md5(array_to_string(list_transform(string_split($bpeChainSql, '  '),
        |         x -> $bpeIdCaseSql), ' ')) END AS ids_md5
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Bpe.tokenizeIds(t(s, d, "documents"), "doc_id", "text", bpeFrozenMerges)
        .select(col("doc_id"),
          size(col("ids")).cast("long").as("n_tokens"),
          expr("aggregate(ids, 0L, (a, x) -> a + x)").as("ids_sum"),
          md5(array_join(expr("transform(ids, x -> cast(x as string))"), " "))
            .as("ids_md5"))
        .orderBy("doc_id")
    },

    Q("q198_bpe_roundtrip",
      // BPE is LOSSLESS up to whitespace normalization: ids back through
      // detokenize reproduce the single-spaced text EXACTLY. The oracle
      // never runs the tokenizer at all — it just normalizes the source
      // text; equality of md5s over the full document bodies is the
      // strongest possible round-trip claim.
      """SELECT doc_id,
        |  length(regexp_replace(trim(text), '\s+', ' ', 'g'))::BIGINT AS n_chars_norm,
        |  md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Bpe.detokenize(
          Bpe.tokenizeIds(t(s, d, "documents"), "doc_id", "text", bpeFrozenMerges),
          bpeFrozenMerges)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars_norm"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    },

    Q("q205_bpe_packing",
      // sequence packing in REAL subword tokens (q83's sharded
      // running-count recipe, with the frozen-table BPE counts instead
      // of word counts): documents fill 1024-token training sequences
      // per hash shard in deterministic order — the unit is now exactly
      // what the training job consumes. All-integer arithmetic.
      s"""WITH tk AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN 0
        |         ELSE len(string_split($bpeChainSql, '  ')) END::BIGINT AS n_tokens
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, n_tokens, doc_id % 8 AS shard,
        |    sum(n_tokens) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM tk)
        |SELECT shard, CAST((cum - n_tokens) // 1024 AS BIGINT) AS seq_id,
        |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM s GROUP BY shard, seq_id ORDER BY shard, seq_id""".stripMargin) { (s, d) =>
      val toks = Bpe.tokenize(t(s, d, "documents"), "doc_id", "text", bpeFrozenMerges)
        .select(col("doc_id"), size(col("tokens")).cast("long").as("n_tokens"))
        .withColumn("shard", col("doc_id") % 8)
      val w = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      toks
        .withColumn("cum", sum("n_tokens").over(w))
        .withColumn("seq_id", floor((col("cum") - col("n_tokens")) / 1024).cast("long"))
        .groupBy("shard", "seq_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("seq_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("shard", "seq_id")
    },

    Q("q199_quality_grad",
      // the trainable quality CLASSIFIER's oracle seam (the BPE layer-1
      // recipe applied to gradient descent): at w = 0, σ ≡ 0.5, so the
      // per-dimension logistic gradient over INTEGER features is
      // Σ(0.5 − y)·x_j / n — sums of exact multiples of 0.5
      // (order-insensitive) and one IEEE division, bit-identical across
      // engines. pos −1 is the intercept. The iterative loop itself is
      // ClassifierSpec's convergence gate, not SQL.
      s"""WITH f AS (
        |  SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS y,
        |    $qfSqlF0 AS f0, $qfSqlF1 AS f1, $qfSqlF2 AS f2, $qfSqlF3 AS f3
        |  FROM documents),
        |per AS (
        |        SELECT -1 AS pos, sum(0.5 - y) AS s, count(*) AS n FROM f
        |  UNION ALL SELECT 0, sum((0.5 - y) * f0), count(*) FROM f
        |  UNION ALL SELECT 1, sum((0.5 - y) * f1), count(*) FROM f
        |  UNION ALL SELECT 2, sum((0.5 - y) * f2), count(*) FROM f
        |  UNION ALL SELECT 3, sum((0.5 - y) * f3), count(*) FROM f)
        |SELECT CAST(pos AS INT) AS pos, s / n AS grad
        |FROM per ORDER BY pos""".stripMargin) { (s, d) =>
      import graft.operators.Classifier
      val docs = t(s, d, "documents")
        .withColumn("y", when(col("doc_id") % 3 === 0, 1).otherwise(0))
        .withColumn("feats", qualityFeatures)
      Classifier.firstGradient(docs, "feats", "y", dim = 4)
        .orderBy("pos")
    },

    Q("q200_quality_classify",
      // frozen-model scoring: weights are multiples of 1/1024 over
      // integer features, so the margin (Σ k_j·x_j)/1024 + b is EXACT
      // dyadic arithmetic — the decision boundary is bit-stable across
      // engines and the raw margin itself hash-matches with NO rounding
      // recipe. The model filter every curation pipeline ends with.
      s"""WITH f AS (
        |  SELECT doc_id,
        |    $qfSqlF0 AS f0, $qfSqlF1 AS f1, $qfSqlF2 AS f2, $qfSqlF3 AS f3
        |  FROM documents)
        |SELECT doc_id,
        |  (3 * f0 + 5 * f1 - 7 * f2 - 2 * f3) / 1024.0 - 1 AS margin,
        |  CASE WHEN (3 * f0 + 5 * f1 - 7 * f2 - 2 * f3) / 1024.0 - 1 > 0
        |       THEN 1 ELSE 0 END AS predicted
        |FROM f ORDER BY doc_id""".stripMargin) { (s, d) =>
      import graft.operators.Classifier
      val docs = t(s, d, "documents").withColumn("feats", qualityFeatures)
      Classifier.score(docs, "feats",
          Seq(3.0 / 1024, 5.0 / 1024, -7.0 / 1024, -2.0 / 1024), bias = -1.0)
        .select(col("doc_id"), col("margin"), col("predicted"))
        .orderBy("doc_id")
    },

    Q("q185_incremental_agg",
      // incremental aggregate maintenance: the Spark side NEVER
      // aggregates the new snapshot — it refreshes the old snapshot's
      // per-customer (count, decimal sum) state from the change data
      // feed alone (signed deltas: insert/post +, delete/pre −), while
      // the oracle recomputes the aggregate over the new snapshot from
      // scratch. Equality of a maintained state with a full recompute
      // IS the correctness claim (exact because DECIMAL sums are
      // order-insensitive — the reason the operator mandates decimals).
      // Changes mirror q124: inserts (keys % 97 = 0 were missing from
      // old), deletes (% 89 = 0), reprices (% 101 = 0).
      // PRESENTATION: the maintained state stays DECIMAL end-to-end; the
      // final projection converts the exact total ONCE to DOUBLE on both
      // sides (the q89 pattern) — in r12 the driver hash-failed exactly
      // the two queries exposing raw DECIMAL columns even though arrow
      // schemas and every cell matched, so decimal never leaves the plan.
      """WITH newsnap AS (
        |  SELECT o_custkey,
        |    CAST(CASE WHEN o_orderkey % 101 = 0 THEN round(o_totalprice + 1, 2)
        |         ELSE o_totalprice END AS DECIMAL(18,2)) AS p
        |  FROM orders WHERE o_orderkey % 89 <> 0)
        |SELECT o_custkey, count(*)::BIGINT AS n_orders,
        |  CAST(CAST(sum(p) AS DECIMAL(18,2)) AS DOUBLE) AS total
        |FROM newsnap GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, d) =>
      import graft.operators.{IncrementalAgg, Snapshot}
      val orders = t(s, d, "orders")
      val oldSnap = orders.filter(col("o_orderkey") % 97 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast("decimal(18,2)").as("p"))
      val newSnap = orders.filter(col("o_orderkey") % 89 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"),
          when(col("o_orderkey") % 101 === 0, round(col("o_totalprice") + 1, 2))
            .otherwise(col("o_totalprice")).cast("decimal(18,2)").as("p"))
      val prevAgg = oldSnap.groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), sum(col("p")).as("p"))
      val cdf = Snapshot.changeDataFeed(oldSnap, newSnap, "o_orderkey",
        Seq("o_custkey", "p"))
      IncrementalAgg.refreshSumCount(prevAgg, cdf,
          Seq("o_custkey"), "n_orders", Seq("p"))
        .select(col("o_custkey"), col("n_orders"),
          col("p").cast("decimal(18,2)").cast("double").as("total"))
        .orderBy("o_custkey")
    },

    Q("q218_incremental_minmax",
      // the NON-invertible half of incremental view maintenance: min/max
      // cannot subtract a delete, so IncrementalAgg.refreshMinMax
      // rescans exactly the groups where the feed removed weight at an
      // extremum and merges every other group monotonically from the
      // feed alone. The engine maintains the old snapshot's per-customer
      // (min, max) through the q185 change set (inserts %97, deletes
      // %89, reprices %101); the oracle recomputes over the new snapshot
      // from scratch — equality of a maintained state with a full
      // recompute IS the claim, and deletes landing on per-customer
      // minima/maxima are guaranteed at this scale.
      // PRESENTATION: min/max are single base values (no accumulation),
      // so one terminal DECIMAL→DOUBLE cast on both sides is exact; raw
      // DECIMAL output columns are banned after the r12 q185/q218
      // driver-hash lesson (see q185's comment).
      """WITH newsnap AS (
        |  SELECT o_custkey,
        |    CAST(CASE WHEN o_orderkey % 101 = 0 THEN round(o_totalprice + 1, 2)
        |         ELSE o_totalprice END AS DECIMAL(18,2)) AS p
        |  FROM orders WHERE o_orderkey % 89 <> 0)
        |SELECT o_custkey,
        |  CAST(CAST(min(p) AS DECIMAL(18,2)) AS DOUBLE) AS mn,
        |  CAST(CAST(max(p) AS DECIMAL(18,2)) AS DOUBLE) AS mx
        |FROM newsnap GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, d) =>
      import graft.operators.{IncrementalAgg, Snapshot}
      val orders = t(s, d, "orders")
      val oldSnap = orders.filter(col("o_orderkey") % 97 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast("decimal(18,2)").as("p"))
      val newSnap = orders.filter(col("o_orderkey") % 89 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"),
          when(col("o_orderkey") % 101 === 0, round(col("o_totalprice") + 1, 2))
            .otherwise(col("o_totalprice")).cast("decimal(18,2)").as("p"))
      val prevAgg = oldSnap.groupBy("o_custkey")
        .agg(min(col("p")).as("mn"), max(col("p")).as("mx"))
      val cdf = Snapshot.changeDataFeed(oldSnap, newSnap, "o_orderkey",
        Seq("o_custkey", "p"))
      IncrementalAgg.refreshMinMax(prevAgg, cdf, newSnap,
          Seq("o_custkey"), "p")
        .select(col("o_custkey"),
          col("mn").cast("decimal(18,2)").cast("double").as("mn"),
          col("mx").cast("decimal(18,2)").cast("double").as("mx"))
        .orderBy("o_custkey")
    },

    Q("q250_incremental_join_view",
      // JOIN-view maintenance — the delta-join algebra that composes the
      // IVM family into real pipelines: V = γ_seg(orders ⋈ customer)
      // maintained from the change feeds of BOTH inputs
      // (IncrementalAgg.refreshJoinSumCount: ΔL ⋈ R′ + L ⋈ ΔR — the
      // bilinearity bracketing; the engine NEVER re-joins the new
      // snapshots). Left feed = the q185 order change set (inserts %97,
      // deletes %89, reprices %101); right feed = customer churn
      // (deletes %53 — their orders must LEAVE the view through the
      // right feed alone — and segment moves %31 to a brand-new 'MOVED'
      // group, whose weight must arrive via BOTH feeds' cross terms).
      // The oracle recomputes γ(L′ ⋈ R′) from scratch; equality of the
      // maintained state with the recompute is the claim. Decimal
      // maintenance, one terminal double cast (q89 pattern).
      """WITH newA AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(CASE WHEN o_orderkey % 101 = 0 THEN round(o_totalprice + 1, 2)
        |         ELSE o_totalprice END AS DECIMAL(18,2)) AS p
        |  FROM orders WHERE o_orderkey % 89 <> 0),
        |newB AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 31 = 0 THEN 'MOVED' ELSE c_mktsegment END AS seg
        |  FROM customer WHERE c_custkey % 53 <> 0)
        |SELECT seg, count(*)::BIGINT AS n_orders,
        |  CAST(CAST(sum(p) AS DECIMAL(18,2)) AS DOUBLE) AS total
        |FROM newA JOIN newB ON newA.o_custkey = newB.c_custkey
        |GROUP BY seg ORDER BY seg""".stripMargin) { (s, d) =>
      import graft.operators.{IncrementalAgg, Snapshot}
      val orders = t(s, d, "orders")
      val customer = t(s, d, "customer")
      val oldA = orders.filter(col("o_orderkey") % 97 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast("decimal(18,2)").as("p"))
      val newA = orders.filter(col("o_orderkey") % 89 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"),
          when(col("o_orderkey") % 101 === 0, round(col("o_totalprice") + 1, 2))
            .otherwise(col("o_totalprice")).cast("decimal(18,2)").as("p"))
      val oldB = customer.select(col("c_custkey"), col("c_mktsegment").as("seg"))
      val newB = customer.filter(col("c_custkey") % 53 =!= 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 31 === 0, lit("MOVED"))
            .otherwise(col("c_mktsegment")).as("seg"))
      val cdfA = Snapshot.changeDataFeed(oldA, newA, "o_orderkey",
        Seq("o_custkey", "p"))
      val cdfB = Snapshot.changeDataFeed(oldB, newB, "c_custkey", Seq("seg"))
      val prevAgg = oldA
        .join(oldB.withColumnRenamed("c_custkey", "o_custkey"), Seq("o_custkey"))
        .groupBy("seg")
        .agg(count(lit(1)).as("n_orders"), sum(col("p")).as("p"))
      IncrementalAgg.refreshJoinSumCount(prevAgg,
          cdfA.drop("o_orderkey"), oldA.drop("o_orderkey"), cdfB, newB,
          leftKey = "o_custkey", rightKey = "c_custkey",
          groupCols = Seq("seg"), cntCol = "n_orders", sumCols = Seq("p"))
        .select(col("seg"), col("n_orders"),
          col("p").cast("decimal(18,2)").cast("double").as("total"))
        .orderBy("seg")
    },

    Q("q254_left_join_incremental_view",
      // LEFT-OUTER-join IVM — the null-extension case inner-join
      // algebras can't express: V = γ_seg(orders ⟕ customer) maintained
      // from both feeds (IncrementalAgg.refreshLeftJoinSumCount: the
      // inner part via the q250 bracketing, the anti part A = L·z(m)
      // telescoping as ΔL·z′ + L·Δz). The q250 churn makes the NULL
      // group do everything the algebra claims: it is EMPTY at the old
      // state (every order matched), then the %53 customer deletes
      // MIGRATE their surviving orders into it — where q250's inner
      // view dropped those orders, this view must re-home them under
      // null-padded attributes, exactly SQL LEFT JOIN semantics. The
      // oracle recomputes LEFT JOIN from the new snapshots.
      """WITH newA AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(CASE WHEN o_orderkey % 101 = 0 THEN round(o_totalprice + 1, 2)
        |         ELSE o_totalprice END AS DECIMAL(18,2)) AS p
        |  FROM orders WHERE o_orderkey % 89 <> 0),
        |newB AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 31 = 0 THEN 'MOVED' ELSE c_mktsegment END AS seg
        |  FROM customer WHERE c_custkey % 53 <> 0)
        |SELECT seg, count(*)::BIGINT AS n_orders,
        |  CAST(CAST(sum(p) AS DECIMAL(18,2)) AS DOUBLE) AS total
        |FROM newA LEFT JOIN newB ON newA.o_custkey = newB.c_custkey
        |GROUP BY seg ORDER BY seg NULLS FIRST""".stripMargin) { (s, d) =>
      import graft.operators.{IncrementalAgg, Snapshot}
      val orders = t(s, d, "orders")
      val customer = t(s, d, "customer")
      val oldA = orders.filter(col("o_orderkey") % 97 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast("decimal(18,2)").as("p"))
      val newA = orders.filter(col("o_orderkey") % 89 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"),
          when(col("o_orderkey") % 101 === 0, round(col("o_totalprice") + 1, 2))
            .otherwise(col("o_totalprice")).cast("decimal(18,2)").as("p"))
      val oldB = customer.select(col("c_custkey"), col("c_mktsegment").as("seg"))
      val newB = customer.filter(col("c_custkey") % 53 =!= 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 31 === 0, lit("MOVED"))
            .otherwise(col("c_mktsegment")).as("seg"))
      val cdfA = Snapshot.changeDataFeed(oldA, newA, "o_orderkey",
        Seq("o_custkey", "p"))
      val cdfB = Snapshot.changeDataFeed(oldB, newB, "c_custkey", Seq("seg"))
      val prevAgg = oldA
        .join(oldB.withColumnRenamed("c_custkey", "o_custkey"),
          Seq("o_custkey"), "left")
        .groupBy("seg")
        .agg(count(lit(1)).as("n_orders"), sum(col("p")).as("p"))
      IncrementalAgg.refreshLeftJoinSumCount(prevAgg,
          cdfA.drop("o_orderkey"), oldA.drop("o_orderkey"), cdfB, oldB, newB,
          leftKey = "o_custkey", rightKey = "c_custkey",
          groupCols = Seq("seg"), cntCol = "n_orders", sumCols = Seq("p"))
        .select(col("seg"), col("n_orders"),
          col("p").cast("decimal(18,2)").cast("double").as("total"))
        .orderBy(col("seg").asc_nulls_first)
    },

    Q("q255_full_join_incremental_view",
      // FULL-OUTER-join IVM — both null directions live: orders of
      // deleted customers migrate to the NULL-segment group (left-anti,
      // as q254) AND orderless customers appear under their real
      // segment with NULL measures (right-anti — the fixture orphans
      // the o_custkey % 5 = 0 customers from the order side, so
      // right-anti rows exist, get segment-MOVED, and get deleted).
      // SQL's sum-over-all-null = NULL is restored from the maintained
      // per-measure non-null counter (state carries p_nn; an additive
      // state alone could only say 0). The oracle recomputes FULL JOIN
      // from the new snapshots — n_custrows counts matched+orphan
      // customer rows per group, so a right-anti row parked in the
      // wrong group would shift two columns.
      """WITH newA AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(CASE WHEN o_orderkey % 101 = 0 THEN round(o_totalprice + 1, 2)
        |         ELSE o_totalprice END AS DECIMAL(18,2)) AS p
        |  FROM orders WHERE o_orderkey % 89 <> 0 AND o_custkey % 5 <> 0),
        |newB AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 31 = 0 THEN 'MOVED' ELSE c_mktsegment END AS seg
        |  FROM customer WHERE c_custkey % 53 <> 0)
        |SELECT seg, count(*)::BIGINT AS n_rows,
        |  CAST(CAST(sum(p) AS DECIMAL(18,2)) AS DOUBLE) AS total
        |FROM newA FULL JOIN newB ON newA.o_custkey = newB.c_custkey
        |GROUP BY seg ORDER BY seg NULLS FIRST""".stripMargin) { (s, d) =>
      import graft.operators.{IncrementalAgg, Snapshot}
      val orders = t(s, d, "orders").filter(col("o_custkey") % 5 =!= 0)
      val customer = t(s, d, "customer")
      val oldA = orders.filter(col("o_orderkey") % 97 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast("decimal(18,2)").as("p"))
      val newA = orders.filter(col("o_orderkey") % 89 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"),
          when(col("o_orderkey") % 101 === 0, round(col("o_totalprice") + 1, 2))
            .otherwise(col("o_totalprice")).cast("decimal(18,2)").as("p"))
      val oldB = customer.select(col("c_custkey"), col("c_mktsegment").as("seg"))
      val newB = customer.filter(col("c_custkey") % 53 =!= 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 31 === 0, lit("MOVED"))
            .otherwise(col("c_mktsegment")).as("seg"))
      val cdfA = Snapshot.changeDataFeed(oldA, newA, "o_orderkey",
        Seq("o_custkey", "p"))
      val cdfB = Snapshot.changeDataFeed(oldB, newB, "c_custkey", Seq("seg"))
      val prevAgg = oldA
        .join(oldB.withColumnRenamed("c_custkey", "o_custkey"),
          Seq("o_custkey"), "full")
        .groupBy("seg")
        .agg(count(lit(1)).as("n_rows"), sum(col("p")).as("p"),
          count(col("p")).as("p_nn"))
      IncrementalAgg.refreshFullJoinSumCount(prevAgg,
          cdfA.drop("o_orderkey"), oldA.drop("o_orderkey"),
          newA.drop("o_orderkey"), cdfB, oldB, newB,
          leftKey = "o_custkey", rightKey = "c_custkey",
          groupCols = Seq("seg"), cntCol = "n_rows", sumCols = Seq("p"))
        .select(col("seg"), col("n_rows"),
          when(col("p_nn") > 0, col("p"))
            .cast("decimal(18,2)").cast("double").as("total"))
        .orderBy(col("seg").asc_nulls_first)
    },

    Q("q251_txtable_join_view",
      // the IVM capstone: q250's join view maintained across the COMMIT
      // HISTORIES of TWO ACID tables — orders and customers each live in
      // a TxTable with three commits (base → upsert → keyed delete), and
      // the per-segment view refreshes once per version STEP from
      // TxTable.changeDataFeed version diffs of BOTH tables
      // (refreshJoinSumCount per step; merged last-value views supply
      // the O(changes)-sized probe snapshots). The engine never joins
      // the full new snapshots; the oracle recomputes from the final
      // logical contents — which equal q250's fixture exactly, so the
      // SAME recompute SQL verifies a maintenance path that now spans
      // the table log, the merge engine, the CDF diff, and the delta-
      // join algebra end to end.
      """WITH newA AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(CASE WHEN o_orderkey % 101 = 0 THEN round(o_totalprice + 1, 2)
        |         ELSE o_totalprice END AS DECIMAL(18,2)) AS p
        |  FROM orders WHERE o_orderkey % 89 <> 0 AND o_orderkey % 9 = 0),
        |newB AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 31 = 0 THEN 'MOVED' ELSE c_mktsegment END AS seg
        |  FROM customer WHERE c_custkey % 53 <> 0 AND c_custkey % 3 = 0)
        |SELECT seg, count(*)::BIGINT AS n_orders,
        |  CAST(CAST(sum(p) AS DECIMAL(18,2)) AS DOUBLE) AS total
        |FROM newA JOIN newB ON newA.o_custkey = newB.c_custkey
        |GROUP BY seg ORDER BY seg""".stripMargin) { (s, d) =>
      import graft.operators.IncrementalAgg
      import graft.streaming.TxTable
      val root = Q.scratchDir("graft-q251")
      val ordT = root + "/orders_t"; val custT = root + "/cust_t"
      // fixture restricted to a NINTH of orders and a THIRD of customers
      // (VERDICT r16 task #4 — this was the #2 suite cost at 20-51s):
      // the query proves the maintenance algebra over the table log, so
      // commit volume is fixture cost, not semantics (the q246 shrink
      // precedent); every churn modulus (%97 insert, %101 reprice, %89
      // delete, %31 segment move, %53 customer delete) still lands a
      // nonempty arm at sf0.01, and the oracle carries the same
      // restriction
      val orders = t(s, d, "orders").filter(col("o_orderkey") % 9 === 0)
      val customer = t(s, d, "customer").filter(col("c_custkey") % 3 === 0)
      val oKeys = Seq("o_orderstatus", "o_orderkey")
      val cKeys = Seq("bucket", "c_custkey")
      // orders_t v0: the %97 base; v1: inserts (%97=0) + reprices
      // (%101=0) in ONE upsert batch; v2: delete %89=0
      TxTable.mergeLatest(s,
        orders.filter(col("o_orderkey") % 97 =!= 0)
          .select(col("o_orderstatus"), col("o_orderkey"), col("o_custkey"),
            col("o_totalprice").cast("decimal(18,2)").as("p"), lit(0L).as("seq")),
        ordT, "o_orderstatus", oKeys, Seq("seq"))
      TxTable.mergeLatest(s,
        orders.filter(col("o_orderkey") % 97 === 0 || col("o_orderkey") % 101 === 0)
          .select(col("o_orderstatus"), col("o_orderkey"), col("o_custkey"),
            when(col("o_orderkey") % 101 === 0, round(col("o_totalprice") + 1, 2))
              .otherwise(col("o_totalprice")).cast("decimal(18,2)").as("p"),
            lit(1L).as("seq")),
        ordT, "o_orderstatus", oKeys, Seq("seq"))
      TxTable.deleteKeys(s,
        orders.filter(col("o_orderkey") % 89 === 0)
          .select("o_orderstatus", "o_orderkey"),
        ordT, "o_orderstatus", oKeys)
      // cust_t partitions by a STABLE hash bucket, not the segment: a
      // segment move must stay an in-partition UPDATE — partitioning by
      // the mutable column would turn it into an insert beside a stale
      // row under the (partition, key) merge identity. TWO buckets, not
      // eight (VERDICT r16 task #4): mergeLatest writes one data dir per
      // affected partition per commit, so the bucket count multiplies
      // fixture job count without adding semantics — two buckets still
      // exercise multi-partition merge + pruning
      val bucketed = customer.withColumn("bucket",
        concat(lit("b"), pmod(col("c_custkey"), lit(2))))
      TxTable.mergeLatest(s,
        bucketed.select(col("bucket"), col("c_custkey"),
          col("c_mktsegment").as("seg"), lit(0L).as("seq")),
        custT, "bucket", cKeys, Seq("seq"))
      TxTable.mergeLatest(s,
        bucketed.filter(col("c_custkey") % 31 === 0)
          .select(col("bucket"), col("c_custkey"),
            lit("MOVED").as("seg"), lit(1L).as("seq")),
        custT, "bucket", cKeys, Seq("seq"))
      TxTable.deleteKeys(s,
        bucketed.filter(col("c_custkey") % 53 === 0)
          .select("bucket", "c_custkey"),
        custT, "bucket", cKeys)
      def mergedOrders(v: Long) =
        TxTable.readMergedAt(s, ordT, v, oKeys, Seq("seq"))
          .getOrElse(sys.error(s"q251: orders_t version $v unreadable"))
          .select(col("o_custkey"), col("p"))
      def mergedCust(v: Long) =
        TxTable.readMergedAt(s, custT, v, cKeys, Seq("seq"))
          .getOrElse(sys.error(s"q251: cust_t version $v unreadable"))
          .select(col("c_custkey"), col("seg"))
      var state = mergedOrders(0)
        .join(mergedCust(0).withColumnRenamed("c_custkey", "o_custkey"),
          Seq("o_custkey"))
        .groupBy("seg")
        .agg(count(lit(1)).as("n_orders"), sum(col("p")).as("p"))
      // size-derived parallelism for the refresh steps (r19): every
      // materialization inside the loop is bounded by the two tables'
      // merged snapshots (scratch-table parquet, a few MB here), and the
      // per-step truncations otherwise run ~50 AQE stage jobs of 32 tiny
      // tasks each (ProfQ: 64 jobs, all < 0.5 s, jobs-sum ≈ wall). Gated
      // on the v0 orders snapshot's plan estimate — production-scale
      // tables fall through to session confs.
      graft.operators.Checkpoints.sizedLoop(mergedOrders(0)) {
      for (v <- 1L to 2L) {
        val cdfA = TxTable.changeDataFeed(s, ordT, v - 1, v, "o_orderkey",
          Seq("o_custkey", "p"), oKeys, Seq("seq"))
        val cdfB = TxTable.changeDataFeed(s, custT, v - 1, v, "c_custkey",
          Seq("seg"), cKeys, Seq("seq"))
        // materialize the (tiny) state between steps: each step's plan
        // otherwise carries the previous step's whole lineage — per-step
        // truncation is exactly what a production maintenance loop does
        // with its persisted state table (the q249 parquet state)
        state = graft.operators.Checkpoints.truncate(
          IncrementalAgg.refreshJoinSumCount(state,
            cdfA.drop("o_orderkey"), mergedOrders(v - 1), cdfB, mergedCust(v),
            leftKey = "o_custkey", rightKey = "c_custkey",
            groupCols = Seq("seg"), cntCol = "n_orders", sumCols = Seq("p")))
      }
      }
      state
        .select(col("seg"), col("n_orders"),
          col("p").cast("decimal(18,2)").cast("double").as("total"))
        .orderBy("seg")
    },

    Q("q253_star_incremental_view",
      // N-way star IVM (refreshStarSumCount): V = γ_nation(orders ⋈
      // customer ⋈ nation) maintained from the change feeds of ALL
      // THREE inputs via the multilinear telescoping ΔF⋈D1′⋈D2′ +
      // F⋈ΔD1⋈D2′ + F⋈D1⋈ΔD2 — a SNOWFLAKE chain (nation keys off the
      // column customer produces), churn everywhere: order
      // inserts/deletes/reprices (q185 set), customers deleted (%53)
      // and REASSIGNED to the next nation (%41 — weight moves between
      // groups through the D1 term), nations RENAMED (%7 — the group
      // key itself changes under the view's feet, weight moves through
      // the D2 term joining OLD fact and OLD customers). The oracle
      // recomputes over the final snapshots; decimal maintenance, one
      // terminal double cast (q89 pattern).
      """WITH newF AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(CASE WHEN o_orderkey % 101 = 0 THEN round(o_totalprice + 1, 2)
        |         ELSE o_totalprice END AS DECIMAL(18,2)) AS p
        |  FROM orders WHERE o_orderkey % 89 <> 0),
        |newD1 AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 41 = 0 THEN (c_nationkey + 1) % 25
        |         ELSE c_nationkey END AS c_nationkey
        |  FROM customer WHERE c_custkey % 53 <> 0),
        |newD2 AS (
        |  SELECT n_nationkey,
        |    CASE WHEN n_nationkey % 7 = 0 THEN 'X-' || n_name
        |         ELSE n_name END AS nname
        |  FROM nation)
        |SELECT nname, count(*)::BIGINT AS n_orders,
        |  CAST(CAST(sum(p) AS DECIMAL(18,2)) AS DOUBLE) AS total
        |FROM newF
        |JOIN newD1 ON newF.o_custkey = newD1.c_custkey
        |JOIN newD2 ON newD1.c_nationkey = newD2.n_nationkey
        |GROUP BY nname ORDER BY nname""".stripMargin) { (s, d) =>
      import graft.operators.{IncrementalAgg, Snapshot}
      import graft.operators.IncrementalAgg.DimFeed
      val orders = t(s, d, "orders")
      val customer = t(s, d, "customer")
      val nation = t(s, d, "nation")
      val oldF = orders.filter(col("o_orderkey") % 97 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast("decimal(18,2)").as("p"))
      val newF = orders.filter(col("o_orderkey") % 89 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"),
          when(col("o_orderkey") % 101 === 0, round(col("o_totalprice") + 1, 2))
            .otherwise(col("o_totalprice")).cast("decimal(18,2)").as("p"))
      val oldD1 = customer.select(col("c_custkey"), col("c_nationkey"))
      val newD1 = customer.filter(col("c_custkey") % 53 =!= 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 41 === 0, (col("c_nationkey") + 1) % 25)
            .otherwise(col("c_nationkey")).as("c_nationkey"))
      val oldD2 = nation.select(col("n_nationkey"), col("n_name").as("nname"))
      val newD2 = nation.select(col("n_nationkey"),
        when(col("n_nationkey") % 7 === 0, concat(lit("X-"), col("n_name")))
          .otherwise(col("n_name")).as("nname"))
      val cdfF = Snapshot.changeDataFeed(oldF, newF, "o_orderkey",
        Seq("o_custkey", "p")).drop("o_orderkey")
      val cdfD1 = Snapshot.changeDataFeed(oldD1, newD1, "c_custkey",
        Seq("c_nationkey"))
      val cdfD2 = Snapshot.changeDataFeed(oldD2, newD2, "n_nationkey",
        Seq("nname"))
      val prev = oldF
        .join(oldD1.withColumnRenamed("c_custkey", "o_custkey"), Seq("o_custkey"))
        .join(oldD2.withColumnRenamed("n_nationkey", "c_nationkey"),
          Seq("c_nationkey"))
        .groupBy("nname")
        .agg(count(lit(1)).as("n_orders"), sum(col("p")).as("p"))
      IncrementalAgg.refreshStarSumCount(prev, cdfF,
          oldF.drop("o_orderkey"),
          Seq(DimFeed(cdfD1, oldD1, newD1, "o_custkey", "c_custkey"),
            DimFeed(cdfD2, oldD2, newD2, "c_nationkey", "n_nationkey")),
          groupCols = Seq("nname"), cntCol = "n_orders", sumCols = Seq("p"))
        .select(col("nname"), col("n_orders"),
          col("p").cast("decimal(18,2)").cast("double").as("total"))
        .orderBy("nname")
    },

    Q("q252_leakage_safe_split",
      // leakage-safe train/val/test split: every member of a near-dup
      // CLUSTER lands in the same split (Curation.leakageSafeSplit —
      // split by the salted hash of the CLUSTER id, not the document
      // id), so no eval example has a near-copy in training. The pair
      // graph is the q58 oracle-checkable fixture (consecutive orders
      // of each customer form a path ⇒ cluster = the customer's min
      // order key, singletons their own cluster), which makes the whole
      // assignment — connected components INCLUDED — SQL-replayable;
      // the engine must genuinely propagate labels along the path, then
      // hash-split. n_clusters per split pins cluster-coherence: a
      // single leaked member would shift a cluster count.
      s"""WITH m AS (
        |  SELECT o_custkey, min(o_orderkey) AS c, count(*) AS n
        |  FROM orders GROUP BY o_custkey),
        |a AS (
        |  SELECT o_orderkey AS id,
        |    CASE WHEN m.n >= 2 THEN m.c ELSE o_orderkey END AS cluster
        |  FROM orders JOIN m USING (o_custkey)),
        |s AS (
        |  SELECT id, cluster,
        |    CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM (SELECT id, cluster,
        |          ${sqlHash60("'split:' || cluster::VARCHAR")} % 100 AS h
        |        FROM a))
        |SELECT split, count(*)::BIGINT AS n_items,
        |  count(DISTINCT cluster)::BIGINT AS n_clusters,
        |  CAST(sum(id) AS BIGINT) AS id_sum
        |FROM s GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
      import graft.operators.Curation
      val orders = t(s, d, "orders")
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      val pairs = orders
        .select(col("o_orderkey").as("id2"),
          lag("o_orderkey", 1).over(w).as("id1"))
        .filter(col("id1").isNotNull)
        .select("id1", "id2")
      Curation.leakageSafeSplit(orders.select(col("o_orderkey").as("id")),
          pairs, "id")
        .groupBy("split")
        .agg(count(lit(1)).as("n_items"),
          countDistinct(col("cluster")).as("n_clusters"),
          sum(col("id")).as("id_sum"))
        .orderBy("split")
    },

    Q("q220_incremental_distinct",
      // exact COUNT(DISTINCT) maintenance — the third IVM algebra beside
      // sum/count (q185, invertible) and min/max (q218, rescan-repaired):
      // distinct-count is not invertible, but the per-(group, value)
      // SUPPORT table is, and n_distinct falls out as its row count. The
      // engine maintains the old snapshot's per-priority support table
      // through the q185-style change set (inserts %97, deletes %89,
      // %101 rows move to a DIFFERENT customer — the update changes the
      // counted value, exercising both a support decrement and an
      // increment); the oracle recomputes DISTINCT from the new snapshot
      // from scratch. Equality of maintained state with full recompute
      // IS the claim.
      """WITH newsnap AS (
        |  SELECT o_orderpriority,
        |    CASE WHEN o_orderkey % 101 = 0 THEN o_custkey + 1
        |         ELSE o_custkey END AS c
        |  FROM orders WHERE o_orderkey % 89 <> 0)
        |SELECT o_orderpriority,
        |  CAST(count(DISTINCT c) AS BIGINT) AS n_distinct,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM newsnap GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      import graft.operators.{IncrementalAgg, Snapshot}
      val orders = t(s, d, "orders")
      val oldSnap = orders.filter(col("o_orderkey") % 97 =!= 0)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_custkey").as("c"))
      val newSnap = orders.filter(col("o_orderkey") % 89 =!= 0)
        .select(col("o_orderkey"), col("o_orderpriority"),
          when(col("o_orderkey") % 101 === 0, col("o_custkey") + 1)
            .otherwise(col("o_custkey")).as("c"))
      val prevSupport = oldSnap.groupBy("o_orderpriority", "c")
        .agg(count(lit(1)).as("support"))
      val cdf = Snapshot.changeDataFeed(oldSnap, newSnap, "o_orderkey",
        Seq("o_orderpriority", "c"))
      IncrementalAgg.distinctFromSupport(
          IncrementalAgg.refreshSupport(prevSupport, cdf,
            Seq("o_orderpriority"), "c"),
          Seq("o_orderpriority"))
        .orderBy("o_orderpriority")
    },

    Q("q225_incremental_topk",
      // the FOURTH IVM algebra: per-group top-k (multiset of the k
      // largest values) maintained from the change feed —
      // IncrementalAgg.refreshTopK generalizes the min/max rescan
      // argument to k: only a delete AT OR ABOVE the maintained cut
      // (ties included), an unknown group, or an under-full state
      // forces a rescan of that group; everything else merges the
      // batch's own top-k monotonically. Values are exact cents; the
      // oracle recomputes the top-3 from the new snapshot — maintained
      // state == full recompute IS the claim, and with %89 deletes
      // across 5 priorities, deletes above the cut occur at this scale.
      """WITH newsnap AS (
        |  SELECT o_orderpriority,
        |    CAST(round(CASE WHEN o_orderkey % 101 = 0
        |         THEN o_totalprice + 1 ELSE o_totalprice END * 100)
        |      AS BIGINT) AS v
        |  FROM orders WHERE o_orderkey % 89 <> 0)
        |SELECT o_orderpriority,
        |  array_to_string(list_slice(list(v ORDER BY v DESC), 1, 3), ',')
        |    AS topk
        |FROM newsnap GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      import graft.operators.{IncrementalAgg, Snapshot}
      val orders = t(s, d, "orders")
      def snap(mod: Int, bump: Boolean) = {
        val base = orders.filter(col("o_orderkey") % mod =!= 0)
        val price = if (bump)
          when(col("o_orderkey") % 101 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice"))
        else col("o_totalprice")
        base.select(col("o_orderkey"), col("o_orderpriority"),
          round(price * 100).cast("long").as("v"))
      }
      val oldSnap = snap(97, bump = false)
      val newSnap = snap(89, bump = true)
      val prev = oldSnap.groupBy("o_orderpriority")
        .agg(slice(sort_array(collect_list(col("v")), asc = false), 1, 3)
          .as("topk"))
      val cdf = Snapshot.changeDataFeed(oldSnap, newSnap, "o_orderkey",
        Seq("o_orderpriority", "v"))
      IncrementalAgg.refreshTopK(prev, cdf, newSnap,
          Seq("o_orderpriority"), "v", 3)
        .select(col("o_orderpriority"),
          array_join(col("topk"), ",").as("topk"))
        .orderBy("o_orderpriority")
    },

    // ------------------------------------ additional relational cover
    Q("q45_percentiles",
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS q1,
        |  quantile_cont(l_quantity, 0.5) AS median,
        |  quantile_cont(l_quantity, 0.75) AS q3,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          // exact interpolated percentile (matches DuckDB quantile_cont);
          // l_quantity is integral so the interpolation is fp-exact
          expr("percentile(l_quantity, 0.25)").as("q1"),
          expr("percentile(l_quantity, 0.5)").as("median"),
          expr("percentile(l_quantity, 0.75)").as("q3"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    Q("q224_selection_median",
      // the THIRD point on the percentile cost curve: q45's exact
      // percentile buffers every group value in one task (OOM at 100 TB
      // group sizes), q57's sketch is approximate — this is EXACT with
      // O(1) executor memory: Selection.kthSmallestByGroup bisects the
      // VALUE DOMAIN, one map-side-combined count pass per round,
      // ~log2(range) rounds, driver state O(#groups). The oracle pins
      // the same order statistic (k = ⌈n/2⌉, the lower median) via an
      // explicit row_number — unambiguous under ties, no interpolation.
      """SELECT l_returnflag, v AS median_cents FROM (
        |  SELECT l_returnflag, v,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM (SELECT l_returnflag,
        |          CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        |        FROM lineitem))
        |WHERE rn = (n + 1) // 2
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      import graft.operators.Selection
      Selection.kthSmallestByGroup(
          t(s, d, "lineitem")
            .select(col("l_returnflag"),
              round(col("l_extendedprice") * 100).cast("long").as("v")),
          "l_returnflag", "v")
        .select(col("l_returnflag"), col("kth").as("median_cents"))
        .orderBy("l_returnflag")
    },

    Q.noOracle("q57_approx_percentiles") { (s, d) =>
      // approx_percentile (bounded-memory sketch per group) — the scale
      // path for q45's exact percentile, which buffers all group values;
      // the sketch holds O(accuracy) entries. Approximate → no SQL oracle;
      // closeness vs exact q45 asserted in QueriesSpec.
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 1000)").as("qs"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"),
          col("qs").getItem(0).as("q1"),
          col("qs").getItem(1).as("median"),
          col("qs").getItem(2).as("q3"),
          col("n"))
        .orderBy("l_returnflag")
    },

    Q("q57b_approx_percentile_envelope",
      // q57's ENVELOPE replay twin (VERDICT r16 task #7): Spark's
      // approx_percentile(v, p, acc) contract guarantees the returned
      // element's exact RANK is within n/acc of p*n — a replayable
      // bound even though the returned value itself is
      // implementation-defined. The Spark side joins each group's three
      // returned quantiles back against the group (broadcast — the
      // quantile table is groups×3 rows), computes the exact <=/< rank
      // straddle, and exports the bound check as a boolean; the oracle
      // recomputes (group, p, n) exactly and asserts the booleans.
      """SELECT l_returnflag, p, count(*)::BIGINT AS n, true AS in_envelope
        |FROM lineitem, (SELECT unnest([0.25, 0.5, 0.75]::DOUBLE[]) AS p)
        |GROUP BY l_returnflag, p ORDER BY l_returnflag, p""".stripMargin) { (s, d) =>
      val li = t(s, d, "lineitem").select(col("l_returnflag"), col("l_quantity"))
      val qs = li.groupBy("l_returnflag")
        .agg(expr("approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 1000)")
          .as("qs"), count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("n"),
          posexplode(col("qs")).as(Seq("i", "v")))
        .withColumn("p",
          element_at(array(lit(0.25), lit(0.5), lit(0.75)),
            col("i").cast("int") + 1))
      li.join(broadcast(qs), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"), col("p"), col("n"))
        .agg(
          sum(when(col("l_quantity") <= col("v"), 1L).otherwise(0L)).as("__le"),
          sum(when(col("l_quantity") < col("v"), 1L).otherwise(0L)).as("__lt"))
        .select(col("l_returnflag"), col("p"), col("n"),
          (col("__le") >= col("p") * col("n") - (col("n") / lit(1000.0) + 1) &&
            col("__lt") <= col("p") * col("n") + (col("n") / lit(1000.0) + 1))
            .as("in_envelope"))
        .orderBy("l_returnflag", "p")
    },

    Q("q46_pivot",
      """SELECT o_orderpriority,
        |  round(coalesce(sum(o_totalprice) FILTER (o_orderstatus = 'F'), 0), 2) AS F,
        |  round(coalesce(sum(o_totalprice) FILTER (o_orderstatus = 'O'), 0), 2) AS O,
        |  round(coalesce(sum(o_totalprice) FILTER (o_orderstatus = 'P'), 0), 2) AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(round(coalesce(sum("o_totalprice"), lit(0d)), 2))
        .na.fill(0d, Seq("F", "O", "P"))
        .orderBy("o_orderpriority")
    },

    Q("q47_token_frequency",
      """SELECT tok, count(*) AS n
        |FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents)
        |GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy("tok")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok").asc)
        .limit(20)
    },

    Q("q49_range_join",
      // DuckDB plans BETWEEN as an IEJoin; the Spark side uses the bucketed
      // equi-join rewrite (RangeJoin) — same semantics, shuffle-partitionable.
      // The pair sum reaches ~6e11 at sf0.1, where double reorder noise
      // (~magnitude × 2⁻⁵²) exceeds a 2-decimal grid — report in millions
      // so the rounding grid sits far above summation-order effects.
      """SELECT l.l_returnflag, count(*) AS n_pairs,
        |  round(sum(o.o_totalprice) / 1000000, 2) AS sum_price_m
        |FROM lineitem l JOIN orders o
        |  ON l.l_shipdate::DATE BETWEEN o.o_orderdate::DATE
        |    AND o.o_orderdate::DATE + INTERVAL 30 DAY
        |WHERE l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1995-02-01 00:00:00'
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin) { (s, d) =>
      val pts = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01 00:00:00").cast("timestamp")
          && col("l_shipdate") < lit("1995-02-01 00:00:00").cast("timestamp"))
        .select(col("l_returnflag"),
          datediff(col("l_shipdate"), lit("1970-01-01")).cast("long").as("pt"))
      val ivs = t(s, d, "orders")
        .select(col("o_totalprice"),
          datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("start"))
        .withColumn("end", col("start") + 30)
      RangeJoin.pointInInterval(pts, ivs, "pt", "start", "end", bucketWidth = 32)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_pairs"),
          round(sum("o_totalprice") / 1000000, 2).as("sum_price_m"))
        .orderBy("l_returnflag")
    },

    Q("q52_string_agg",
      // ordered collect_list materialized as a string (array-valued outputs
      // don't hash portably across engines; the string form does)
      """SELECT c_nationkey, string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
        |count(*) AS n FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .groupBy("c_nationkey")
        .agg(
          concat_ws(",", array_sort(collect_set(col("c_mktsegment")))).as("segments"),
          count(lit(1)).as("n"))
        .orderBy("c_nationkey")
    },

    Q("q53_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n, round(sum(o_totalprice),2) AS revenue
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
      // exercises the engine's SQL entry path (spark.sql over a temp view)
      t(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
          |round(sum(o_totalprice),2) AS revenue
          |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
          |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    },

    Q("q51_session_window",
      // sessionization with a 30-minute gap: Spark's session_window vs the
      // gaps-and-islands formulation in DuckDB
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |           >= INTERVAL 30 MINUTE OR
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM e)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
        |  round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start")
    },

    Q("q50_weighted_mean_udaf",
      // custom Aggregator UDAF (quality-weighted mean); weights here are
      // quantities so the oracle is plain SQL
      """SELECT l_returnflag,
        |  round(sum(l_extendedprice * CAST(l_quantity AS INT))
        |    / sum(CAST(l_quantity AS INT)), 4) AS wmean_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val wmean = udaf(graft.functions.QualityWeightedMean)
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(wmean(col("l_extendedprice"), col("l_quantity").cast("int")), 4)
            .as("wmean_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    Q("q48_window_suite",
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  lead(o_orderkey, 1) OVER w AS next_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, rnk, o_orderkey LIMIT 500""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          lead(col("o_orderkey"), 1).over(w).as("next_key"))
        .orderBy(col("o_orderpriority"), col("rnk"), col("o_orderkey"))
        .limit(500)
    },

    Q("q237_incremental_variance",
      // VARIANCE maintenance — the fifth IVM algebra, and the
      // degenerate-easy one the family map should still show: (count,
      // Σv, Σv²) are all abelian, so the q185 signed-delta machinery
      // maintains them with a derived squared column — no rescan set
      // (q218), no support table (q220), no cut argument (q225). The
      // engine refreshes the old snapshot's per-supplier moments from
      // the change feed alone; the oracle recomputes over the new
      // snapshot. Integer quantities keep the moments exact; variance
      // derives at presentation as n·Σv² − (Σv)² (exact long) over one
      // IEEE division — identical trees, bit-identical doubles.
      """WITH newsnap AS (
        |  SELECT o_custkey,
        |    CASE WHEN o_orderkey % 101 = 0 THEN (o_orderkey % 97) + 1
        |         ELSE o_orderkey % 97 END AS q
        |  FROM orders WHERE o_orderkey % 89 <> 0)
        |SELECT o_custkey, count(*)::BIGINT AS n, sum(q)::BIGINT AS s,
        |  sum(q * q)::BIGINT AS s2,
        |  round((sum(q * q) * count(*) - sum(q) * sum(q))::DOUBLE
        |    / (count(*) * count(*))::DOUBLE, 6) AS pop_var
        |FROM newsnap GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, d) =>
      import graft.operators.{IncrementalAgg, Snapshot}
      // keyed on o_orderkey — UNIQUE, unlike anything in lineitem (the
      // (l_orderkey, l_linenumber) duplicates would corrupt any CDF)
      val base = t(s, d, "orders")
        .select(col("o_orderkey").as("k"), col("o_custkey"),
          (col("o_orderkey") % 97).as("q"))
      val oldSnap = base.filter(col("k") % 93 =!= 0)
      val newSnap = base.filter(col("k") % 89 =!= 0)
        .withColumn("q", when(col("k") % 101 === 0, col("q") + 1).otherwise(col("q")))
      val prevAgg = oldSnap.groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum(col("q")).as("q"),
          sum(col("q") * col("q")).as("q_sq"))
      val cdf = Snapshot.changeDataFeed(oldSnap, newSnap, "k",
        Seq("o_custkey", "q"))
      IncrementalAgg.refreshMoments(prevAgg, cdf, Seq("o_custkey"), "n", "q")
        .select(col("o_custkey"), col("n"), col("q").as("s"),
          col("q_sq").as("s2"),
          round(IncrementalAgg.popVariance(col("n"), col("q"), col("q_sq")), 6)
            .as("pop_var"))
        .orderBy("o_custkey")
    },

    Q("q265_right_join_incremental_view",
      // RIGHT-OUTER-join IVM — the fourth and last outer shape: R rows
      // always preserved (orphan customers count with NULL totals, the
      // maintained non-null counter restores SQL's NULL sum), while an
      // order whose customer was DELETED must VANISH from the view
      // (there is no left-anti part — the discriminator against q255's
      // full outer, where it migrates to the NULL-segment group). Same
      // churn fixture as q254/q255, so the three outer variants are
      // directly comparable row for row.
      """WITH newA AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(CASE WHEN o_orderkey % 101 = 0 THEN round(o_totalprice + 1, 2)
        |         ELSE o_totalprice END AS DECIMAL(18,2)) AS p
        |  FROM orders WHERE o_orderkey % 89 <> 0 AND o_custkey % 5 <> 0),
        |newB AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 31 = 0 THEN 'MOVED' ELSE c_mktsegment END AS seg
        |  FROM customer WHERE c_custkey % 53 <> 0)
        |SELECT seg, count(*)::BIGINT AS n_rows,
        |  CAST(CAST(sum(p) AS DECIMAL(18,2)) AS DOUBLE) AS total
        |FROM newA RIGHT JOIN newB ON newA.o_custkey = newB.c_custkey
        |GROUP BY seg ORDER BY seg""".stripMargin) { (s, d) =>
      import graft.operators.{IncrementalAgg, Snapshot}
      val orders = t(s, d, "orders").filter(col("o_custkey") % 5 =!= 0)
      val customer = t(s, d, "customer")
      val oldA = orders.filter(col("o_orderkey") % 97 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast("decimal(18,2)").as("p"))
      val newA = orders.filter(col("o_orderkey") % 89 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"),
          when(col("o_orderkey") % 101 === 0, round(col("o_totalprice") + 1, 2))
            .otherwise(col("o_totalprice")).cast("decimal(18,2)").as("p"))
      val oldB = customer.select(col("c_custkey"), col("c_mktsegment").as("seg"))
      val newB = customer.filter(col("c_custkey") % 53 =!= 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 31 === 0, lit("MOVED"))
            .otherwise(col("c_mktsegment")).as("seg"))
      val cdfA = Snapshot.changeDataFeed(oldA, newA, "o_orderkey",
        Seq("o_custkey", "p"))
      val cdfB = Snapshot.changeDataFeed(oldB, newB, "c_custkey", Seq("seg"))
      val prevAgg = oldA
        .join(oldB.withColumnRenamed("c_custkey", "o_custkey"),
          Seq("o_custkey"), "right")
        .groupBy("seg")
        .agg(count(lit(1)).as("n_rows"), sum(col("p")).as("p"),
          count(col("p")).as("p_nn"))
      IncrementalAgg.refreshRightJoinSumCount(prevAgg,
          cdfA.drop("o_orderkey"), oldA.drop("o_orderkey"),
          newA.drop("o_orderkey"), cdfB, oldB, newB,
          leftKey = "o_custkey", rightKey = "c_custkey",
          groupCols = Seq("seg"), cntCol = "n_rows", sumCols = Seq("p"))
        .select(col("seg"), col("n_rows"),
          when(col("p_nn") > 0, col("p"))
            .cast("decimal(18,2)").cast("double").as("total"))
        .orderBy("seg")
    },

    Q("q257_bytebpe_tokenize",
      // BYTE-LEVEL BPE encode (operators/ByteBpe — the GPT-2-class
      // variant: UTF-8 bytes through the published byte↔unicode map,
      // leading spaces ride the pieces as 'Ġ', no UNK arm exists) under
      // a frozen 16-merge table trained on this corpus at sf0.01. The
      // oracle replays the greedy merge application as q194's
      // double-space rewrite chain in mapped byte space, with a
      // piece-boundary sentinel so no merge can span pieces — see
      // byteBpeChainSql.
      s"""SELECT doc_id,
        |  CASE WHEN trim(text) = '' THEN 0
        |       ELSE len(string_split($byteBpeChainSql, '  ')) END::BIGINT AS n_tokens,
        |  CASE WHEN trim(text) = '' THEN md5('')
        |       ELSE md5(replace($byteBpeChainSql, '  ', ' ')) END AS tok_md5
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      ByteBpe.tokenize(t(s, d, "documents"), "doc_id", "text", byteBpeFrozenMerges)
        .select(col("doc_id"), size(col("tokens")).cast("long").as("n_tokens"),
          md5(array_join(col("tokens"), " ")).as("tok_md5"))
        .orderBy("doc_id")
    },

    Q("q258_bytebpe_roundtrip",
      // byte-level BPE is lossless BY CONSTRUCTION (ids are bytes and
      // byte-fusions; no marker bookkeeping): ids back through
      // detokenize reproduce the single-spaced text exactly, for any
      // input byte sequence. The oracle never runs the tokenizer — it
      // normalizes the source text; md5 equality over full bodies is
      // the round-trip claim (the q198 recipe on the fourth family).
      """SELECT doc_id,
        |  length(regexp_replace(trim(text), '\s+', ' ', 'g'))::BIGINT AS n_chars_norm,
        |  md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      ByteBpe.detokenize(
          ByteBpe.tokenizeIds(t(s, d, "documents"), "doc_id", "text",
            byteBpeFrozenMerges),
          byteBpeFrozenMerges)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars_norm"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    },

    Q("q261_image_neardup_qoi",
      // q196's cross-format pairing with the FIFTH image container:
      // every document's BMP plus a QOI re-encode of the same logical
      // image under doc_id + 1e6, built through the REAL Qoi.encode
      // chunk emitter (runs/index/diff/luma/rgb) and decoded back by
      // the sniffing imageDHashes path — lossless, so each pair lands
      // at hamming 0 through the UNCHANGED SimHash banding. The
      // oracle derives both rows' hashes from the shared BMP pixel
      // formula (re-encodes reuse their source's formula — equal hash
      // by construction) and brute-forces pairs at hamming ≤ 3, where
      // 4 × 16-bit banding is exact by pigeonhole.
      """WITH rows AS (
        |  SELECT doc_id, doc_id AS src FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, doc_id AS src FROM documents),
        |dims AS (
        |  SELECT doc_id, src, 8 + src % 9 AS w, 8 + src % 7 AS h FROM rows),
        |cells AS (
        |  SELECT d.doc_id, d.src, d.w, gx.gx, gy.gy,
        |    ((gy.gy * d.h) // 8) * d.w + ((gx.gx * d.w) // 9) AS i
        |  FROM dims d,
        |    (SELECT unnest(generate_series(0, 8)) AS gx) gx,
        |    (SELECT unnest(generate_series(0, 7)) AS gy) gy),
        |lum AS (
        |  SELECT doc_id, gx, gy,
        |    299 * ((3 * src + 7 * i) % 256)
        |    + 587 * ((2 * src + 5 * i) % 256)
        |    + 114 * ((src + 3 * i) % 256) AS luma
        |  FROM cells),
        |bits AS (
        |  SELECT a.doc_id, a.gy * 8 + a.gx AS bit
        |  FROM lum a JOIN lum b
        |    ON b.doc_id = a.doc_id AND b.gy = a.gy AND b.gx = a.gx + 1
        |  WHERE a.gx < 8 AND a.luma < b.luma),
        |sig AS (
        |  SELECT d.doc_id,
        |    coalesce(bit_or(CASE WHEN bit = 63 THEN (-9223372036854775807 - 1)::BIGINT
        |                         ELSE (1::BIGINT << bit::INT) END), 0) AS dhash
        |  FROM dims d LEFT JOIN bits USING (doc_id)
        |  GROUP BY d.doc_id)
        |SELECT a.doc_id AS id1, b.doc_id AS id2,
        |  bit_count(xor(a.dhash, b.dhash))::BIGINT AS hamming
        |FROM sig a JOIN sig b
        |  ON a.doc_id < b.doc_id AND bit_count(xor(a.dhash, b.dhash)) <= 3
        |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      val sigs = Multimodal.imageDHashes(
        Multimodal.syntheticBmpQoiPairs(
          t(s, d, "documents").select("doc_id"), s), s)
      Dedup.simhashPairs(sigs, "doc_id", "dhash",
          nBands = 4, maxHamming = 3, sigBits = 64)
        .orderBy("id1", "id2")
    },

    Q("q266_image_neardup_tiff",
      // the SIXTH container through the same gate: baseline TIFF
      // re-encodes (strip layout varied per id — single- and
      // multi-strip framing both live) of every BMP under doc_id +
      // 1e6, sniffed by magic ('II'/'MM') and paired at hamming 0 by
      // the unchanged banding. Same closed-form oracle as q261: both
      // rows' hashes derive from the shared pixel formula (lossless
      // re-encode ⇒ equal hash by construction), pairs brute-forced at
      // hamming ≤ 3 where 4 × 16-bit banding is exact by pigeonhole.
      """WITH rows AS (
        |  SELECT doc_id, doc_id AS src FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, doc_id AS src FROM documents),
        |dims AS (
        |  SELECT doc_id, src, 8 + src % 9 AS w, 8 + src % 7 AS h FROM rows),
        |cells AS (
        |  SELECT d.doc_id, d.src, d.w, gx.gx, gy.gy,
        |    ((gy.gy * d.h) // 8) * d.w + ((gx.gx * d.w) // 9) AS i
        |  FROM dims d,
        |    (SELECT unnest(generate_series(0, 8)) AS gx) gx,
        |    (SELECT unnest(generate_series(0, 7)) AS gy) gy),
        |lum AS (
        |  SELECT doc_id, gx, gy,
        |    299 * ((3 * src + 7 * i) % 256)
        |    + 587 * ((2 * src + 5 * i) % 256)
        |    + 114 * ((src + 3 * i) % 256) AS luma
        |  FROM cells),
        |bits AS (
        |  SELECT a.doc_id, a.gy * 8 + a.gx AS bit
        |  FROM lum a JOIN lum b
        |    ON b.doc_id = a.doc_id AND b.gy = a.gy AND b.gx = a.gx + 1
        |  WHERE a.gx < 8 AND a.luma < b.luma),
        |sig AS (
        |  SELECT d.doc_id,
        |    coalesce(bit_or(CASE WHEN bit = 63 THEN (-9223372036854775807 - 1)::BIGINT
        |                         ELSE (1::BIGINT << bit::INT) END), 0) AS dhash
        |  FROM dims d LEFT JOIN bits USING (doc_id)
        |  GROUP BY d.doc_id)
        |SELECT a.doc_id AS id1, b.doc_id AS id2,
        |  bit_count(xor(a.dhash, b.dhash))::BIGINT AS hamming
        |FROM sig a JOIN sig b
        |  ON a.doc_id < b.doc_id AND bit_count(xor(a.dhash, b.dhash)) <= 3
        |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      val sigs = Multimodal.imageDHashes(
        Multimodal.syntheticBmpTiffPairs(
          t(s, d, "documents").select("doc_id"), s), s)
      Dedup.simhashPairs(sigs, "doc_id", "dhash",
          nBands = 4, maxHamming = 3, sigBits = 64)
        .orderBy("id1", "id2")
    }
  )
}
