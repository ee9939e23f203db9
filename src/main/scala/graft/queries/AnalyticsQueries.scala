package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PiiRedact, TextAnalysis}
import graft.operators.{Chunking, Curation, Dedup, Histogram, Multimodal, TimeSeries}
import Q.t

/** Round-2 widening of the query inventory: subquery planning (scalar /
  * EXISTS / IN through Catalyst's rewrite-to-join rules), unpivot, array
  * higher-order functions, deterministic sampling, regression statistics,
  * histogram binning, TF-IDF, PII redaction, time-series gap
  * filling / interpolation / smoothing, and z-score outlier detection.
  * Conventions follow RelationalQueries: every float aggregate rounded
  * identically on both sides, every output fully ordered by the driver's
  * sort anyway (ORDER BY kept for readability).
  */
object AnalyticsQueries {

  /** 60-bit md5 hash of a string expr in DuckDB SQL (mirrors Dedup.hash60). */
  private def sqlHash60(e: String) = s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  val all: Seq[Q] = Seq(

    // ------------------------------------------------------ subqueries
    Q("q61_scalar_subquery",
      // Catalyst plans the scalar subquery as a broadcast one-row join;
      // threshold on max() (exact) rather than avg() so the predicate
      // boundary cannot move with summation order
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 0.8 * (SELECT max(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      t(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_totalprice > 0.8 * (SELECT max(o_totalprice) FROM orders)
          |ORDER BY o_orderkey""".stripMargin)
    },

    Q("q62_exists_subquery",
      // correlated EXISTS + NOT EXISTS — Catalyst rewrites to left-semi
      // and left-anti joins (RewritePredicateSubquery), so the physical
      // plan is two shuffled hash joins, never a per-row subquery
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |AND NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      t(s, d, "customer").createOrReplaceTempView("customer")
      t(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT c_custkey, c_name FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o
          |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
          |AND NOT EXISTS (SELECT 1 FROM orders o
          |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
          |ORDER BY c_custkey""".stripMargin)
    },

    Q("q63_in_subquery",
      // IN / NOT IN subqueries (no NULLs in the key columns, so NOT IN is
      // safe) — planned as semi/anti joins like q62
      """SELECT p_brand, count(*) AS n FROM part
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
        |AND p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_discount >= 0.10)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
      t(s, d, "part").createOrReplaceTempView("part")
      t(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT p_brand, count(*) AS n FROM part
          |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
          |AND p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_discount >= 0.10)
          |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
    },

    // ------------------------------------------------- reshaping / HOFs
    Q("q64_unpivot",
      // wide→long reshape then per-metric stats; the oracle spells the
      // reshape as UNION ALL (the portable formulation of UNPIVOT)
      """WITH u AS (
        |  SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT metric, count(*) AS n, round(min(val), 4) AS mn,
        |  round(max(val), 4) AS mx, round(avg(val), 4) AS av
        |FROM u GROUP BY metric ORDER BY metric""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .unpivot(
          Array.empty[org.apache.spark.sql.Column],
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "metric", "val")
        .groupBy("metric")
        .agg(count(lit(1)).as("n"), round(min("val"), 4).as("mn"),
          round(max("val"), 4).as("mx"), round(avg("val"), 4).as("av"))
        .orderBy("metric")
    },

    Q("q65_array_hof",
      // higher-order functions over the embedding vectors; both sides fold
      // left-to-right from the first element (list_reduce / aggregate with
      // first-element seed), so the float math is order-identical
      """SELECT vec_id,
        |  round(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
        |    (acc, x) -> acc + x), 4) AS l2sq,
        |  len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS n_pos,
        |  round(list_reduce(list_transform(embedding::DOUBLE[], x -> abs(x)),
        |    (acc, x) -> greatest(acc, x)), 6) AS max_abs
        |FROM embeddings WHERE vec_id < 200 ORDER BY vec_id""".stripMargin) { (s, d) =>
      val dv = transform(col("embedding"), x => x.cast("double"))
      val sq = transform(dv, x => x * x)
      val av = transform(dv, x => abs(x))
      t(s, d, "embeddings")
        .filter(col("vec_id") < 200)
        .select(col("vec_id"),
          round(Q.seededFold(sq), 4).as("l2sq"),
          size(filter(dv, x => x > 0)).cast("long").as("n_pos"),
          round(Q.seededFold(av, (acc, x) => greatest(acc, x)), 6).as("max_abs"))
        .orderBy("vec_id")
    },

    // ------------------------------------------------------- sampling
    Q("q66_hash_sample",
      // deterministic hash sampling (the reproducible flavor of
      // TABLESAMPLE): membership depends only on the row key, so the
      // sample is stable across engines, runs, and partitionings — the
      // property training-data pipelines need for resumable subsetting
      s"""SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
         |FROM lineitem
         |WHERE ${sqlHash60("l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR")} % 20 = 0
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .filter(Dedup.hash60(concat(col("l_orderkey").cast("string"), lit("-"),
          col("l_linenumber").cast("string"))) % 20 === 0)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("sum_price"))
        .orderBy("l_returnflag")
    },

    Q("q67_stratified_sample",
      // variable-rate stratified sampling — downsample the majority class
      // (en) to 10% while keeping 50% of everything else: the
      // class-rebalancing primitive, as a pure filter (no shuffle)
      s"""SELECT lang, count(*) AS n_sampled, min(doc_id) AS first_id, max(doc_id) AS last_id
         |FROM documents
         |WHERE ${sqlHash60("doc_id::VARCHAR")} % 10 <
         |  (CASE WHEN lang = 'en' THEN 1 ELSE 5 END)
         |GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .filter(Dedup.hash60(col("doc_id").cast("string")) % 10 <
          when(col("lang") === "en", 1).otherwise(5))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"), min("doc_id").as("first_id"),
          max("doc_id").as("last_id"))
        .orderBy("lang")
    },

    // ------------------------------------------------------ statistics
    Q("q68_corr_regr",
      """SELECT l_returnflag,
        |  round(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
        |  round(covar_samp(l_extendedprice, l_quantity), 2) AS covar_pq,
        |  round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(corr("l_extendedprice", "l_quantity"), 6).as("corr_pq"),
          round(covar_samp("l_extendedprice", "l_quantity"), 2).as("covar_pq"),
          round(expr("regr_slope(l_extendedprice, l_quantity)"), 6).as("slope"),
          round(expr("regr_intercept(l_extendedprice, l_quantity)"), 2).as("intercept"),
          round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    Q("q69_histogram",
      // fixed-width binning by arithmetic (identical IEEE division on both
      // sides); top bin clamps the tail
      """SELECT CAST(least(floor(o_totalprice / 25000.0), 23) AS BIGINT) AS bucket,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .groupBy(least(floor(col("o_totalprice") / 25000.0), lit(23L)).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("bucket")
    },

    // ------------------------------------------------- text / documents
    Q("q70_tfidf",
      // classic TF-IDF with top-3 terms per document; ranking is over the
      // ROUNDED score (tok tiebreak), so 1-ulp ln() differences between
      // engines cannot reorder the cut
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
        |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |scored AS (
        |  SELECT t.doc_id, t.tok,
        |    round(t.tf * ln((SELECT count(DISTINCT doc_id) FROM documents)::DOUBLE / df.df),
        |      6) AS tfidf
        |  FROM tf t JOIN dfreq df USING (tok) WHERE t.doc_id < 100)
        |SELECT doc_id, CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, tok) AS BIGINT) AS rank, tok, tfidf
        |FROM scored QUALIFY rank <= 3 ORDER BY doc_id, rank""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val toks = docs.select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(countDistinct("doc_id").as("__n"))
      val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("tok"))
      tf.filter(col("doc_id") < 100)
        .join(dfreq, "tok")
        .crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("tok"),
          round(col("tf") * log(col("__n").cast("double") / col("df")), 6).as("tfidf"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select("doc_id", "rank", "tok", "tfidf")
        .orderBy("doc_id", "rank")
    },

    Q("q71_pii_redact",
      // synthetic PII is appended deterministically (the corpus itself is
      // clean), then redacted email → phone → digit-run; counts are
      // per-kind audit metrics on the progressively-redacted text
      s"""WITH aug AS (
         |  SELECT doc_id,
         |    text || ' Contact user' || doc_id::VARCHAR || '@example.com or +1 (212) 555-01'
         |      || lpad((doc_id % 100)::VARCHAR, 2, '0') || ' ref ' || (doc_id * 7919)::VARCHAR AS txt
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, txt,
         |    regexp_replace(txt, '${PiiRedact.EmailRe}', '[EMAIL]', 'g') AS t1
         |  FROM aug),
         |r2 AS (
         |  SELECT doc_id, txt, t1,
         |    regexp_replace(t1, '${PiiRedact.PhoneRe}', '[PHONE]', 'g') AS t2
         |  FROM r)
         |SELECT doc_id,
         |  md5(regexp_replace(t2, '${PiiRedact.NumRe}', '[NUM]', 'g')) AS redacted_md5,
         |  len(regexp_extract_all(txt, '${PiiRedact.EmailRe}'))::BIGINT AS n_emails,
         |  len(regexp_extract_all(t1, '${PiiRedact.PhoneRe}'))::BIGINT AS n_phones,
         |  len(regexp_extract_all(t2, '${PiiRedact.NumRe}'))::BIGINT AS n_nums
         |FROM r2 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val aug = t(s, d, "documents")
        .select(col("doc_id"), concat(
          col("text"), lit(" Contact user"), col("doc_id").cast("string"),
          lit("@example.com or +1 (212) 555-01"),
          lpad((col("doc_id") % 100).cast("string"), 2, "0"),
          lit(" ref "), (col("doc_id") * 7919).cast("string")).as("txt"))
      aug.select(col("doc_id"),
          md5(PiiRedact.redact(col("txt"))).as("redacted_md5"),
          PiiRedact.emailCount(col("txt")).as("n_emails"),
          PiiRedact.phoneCount(col("txt")).as("n_phones"),
          PiiRedact.digitRunCount(col("txt")).as("n_nums"))
        .orderBy("doc_id")
    },

    // ------------------------------------------------- time series
    Q("q72_gapfill_locf",
      // daily resample per user, densified to a regular grid, gaps filled
      // by last observation carried forward — the telemetry "value at any
      // time" read the reference's current-value table can't answer
      """WITH b AS (
        |  SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS bucket,
        |    max(value) AS v
        |  FROM events GROUP BY user_id, bucket),
        |g AS (
        |  SELECT user_id, unnest(generate_series(min(bucket), max(bucket), INTERVAL 1 DAY)) AS bucket
        |  FROM b GROUP BY user_id),
        |j AS (
        |  SELECT g.user_id, g.bucket, b.v,
        |    CAST(CASE WHEN b.v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS was_gap
        |  FROM g LEFT JOIN b USING (user_id, bucket))
        |SELECT user_id, bucket,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v,
        |  was_gap
        |FROM j ORDER BY user_id, bucket""".stripMargin) { (s, d) =>
      val buckets = TimeSeries.resample(t(s, d, "events"), "user_id", "ts", "value", "day", how = "max")
      val grid = TimeSeries.denseGrid(buckets, "user_id", "bucket", "v", "1 day")
      TimeSeries.locf(grid, "user_id", "bucket", "v")
        .select("user_id", "bucket", "v", "was_gap")
        .orderBy("user_id", "bucket")
    },

    Q("q73_interpolate",
      // linear interpolation across grid gaps, clamped at the edges; the
      // interpolation expression is written in the same shape on both
      // sides so the doubles match bit-for-bit before rounding
      """WITH b AS (
        |  SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS bucket,
        |    max(value) AS v
        |  FROM events GROUP BY user_id, bucket),
        |g AS (
        |  SELECT user_id, unnest(generate_series(min(bucket), max(bucket), INTERVAL 1 DAY)) AS bucket
        |  FROM b GROUP BY user_id),
        |j AS (SELECT g.user_id, g.bucket, b.v FROM g LEFT JOIN b USING (user_id, bucket)),
        |e AS (
        |  SELECT user_id, bucket, v,
        |    last_value(v IGNORE NULLS) OVER wa AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER wa AS pt,
        |    first_value(v IGNORE NULLS) OVER wd AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER wd AS nt
        |  FROM j
        |  WINDOW wa AS (PARTITION BY user_id ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wd AS (PARTITION BY user_id ORDER BY bucket
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, bucket,
        |  round(CASE WHEN v IS NOT NULL THEN v
        |    WHEN pv IS NULL THEN nv
        |    WHEN nv IS NULL THEN pv
        |    ELSE pv + (nv - pv) * ((epoch(bucket) - epoch(pt)) / (epoch(nt) - epoch(pt)))
        |  END, 6) AS v
        |FROM e ORDER BY user_id, bucket""".stripMargin) { (s, d) =>
      val buckets = TimeSeries.resample(t(s, d, "events"), "user_id", "ts", "value", "day", how = "max")
      val grid = TimeSeries.denseGrid(buckets, "user_id", "bucket", "v", "1 day")
      TimeSeries.interpolateLinear(grid, "user_id", "bucket", "v")
        .select("user_id", "bucket", "v")
        .orderBy("user_id", "bucket")
    },

    Q("q74_zscore_outliers",
      // per-type z-score anomaly flagging — the telemetry "bad reading"
      // detector; the stats side is a tiny broadcast
      """WITH s AS (
        |  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, round((e.value - s.mu) / s.sd, 4) AS z
        |FROM events e JOIN s USING (event_type)
        |WHERE abs((e.value - s.mu) / s.sd) > 3
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val stats = ev.groupBy("event_type")
        .agg(avg("value").as("mu"), stddev_samp("value").as("sd"))
      ev.join(broadcast(stats), "event_type")
        .withColumn("z", (col("value") - col("mu")) / col("sd"))
        .filter(abs(col("z")) > 3)
        .select(col("event_id"), col("event_type"), round(col("z"), 4).as("z"))
        .orderBy("event_id")
    },

    Q("q75_ewma",
      // trailing-20 EWMA per user; both sides fold the window list
      // left-to-right with the α-only recurrence (see TimeSeries.ewma),
      // so the doubles are identical before rounding
      """WITH l AS (
        |  SELECT user_id, event_id,
        |    list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lv
        |  FROM events WHERE user_id < 30 AND value IS NOT NULL)
        |SELECT user_id, event_id,
        |  round(list_reduce(lv, (acc, x) -> acc + (x - acc) * 0.3), 6) AS ewma
        |FROM l ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      TimeSeries.ewma(t(s, d, "events").filter(col("user_id") < 30),
          "user_id", Seq(col("ts"), col("event_id")), "value", alpha = 0.3, lookback = 20)
        .select("user_id", "event_id", "ewma")
        .orderBy("user_id", "event_id")
    },

    // ------------------------------------------------- dedup (n-gram)
    Q("q76_ngram_jaccard",
      // character-4-gram Jaccard with (lang, source) attribute blocking —
      // the metadata-blocked sibling of MinHash-LSH (q34)
      """WITH g AS (
        |  SELECT DISTINCT doc_id, substr(text, i, 4) AS shingle
        |  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text) - 3)) AS i
        |        FROM documents WHERE length(text) >= 4)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
        |cand AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2
        |  FROM documents a JOIN documents b
        |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id),
        |inter AS (
        |  SELECT c.id1, c.id2, count(*) AS i
        |  FROM cand c
        |  JOIN g g1 ON g1.doc_id = c.id1
        |  JOIN g g2 ON g2.doc_id = c.id2 AND g2.shingle = g1.shingle
        |  GROUP BY c.id1, c.id2)
        |SELECT i.id1, i.id2, round(i.i::DOUBLE / (z1.sz + z2.sz - i.i), 6) AS jaccard
        |FROM inter i
        |JOIN sizes z1 ON z1.doc_id = i.id1
        |JOIN sizes z2 ON z2.doc_id = i.id2
        |WHERE i.i::DOUBLE / (z1.sz + z2.sz - i.i) >= 0.35
        |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
          k = 4, blockCols = Seq("lang", "source"), threshold = 0.35)
        .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id1", "id2")
    },

    Q("q77_doc_chunking",
      // overlapping token-window chunking (size 32, overlap 8 → stride
      // 24); chunk content compared by md5 so rows stay narrow
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |c AS (
        |  SELECT doc_id, toks, unnest(generate_series(1, len(toks), 24)) AS start
        |  FROM w)
        |SELECT doc_id, CAST((start - 1) // 24 AS BIGINT) AS chunk_idx,
        |  len(toks[start : least(start + 31, len(toks))])::BIGINT AS n_tokens,
        |  md5(array_to_string(toks[start : least(start + 31, len(toks))], ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
      Chunking.chunkByTokens(t(s, d, "documents"), "doc_id", "text",
          chunkSize = 32, overlap = 8)
        .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
          md5(col("chunk_text")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
    },

    Q("q78_containment",
      // near-superset detection: |A∩B| / min(|A|,|B|) — catches short-doc-
      // inside-long-doc relations that symmetric Jaccard misses
      """WITH g AS (
        |  SELECT DISTINCT doc_id, substr(text, i, 4) AS shingle
        |  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text) - 3)) AS i
        |        FROM documents WHERE length(text) >= 4)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
        |cand AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2
        |  FROM documents a JOIN documents b
        |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id),
        |inter AS (
        |  SELECT c.id1, c.id2, count(*) AS i
        |  FROM cand c
        |  JOIN g g1 ON g1.doc_id = c.id1
        |  JOIN g g2 ON g2.doc_id = c.id2 AND g2.shingle = g1.shingle
        |  GROUP BY c.id1, c.id2)
        |SELECT i.id1, i.id2, round(i.i::DOUBLE / least(z1.sz, z2.sz), 6) AS containment
        |FROM inter i
        |JOIN sizes z1 ON z1.doc_id = i.id1
        |JOIN sizes z2 ON z2.doc_id = i.id2
        |WHERE i.i::DOUBLE / least(z1.sz, z2.sz) >= 0.5
        |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      Dedup.containmentPairs(t(s, d, "documents"), "doc_id", "text",
          k = 4, blockCols = Seq("lang", "source"), threshold = 0.5)
        .select(col("id1"), col("id2"), round(col("containment"), 6).as("containment"))
        .orderBy("id1", "id2")
    },

    Q("q79_correlated_scalar",
      // correlated scalar subquery in the SELECT list — Catalyst
      // decorrelates it into an aggregate + left outer join, never a
      // per-row re-execution (asserted in PlanAuditSpec for q61's sibling)
      """SELECT c_custkey, c_name,
        |  (SELECT round(coalesce(max(o_totalprice), 0), 2) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS max_order
        |FROM customer c ORDER BY c_custkey""".stripMargin) { (s, d) =>
      t(s, d, "customer").createOrReplaceTempView("customer")
      t(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT c_custkey, c_name,
          |  (SELECT round(coalesce(max(o_totalprice), 0), 2) FROM orders o
          |   WHERE o.o_custkey = c.c_custkey) AS max_order
          |FROM customer c ORDER BY c_custkey""".stripMargin)
    },

    Q("q80_lateral_topn",
      // correlated LATERAL subquery with ORDER BY + LIMIT — per-group
      // top-n through the SQL lateral path (the window formulation of the
      // same shape is q09)
      """SELECT n_name, c.c_name, c.c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin) { (s, d) =>
      t(s, d, "nation").createOrReplaceTempView("nation")
      t(s, d, "customer").createOrReplaceTempView("customer")
      s.sql(
        """SELECT n_name, c.c_name, c.c_acctbal
          |FROM nation, LATERAL (
          |  SELECT c_name, c_acctbal FROM customer
          |  WHERE c_nationkey = n_nationkey
          |  ORDER BY c_acctbal DESC, c_name LIMIT 2) c
          |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin)
    },

    Q("q81_event_funnel",
      // ordered-step funnel (view → click → purchase by each user's
      // earliest event of each type): one hash aggregation per user, one
      // global roll-up — no self-joins, the shape that survives billions
      // of events
      """WITH m AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS t_view,
        |    min(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS t_purchase
        |  FROM events GROUP BY user_id)
        |SELECT count(*) AS n_users, count(t_view) AS n_view,
        |  count(CASE WHEN t_click > t_view THEN 1 END) AS n_view_click,
        |  count(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END) AS n_full_funnel
        |FROM m""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("t_view"),
          min(when(col("event_type") === "click", col("ts"))).as("t_click"),
          min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
        .agg(
          count(lit(1)).as("n_users"),
          count(col("t_view")).as("n_view"),
          count(when(col("t_click") > col("t_view"), 1)).as("n_view_click"),
          count(when(col("t_purchase") > col("t_click") && col("t_click") > col("t_view"), 1))
            .as("n_full_funnel"))
    },

    Q("q82_cohort_retention",
      // cohort = each user's first-activity day; retention = distinct
      // users active at day offsets 0/1/7/14 — two aggregations and one
      // equi-join on user_id
      """WITH f AS (
        |  SELECT user_id,
        |    min(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)) AS cohort_day
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day
        |  FROM events)
        |SELECT f.cohort_day, CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) AS day_offset,
        |  count(DISTINCT a.user_id) AS active_users
        |FROM f JOIN a USING (user_id)
        |WHERE date_diff('day', f.cohort_day, a.day) IN (0, 1, 7, 14)
        |GROUP BY f.cohort_day, day_offset ORDER BY cohort_day, day_offset""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val f = ev.groupBy("user_id")
        .agg(min(date_trunc("day", col("ts"))).as("cohort_day"))
      val a = ev.select(col("user_id"), date_trunc("day", col("ts")).as("day")).distinct()
      f.join(a, "user_id")
        .withColumn("day_offset", datediff(col("day"), col("cohort_day")).cast("long"))
        .filter(col("day_offset").isin(0L, 1L, 7L, 14L))
        .groupBy("cohort_day", "day_offset")
        .agg(countDistinct("user_id").as("active_users"))
        .orderBy("cohort_day", "day_offset")
    },

    Q("q83_sequence_packing",
      // contiguous sequence packing: chunks fill 512-token training
      // sequences in (doc_id, chunk_idx) order via a running token count —
      // sharded so the cumsum window parallelizes (a GLOBAL packing order
      // would serialize the window at scale; per-shard order is what a
      // real pipeline uses). All-integer arithmetic: no float drift.
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |c AS (
        |  SELECT doc_id, CAST((start - 1) // 24 AS BIGINT) AS chunk_idx,
        |    len(toks[start : least(start + 31, len(toks))])::BIGINT AS n_tokens
        |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks), 24)) AS start
        |        FROM w)),
        |s AS (
        |  SELECT doc_id, chunk_idx, n_tokens, doc_id % 8 AS shard,
        |    sum(n_tokens) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id, chunk_idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM c)
        |SELECT shard, CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_id,
        |  count(*) AS n_chunks, CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM s GROUP BY shard, seq_id ORDER BY shard, seq_id""".stripMargin) { (s, d) =>
      val chunks = Chunking.chunkByTokens(t(s, d, "documents"), "doc_id", "text",
          chunkSize = 32, overlap = 8)
        .withColumn("shard", col("doc_id") % 8)
      val w = Window.partitionBy("shard").orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      chunks
        .withColumn("cum", sum("n_tokens").over(w))
        .withColumn("seq_id", floor((col("cum") - col("n_tokens")) / 512).cast("long"))
        .groupBy("shard", "seq_id")
        .agg(count(lit(1)).as("n_chunks"), sum("n_tokens").as("seq_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("shard", "seq_id")
    },

    Q("q84_repetition_ratio",
      // intra-document repetition (the C4/Gopher-style quality signal):
      // share of word 3-shingles that are duplicates within the document.
      // Integer counts + one exact rational division.
      """WITH words AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
        |        FROM words WHERE len(w) >= 3)),
        |m AS (
        |  SELECT doc_id, count(*) AS total_shingles,
        |    count(DISTINCT shingle) AS uniq_shingles
        |  FROM sh GROUP BY doc_id)
        |SELECT doc_id, total_shingles, uniq_shingles,
        |  round(1.0 - uniq_shingles::DOUBLE / total_shingles, 6) AS rep_ratio
        |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
      Dedup.rawShingles(t(s, d, "documents"), "doc_id", "text", 3)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("total_shingles"),
          countDistinct("shingle").as("uniq_shingles"))
        .select(col("doc_id"), col("total_shingles"), col("uniq_shingles"),
          round(lit(1.0d) - col("uniq_shingles").cast("double") /
            col("total_shingles").cast("double"), 6).as("rep_ratio"))
        .orderBy("doc_id")
    },

    Q("q85_window_extras",
      // the analytic functions q48 leaves out: cume_dist, nth_value and
      // first/last over explicit row frames — one shared window spec, one
      // sort (same single-pass property PlanAuditSpec pins for q73)
      """SELECT o_orderkey, o_orderpriority,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  nth_value(o_orderkey, 2) OVER w AS second_key,
        |  first_value(o_orderkey) OVER w AS top_key,
        |  last_value(o_orderkey) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS bottom_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, cd, o_orderkey LIMIT 400""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          round(cume_dist().over(w), 6).as("cd"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_key"),
          first(col("o_orderkey")).over(w).as("top_key"),
          last(col("o_orderkey")).over(wFull).as("bottom_key"))
        .orderBy(col("o_orderpriority"), col("cd"), col("o_orderkey"))
        .limit(400)
    },

    Q("q86_fuzzy_match",
      // edit-distance fuzzy matching (the typo-tolerant dedup modality the
      // hash-based pipelines cannot provide): within-nation name pairs at
      // levenshtein <= 2, aggregated per nation. The engine side never
      // forms the quadratic pair set: close pairs come from
      // Dedup.editDistancePairs (deletion-neighborhood candidates — exact
      // for d <= 2, candidates ∝ n·len², verified with the banded
      // levenshtein(_,_,2)), and the total-pair count is C(n,2) per nation
      // from a plain aggregate. The fixed-25-block quadratic this replaces
      // was 4.5M pairs at sf0.1 → 45B at 100×; the oracle still spells the
      // quadratic semantics, which is exactly what the operator must
      // reproduce. Integer distances, no float drift.
      """WITH p AS (
        |  SELECT a.c_nationkey AS nk,
        |    levenshtein(a.c_name, b.c_name) AS dist
        |  FROM customer a JOIN customer b
        |    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey)
        |SELECT nk, count(*) AS n_pairs,
        |  count(CASE WHEN dist <= 2 THEN 1 END) AS n_close,
        |  coalesce(min(CASE WHEN dist <= 2 THEN dist END), -1) AS min_close
        |FROM p GROUP BY nk ORDER BY nk""".stripMargin) { (s, d) =>
      val c = t(s, d, "customer")
      val closeAgg = Dedup.editDistancePairs(c, "c_custkey", "c_name",
          maxDist = 2, blockCols = Seq("c_nationkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("__n_close"), min("dist").as("__min_close"))
      // total pairs per nation = C(cnt, 2), integer DIV (the product is
      // even; DIV keeps it exact where a double division would lose
      // precision past 2^53 at cluster-scale counts)
      c.groupBy("c_nationkey").agg(count(lit(1)).as("__cnt"))
        .filter(col("__cnt") >= 2)
        .withColumn("n_pairs", expr("__cnt * (__cnt - 1) DIV 2"))
        .join(closeAgg, Seq("c_nationkey"), "left")
        .select(col("c_nationkey").as("nk"), col("n_pairs"),
          coalesce(col("__n_close"), lit(0L)).as("n_close"),
          // BIGINT, not Spark's int32 levenshtein: DuckDB's min/coalesce
          // yields int64 and the driver hash is representation-sensitive
          // (r13 exact-arrow-type sweep)
          coalesce(col("__min_close"), lit(-1)).cast("long").as("min_close"))
        .orderBy("nk")
    },

    Q("q87_equidepth_histogram",
      // equi-depth (quantile) histogram — the profiling twin of q69's
      // equi-width bins. The ORACLE pins the textbook ntile semantics;
      // the engine side reproduces them EXACTLY via Histogram.ntileExact
      // (range repartition + local sorts + per-partition offset fix-up —
      // the two-phase distributed ranking), so no unpartitioned window
      // appears anywhere in the plan. The ε-tolerant 100 TB variant is
      // Histogram.equiDepthApprox (spec-checked against this exact form).
      // Counts and min/max only: all order-independent and exact.
      """WITH r AS (
        |  SELECT o_totalprice,
        |    CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS bucket
        |  FROM orders)
        |SELECT bucket, count(*) AS n, round(min(o_totalprice), 2) AS mn,
        |  round(max(o_totalprice), 2) AS mx
        |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      Histogram.ntileExact(
          t(s, d, "orders").select("o_totalprice", "o_orderkey"),
          Seq(col("o_totalprice"), col("o_orderkey")), 10)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), round(min("o_totalprice"), 2).as("mn"),
          round(max("o_totalprice"), 2).as("mx"))
        .orderBy("bucket")
    },

    Q("q88_null_semantics",
      // NULL-semantics pin-down: a nullable group key (the NULL group),
      // count(*) vs count(col), aggregates skipping NULLs, and distinct
      // over a nullable column — the places engines classically diverge
      """WITH e AS (
        |  SELECT nullif(event_type, 'error') AS et,
        |    CASE WHEN value < 1 THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT et, count(*) AS n_rows, count(v) AS n_vals,
        |  count(*) - count(v) AS n_nulls,
        |  round(coalesce(avg(v), -1), 4) AS avg_v,
        |  count(DISTINCT v) AS n_distinct_vals
        |FROM e GROUP BY et ORDER BY et NULLS FIRST""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .select(expr("nullif(event_type, 'error')").as("et"),
          when(col("value") < 1, lit(null)).otherwise(col("value")).as("v"))
        .groupBy("et")
        .agg(count(lit(1)).as("n_rows"), count(col("v")).as("n_vals"),
          (count(lit(1)) - count(col("v"))).as("n_nulls"),
          round(coalesce(avg("v"), lit(-1d)), 4).as("avg_v"),
          countDistinct(col("v")).as("n_distinct_vals"))
        .orderBy(col("et").asc_nulls_first)
    },

    Q("q89_decimal_exact_sum",
      // exact DECIMAL aggregation: cast cents-valued doubles to
      // DECIMAL(18,2) and sum WITHOUT float reorder noise (integer cents
      // under the hood, associative and order-independent) — the antidote
      // to the magnitude-dependent rounding hazard q49 hit. One final
      // double conversion of the exact total on both sides.
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    Q("q90_audio_decode",
      // REAL audio decode, oracle-checked — the WAV sibling of q44: the
      // engine builds a genuine RIFF/WAVE PCM16 file per document
      // (deterministic sample formula) and parses it back with the
      // pure-JVM chunk-walking decoder. The oracle predicts the stats
      // from the formula; sums are exact integers (|s| <= 32768, n <= 193
      // → far below 2^53), the mean divides identical operands on both
      // sides. CASTs pin BIGINT vs HUGEINT.
      """WITH dims AS (
        |  SELECT doc_id, 64 + doc_id % 129 AS n FROM documents),
        |sm AS (
        |  SELECT doc_id, n, ((13 * doc_id + 31 * i) % 65536) - 32768 AS s
        |  FROM (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM dims))
        |SELECT doc_id, 8000 AS sample_rate, 1 AS n_channels,
        |  CAST(n AS BIGINT) AS n_samples,
        |  round(avg(s), 6) AS mean_amp,
        |  CAST(sum(abs(s)) AS BIGINT) AS sum_abs
        |FROM sm GROUP BY doc_id, n ORDER BY doc_id""".stripMargin) { (s, d) =>
      Multimodal.decodeWavFeatures(
          Multimodal.syntheticWavs(t(s, d, "documents").select("doc_id"), s), s)
        .select(col("doc_id"), col("sample_rate"), col("n_channels"),
          col("n_samples"), round(col("mean_amp"), 6).as("mean_amp"),
          col("sum_abs"))
        .orderBy("doc_id")
    },

    // ------------------------------------------------ corpus curation
    Q("q91_domain_quota",
      // domain balancing: keep at most 10 docs per source, chosen in
      // deterministic hash order (reproducible "random" — auditable
      // curation). Per-group window, one shuffle on the group key.
      s"""WITH r AS (
         |  SELECT source, doc_id,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY ${sqlHash60("doc_id::VARCHAR")}, doc_id) AS rk
         |  FROM documents)
         |SELECT source, count(*) AS n_kept,
         |  CAST(sum(doc_id) AS BIGINT) AS kept_id_sum, min(doc_id) AS first_kept
         |FROM r WHERE rk <= 10 GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      Curation.quotaPerGroup(t(s, d, "documents"), "source", "doc_id", 10)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("kept_id_sum"),
          min("doc_id").as("first_kept"))
        .orderBy("source")
    },

    Q("q92_boilerplate_removal",
      // C4-style boilerplate scrub at 8-token-segment granularity: drop
      // segments whose exact text occurs in >1 document (the planted
      // near-dup clusters share them), reassemble survivors in order.
      // Content compared by md5 so rows stay narrow.
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, i AS idx, array_to_string(toks[i*8+1 : i*8+8], ' ') AS seg
        |  FROM (SELECT doc_id, toks, unnest(generate_series(0, (len(toks)-1)//8)) AS i
        |        FROM w WHERE len(toks) >= 1)),
        |d AS (SELECT seg, count(DISTINCT doc_id) AS df FROM s GROUP BY seg),
        |k AS (SELECT s.doc_id, s.idx, s.seg FROM s JOIN d USING (seg) WHERE d.df <= 1),
        |t AS (SELECT doc_id, count(*) AS n_segs FROM s GROUP BY doc_id),
        |r AS (SELECT doc_id, count(*) AS n_kept,
        |        md5(string_agg(seg, ' ' ORDER BY idx)) AS clean_md5
        |      FROM k GROUP BY doc_id)
        |SELECT t.doc_id, t.n_segs, t.n_segs - coalesce(r.n_kept, 0) AS n_removed,
        |  coalesce(r.clean_md5, md5('')) AS clean_md5
        |FROM t LEFT JOIN r USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, d) =>
      Curation.removeBoilerplateSegments(t(s, d, "documents"), "doc_id", "text",
          segTokens = 8, maxDf = 1L)
        .select(col("doc_id"), col("n_segs"), col("n_removed"),
          md5(col("clean_text")).as("clean_md5"))
        .orderBy("doc_id")
    },

    Q("q93_decontamination",
      // benchmark decontamination: flag training docs sharing any word
      // 8-gram with the held-out benchmark slice (doc_id < 100 — a
      // fixed-size benchmark, like real ones) — the pre-training overlap
      // check. Shingle equi-joins only; the planted near-dup clusters
      // straddling the boundary are exactly what it must catch.
      """WITH w AS (
        |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, source, array_to_string(t[i : i+7], ' ') AS g
        |  FROM (SELECT doc_id, source, t, unnest(generate_series(1, len(t) - 7)) AS i
        |        FROM w WHERE len(t) >= 8)),
        |bsh AS (SELECT DISTINCT g FROM sh WHERE doc_id < 100),
        |flag AS (
        |  SELECT sh.doc_id, sh.source, count(*) AS n_hits
        |  FROM sh JOIN bsh USING (g) WHERE sh.doc_id >= 100
        |  GROUP BY sh.doc_id, sh.source)
        |SELECT source, count(*) AS n_contaminated,
        |  CAST(sum(n_hits) AS BIGINT) AS total_hits, min(doc_id) AS first_doc
        |FROM flag GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val bench = docs.filter(col("doc_id") < 100)
      val train = docs.filter(col("doc_id") >= 100)
      Curation.contaminatedDocs(train, bench, "doc_id", "text", n = 8)
        .join(train.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_contaminated"), sum("n_hits").as("total_hits"),
          min("doc_id").as("first_doc"))
        .orderBy("source")
    },

    Q("q171_budget_select",
      // token-budget fill ("the best 40% of corpus chars"): bucket-level
      // best-first cumulative (per-score totals only — the corpus is
      // never globally sorted), whole better buckets kept, the threshold
      // bucket hash-sampled at an integer-basis-point remainder rate.
      // All integer arithmetic — the oracle replays it exactly.
      s"""WITH s AS (
        |  SELECT doc_id, n_chars, least(9, n_chars // 100) AS score FROM documents),
        |tot AS (SELECT sum(n_chars) * 2 // 5 AS budget FROM s),
        |b AS (SELECT score, sum(n_chars) AS btok FROM s GROUP BY score),
        |c AS (SELECT score, btok,
        |    coalesce(sum(btok) OVER (ORDER BY score DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
        |  FROM b),
        |r AS (SELECT score,
        |    CASE WHEN bef >= budget THEN 0
        |         WHEN bef + btok <= budget THEN 10000
        |         ELSE (budget - bef) * 10000 // btok END AS bp
        |  FROM c, tot)
        |SELECT s.doc_id, CAST(s.score AS BIGINT) AS score, s.n_chars
        |FROM s JOIN r USING (score)
        |WHERE ${sqlHash60("s.doc_id::VARCHAR")} % 10000 < r.bp
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
        .withColumn("score", least(lit(9L), expr("n_chars div 100")))
      // the 40% budget derives from the per-score totals the selection
      // already aggregates — no separate total-scan pass
      Curation.budgetSelectFraction(docs, "score", "n_chars", "doc_id", 2L, 5L)
        .select(col("doc_id"), col("score").cast("long").as("score"), col("n_chars"))
        .orderBy("doc_id")
    },

    Q("q174_budget_select_bucketed",
      // q171's budget fill for CONTINUOUS scores (ln(1+n_chars): real-
      // valued, unbounded domain — the exact path's per-score walk would
      // be O(#distinct values)): equi-depth RANK buckets via exact ntile
      // over (score DESC, doc_id), whole better buckets kept, the
      // threshold bucket hash-filled at an integer-basis-point rate. The
      // driver collect is the 32 bucket totals, O(B) whatever the score
      // cardinality. The oracle replays ntile + walk + gate verbatim;
      // ranking by a MONOTONE score is order-identical across engines
      // even when the float values differ in the last bit. The raw ln
      // value itself is NOT output: a 1-ulp libm difference landing on a
      // rounding boundary would hash-mismatch — the selection (which the
      // monotonicity argument covers) is the thing under test.
      s"""WITH s AS (
        |  SELECT doc_id, n_chars, ln(1 + n_chars) AS score FROM documents),
        |tot AS (SELECT sum(n_chars) * 2 // 5 AS budget FROM s),
        |r AS (
        |  SELECT doc_id, n_chars, score,
        |    CAST(ntile(32) OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS bucket
        |  FROM s),
        |b AS (SELECT bucket, sum(n_chars) AS btok FROM r GROUP BY bucket),
        |c AS (SELECT bucket, btok,
        |    coalesce(sum(btok) OVER (ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
        |  FROM b),
        |rt AS (SELECT bucket,
        |    CASE WHEN bef >= budget THEN 0
        |         WHEN bef + btok <= budget THEN 10000
        |         ELSE (budget - bef) * 10000 // btok END AS bp
        |  FROM c, tot)
        |SELECT r.doc_id, r.n_chars
        |FROM r JOIN rt USING (bucket)
        |WHERE ${sqlHash60("r.doc_id::VARCHAR")} % 10000 < rt.bp
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
        .withColumn("score", log(lit(1) + col("n_chars")))
      Curation.budgetSelectBucketedFraction(
          docs, "score", "n_chars", "doc_id", 2L, 5L, buckets = 32)
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id")
    },

    Q("q169_corpus_card",
      // the corpus DATASHEET — the first question asked of a new corpus:
      // per source, volume, exact-duplicate pressure (copies beyond the
      // first per distinct text, via a content-key-partitioned count —
      // a KEYED shuffle, never a global window), length profile, and
      // language spread. One scan + one content-key exchange + one
      // per-source aggregation; every number integer- or avg-exact.
      """WITH c AS (
        |  SELECT d.source, d.lang, d.n_chars,
        |    row_number() OVER (PARTITION BY md5(d.text) ORDER BY d.doc_id) AS rk
        |  FROM documents d)
        |SELECT source,
        |  count(*) AS n_docs,
        |  CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_copies,
        |  round(avg(n_chars), 4) AS mean_chars,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
        |FROM c GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(md5(col("text")))
      val c = t(s, d, "documents")
        .select(col("source"), col("lang"), col("n_chars"),
          row_number().over(w.orderBy(col("doc_id"))).as("rk"))
      c.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rk") > 1, 1L).otherwise(0L)).as("n_dup_copies"),
          round(avg(col("n_chars")), 4).as("mean_chars"),
          countDistinct(col("lang")).as("n_langs"),
          sum(when(col("n_chars") < 100, 1L).otherwise(0L)).as("n_short"))
        .orderBy("source")
    },

    Q("q168_bloom_decontamination",
      // the 100 TB decontamination plan: identical SEMANTICS to q93 (the
      // oracle is the same exact-overlap SQL) but the train shingle
      // stream dies against a broadcast Bloom of benchmark n-grams
      // BEFORE the exchange — only suspects reach the exact verify join.
      // Bloom false positives are rejected by that join, so the result
      // hash-matches the exact path bit for bit.
      """WITH w AS (
        |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, source, array_to_string(t[i : i+7], ' ') AS g
        |  FROM (SELECT doc_id, source, t, unnest(generate_series(1, len(t) - 7)) AS i
        |        FROM w WHERE len(t) >= 8)),
        |bsh AS (SELECT DISTINCT g FROM sh WHERE doc_id < 100),
        |flag AS (
        |  SELECT sh.doc_id, sh.source, count(*) AS n_hits
        |  FROM sh JOIN bsh USING (g) WHERE sh.doc_id >= 100
        |  GROUP BY sh.doc_id, sh.source)
        |SELECT source, count(*) AS n_contaminated,
        |  CAST(sum(n_hits) AS BIGINT) AS total_hits, min(doc_id) AS first_doc
        |FROM flag GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val bench = docs.filter(col("doc_id") < 100)
      val train = docs.filter(col("doc_id") >= 100)
      Curation.contaminatedDocsBloom(train, bench, "doc_id", "text", n = 8)
        .join(train.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_contaminated"), sum("n_hits").as("total_hits"),
          min("doc_id").as("first_doc"))
        .orderBy("source")
    },

    Q("q94_deterministic_shuffle",
      // reproducible training-order shuffle: every row's position in the
      // salted-hash order, realized by the two-phase distributed ranking
      // (no global single-task sort). Sampled every 50th position to keep
      // the gate row count small while pinning the ENTIRE order.
      s"""WITH r AS (
         |  SELECT doc_id, row_number() OVER (
         |    ORDER BY ${sqlHash60("'r3' || doc_id::VARCHAR")}, doc_id) - 1 AS pos
         |  FROM documents)
         |SELECT doc_id, CAST(pos AS BIGINT) AS shuffle_pos
         |FROM r WHERE pos % 50 = 0 ORDER BY shuffle_pos""".stripMargin) { (s, d) =>
      Curation.deterministicShuffle(
          t(s, d, "documents").select("doc_id"), "doc_id", salt = "r3")
        .filter(col("shuffle_pos") % 50 === 0)
        .select(col("doc_id"), col("shuffle_pos"))
        .orderBy("shuffle_pos")
    },

    Q("q98_mixture_resample",
      // data-mixture rebalance toward equal share per language: each
      // over-represented lang keeps a deterministic hash sample at
      // integer-basis-point rate min(1, (N/nLangs)/n_l) — the "mixing
      // weights" step of a training recipe, with an exact integer keep
      // boundary (no float rate ulp can flip membership). Input is never
      // shuffled: one tiny counts aggregate broadcast back as a filter.
      s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS N, count(*) AS g FROM c),
         |r AS (SELECT lang, least(10000, (t.N * 10000) // (t.g * c.n)) AS bps
         |      FROM c, t)
         |SELECT d.lang, count(*) AS n_kept, min(d.doc_id) AS first_id,
         |  CAST(sum(d.doc_id) AS BIGINT) AS id_sum
         |FROM documents d JOIN r USING (lang)
         |WHERE ${sqlHash60("d.doc_id::VARCHAR")} % 10000 < r.bps
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin) { (s, d) =>
      Curation.mixtureResample(t(s, d, "documents"), "lang", "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), min("doc_id").as("first_id"),
          sum("doc_id").as("id_sum"))
        .orderBy("lang")
    },

    Q("q149_mad_outliers",
      // Robust outlier screen: median/MAD with the 1.4826 consistency
      // constant — the estimator a telemetry pipeline needs when the
      // outliers themselves corrupt mean/σ (q74's z-score breaks down at
      // >~10% contamination; the MAD breaks down at 50%). Cross-engine
      // exact: Spark's `percentile` and DuckDB's `median` both sort and
      // average the middle pair (no summation-order noise), every later
      // step is identical elementary arithmetic, and the 3·1.4826·MAD
      // cut compares bit-identical doubles. Two tiny aggregates
      // broadcast back — the events table never shuffles.
      """WITH med AS (
        |  SELECT event_type, median(value) AS med FROM events GROUP BY 1),
        |dev AS (
        |  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS ad
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, median(ad) AS mad FROM dev GROUP BY 1)
        |SELECT d.event_type, count(d.value) AS n,
        |  round(min(d.med), 6) AS med, round(min(mad.mad), 6) AS mad,
        |  CAST(count(CASE WHEN d.ad > 3 * 1.4826 * mad.mad THEN 1 END)
        |    AS BIGINT) AS n_outliers
        |FROM dev d JOIN mad USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin) { (s, d) =>
      val e = t(s, d, "events").select(col("event_type"), col("value"))
      val med = e.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val dev = e.join(broadcast(med), "event_type")
        .withColumn("ad", abs(col("value") - col("med")))
      val mad = dev.groupBy("event_type")
        .agg(expr("percentile(ad, 0.5)").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(count(col("value")).as("n"),
          round(min("med"), 6).as("med"), round(min("mad"), 6).as("mad"),
          count(when(col("ad") > lit(3.0 * 1.4826) * col("mad"), 1)).cast("long")
            .as("n_outliers"))
        .orderBy("event_type")
    },

    Q("q148_temperature_mixture",
      // temperature-weighted mixture sampling (α = 0.5): target share
      // p_i ∝ √n_i — the multilingual training-mix standard that boosts
      // low-resource languages — realized as the largest no-upsampling
      // total with deterministic hash keeps. Exact cross-engine: sqrt is
      // IEEE-correctly-rounded (pow is not — that's why the gate pins
      // α = 0.5), weights fold in group-key order via the seeded-fold
      // recipe, and the keep boundary is integer basis points.
      s"""WITH c AS (SELECT lang, count(*) AS n FROM documents
         |  WHERE lang IS NOT NULL GROUP BY lang),
         |w AS (SELECT lang, n, sqrt(n::DOUBLE) AS w FROM c),
         |s AS (SELECT list(w ORDER BY lang) AS ws FROM w),
         |tot AS (SELECT list_reduce(ws, (a, x) -> a + x) AS sw FROM s),
         |p AS (SELECT lang, n, w / tot.sw AS p FROM w, tot),
         |tt AS (SELECT min(n / p) AS tcap FROM p),
         |r AS (SELECT lang,
         |  least(10000, CAST(floor(p * tt.tcap / n * 10000 + 0.5) AS BIGINT))
         |    AS bps
         |  FROM p, tt)
         |SELECT d.lang, count(*) AS n_kept, min(d.doc_id) AS first_id,
         |  CAST(sum(d.doc_id) AS BIGINT) AS id_sum
         |FROM documents d JOIN r USING (lang)
         |WHERE ${sqlHash60("d.doc_id::VARCHAR")} % 10000 < r.bps
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin) { (s, d) =>
      Curation.temperatureResample(t(s, d, "documents"), "lang", "doc_id",
          alpha = 0.5)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), min("doc_id").as("first_id"),
          sum("doc_id").as("id_sum"))
        .orderBy("lang")
    },

    Q("q154_training_recipe",
      // The END-TO-END curation recipe in one DataFrame chain — what a
      // user of this engine actually runs before training: exact dedup
      // (keep-min per content hash) → benchmark decontamination (drop
      // training docs sharing any word-8-gram with the doc_id<100
      // held-out slice) → temperature mixing (α=0.5 over lang, rates
      // computed on the POST-FILTER corpus) → deterministic shuffle
      // (salted-hash global order). Every stage is an already-proven
      // operator (q33/q93/q148/q94); this gate proves they COMPOSE —
      // per-lang doc counts, char totals, and min/max shuffle positions
      // pin the surviving set AND the final order.
      s"""WITH dd AS (
         |  SELECT * FROM documents
         |  WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))),
         |w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
         |  FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i : i+7], ' ') AS g
         |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
         |        FROM w WHERE len(t) >= 8)),
         |bsh AS (SELECT DISTINCT g FROM sh WHERE doc_id < 100),
         |bad AS (SELECT DISTINCT sh.doc_id FROM sh JOIN bsh USING (g)
         |  WHERE sh.doc_id >= 100),
         |clean AS (
         |  SELECT * FROM dd WHERE doc_id >= 100
         |    AND doc_id NOT IN (SELECT doc_id FROM bad)),
         |c AS (SELECT lang, count(*) AS n FROM clean
         |  WHERE lang IS NOT NULL GROUP BY lang),
         |wts AS (SELECT lang, n, sqrt(n::DOUBLE) AS w FROM c),
         |sl AS (SELECT list(w ORDER BY lang) AS ws FROM wts),
         |tot AS (SELECT list_reduce(ws, (a, x) -> a + x) AS sw FROM sl),
         |p AS (SELECT lang, n, w / tot.sw AS p FROM wts, tot),
         |tt AS (SELECT min(n / p) AS tcap FROM p),
         |r AS (SELECT lang,
         |  least(10000, CAST(floor(p * tt.tcap / n * 10000 + 0.5) AS BIGINT))
         |    AS bps
         |  FROM p, tt),
         |mixed AS (
         |  SELECT d.* FROM clean d JOIN r USING (lang)
         |  WHERE ${sqlHash60("d.doc_id::VARCHAR")} % 10000 < r.bps),
         |ranked AS (
         |  SELECT lang, n_chars, row_number() OVER (
         |    ORDER BY ${sqlHash60("'mix1' || doc_id::VARCHAR")}, doc_id) - 1
         |    AS pos
         |  FROM mixed)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  min(pos) AS min_pos, max(pos) AS max_pos
         |FROM ranked GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val dd = Dedup.exactDedup(docs, "doc_id", "text")
      val train = dd.filter(col("doc_id") >= 100)
      val bench = docs.filter(col("doc_id") < 100)
      val bad = Curation.contaminatedDocs(train, bench, "doc_id", "text", 8)
        .select("doc_id")
      val clean = train.join(bad, Seq("doc_id"), "left_anti")
      val mixed = Curation.temperatureResample(clean, "lang", "doc_id", 0.5)
      Curation.deterministicShuffle(mixed, "doc_id", salt = "mix1")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("total_chars"),
          min("shuffle_pos").as("min_pos"), max("shuffle_pos").as("max_pos"))
        .orderBy("lang")
    },

    Q("q99_embedding_outliers",
      // per-label centroid + the 3 vectors farthest from their own
      // label's centroid — the "find broken embeddings" QA pass of a
      // vector pipeline. Centroids are per-dimension averages ROUNDED to
      // 6dp before use (the rounding grid sits ~1e8 above the fp-reorder
      // noise floor, the q49 rule), and every fold (dot product, norms)
      // runs left-to-right from a first-element seed on both engines, so
      // the cosines match bit-for-bit; the top-3 cut ranks the ROUNDED
      // cosine with a vec_id tiebreak.
      """WITH px AS (
        |  SELECT label, vec_id, embedding,
        |    unnest(generate_series(1, len(embedding))) AS i
        |  FROM embeddings),
        |cent AS (
        |  SELECT label, i, round(avg(embedding[i]), 6) AS c
        |  FROM px GROUP BY label, i),
        |cv AS (SELECT label, list(c ORDER BY i) AS cvec FROM cent GROUP BY label),
        |scored AS (
        |  SELECT e.label, e.vec_id,
        |    round((SELECT list_reduce(l, (a, x) -> a + x) FROM (
        |       SELECT list_transform(generate_series(1, len(e.embedding)),
        |         k -> e.embedding[k] * cv.cvec[k]) AS l))
        |      / sqrt((SELECT list_reduce(l, (a, x) -> a + x) FROM (
        |       SELECT list_transform(generate_series(1, len(e.embedding)),
        |         k -> e.embedding[k] * e.embedding[k]) AS l))
        |      * (SELECT list_reduce(l, (a, x) -> a + x) FROM (
        |       SELECT list_transform(generate_series(1, len(cv.cvec)),
        |         k -> cv.cvec[k] * cv.cvec[k]) AS l))), 6) AS cos
        |  FROM embeddings e JOIN cv USING (label))
        |SELECT label, CAST(row_number() OVER (PARTITION BY label
        |    ORDER BY cos, vec_id) AS BIGINT) AS rank, vec_id, cos
        |FROM scored QUALIFY rank <= 3 ORDER BY label, rank""".stripMargin) { (s, d) =>
      val e = t(s, d, "embeddings")
      val cent = e
        .select(col("label"), posexplode(col("embedding")).as(Seq("__i", "__v")))
        .groupBy("label", "__i")
        .agg(round(avg(col("__v")), 6).as("__c"))
        .groupBy("label")
        .agg(expr("transform(array_sort(collect_list(struct(__i, __c))), x -> x.__c)")
          .as("cvec"))
      // left fold seeded with the FIRST element (DuckDB list_reduce
      // semantics) — identical operand order on both sides
      val dv = transform(col("embedding"), x => x.cast("double"))
      val dot = Q.seededFold(zip_with(dv, col("cvec"), (a, b) => a * b))
      val n2v = Q.seededFold(zip_with(dv, dv, (a, b) => a * b))
      val n2c = Q.seededFold(zip_with(col("cvec"), col("cvec"), (a, b) => a * b))
      val w = Window.partitionBy("label").orderBy(col("cos"), col("vec_id"))
      e.join(broadcast(cent), "label")
        .select(col("label"), col("vec_id"),
          round(dot / sqrt(n2v * n2c), 6).as("cos"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select("label", "rank", "vec_id", "cos")
        .orderBy("label", "rank")
    },

    Q("q146_label_confusion",
      // Label-noise audit (silhouette-lite): per vector, cosine to its OWN
      // label centroid vs the best OTHER centroid; a negative margin means
      // the vector sits closer to a different class — the cheap screen
      // that runs before any expensive relabeling. Scale shape: the
      // centroid table collapses to ONE broadcast row (nLabels×dim — tiny
      // by definition), per-vector work is a single projection over array
      // HOFs (no explode, no per-vector shuffle), and only the per-label
      // aggregate shuffles. Precision follows q99's bit-exact recipe:
      // centroids rounded to 6dp before use, left folds seeded with the
      // first element on both engines, cosines rounded before comparison.
      """WITH px AS (
        |  SELECT label, vec_id, embedding,
        |    unnest(generate_series(1, len(embedding))) AS i
        |  FROM embeddings),
        |cent AS (
        |  SELECT label, i, round(avg(embedding[i]), 6) AS c
        |  FROM px GROUP BY label, i),
        |cv AS (SELECT label AS clabel, list(c ORDER BY i) AS cvec
        |  FROM cent GROUP BY label),
        |scored AS (
        |  SELECT e.label, e.vec_id, cv.clabel,
        |    round((SELECT list_reduce(l, (a, x) -> a + x) FROM (
        |       SELECT list_transform(generate_series(1, len(e.embedding)),
        |         k -> e.embedding[k] * cv.cvec[k]) AS l))
        |      / sqrt((SELECT list_reduce(l, (a, x) -> a + x) FROM (
        |       SELECT list_transform(generate_series(1, len(e.embedding)),
        |         k -> e.embedding[k] * e.embedding[k]) AS l))
        |      * (SELECT list_reduce(l, (a, x) -> a + x) FROM (
        |       SELECT list_transform(generate_series(1, len(cv.cvec)),
        |         k -> cv.cvec[k] * cv.cvec[k]) AS l))), 6) AS cos
        |  FROM embeddings e CROSS JOIN cv),
        |agg AS (
        |  SELECT label, vec_id,
        |    max(CASE WHEN clabel = label THEN cos END) AS own,
        |    max(CASE WHEN clabel <> label THEN cos END) AS best_other
        |  FROM scored GROUP BY label, vec_id)
        |SELECT label, count(*) AS n_vecs,
        |  round(avg(own - best_other), 6) AS mean_margin,
        |  CAST(count(CASE WHEN own < best_other THEN 1 END) AS BIGINT)
        |    AS n_confused
        |FROM agg GROUP BY label ORDER BY label""".stripMargin) { (s, d) =>
      val e = t(s, d, "embeddings")
      val cents = e
        .select(col("label").as("clabel"),
          posexplode(col("embedding")).as(Seq("__i", "__v")))
        .groupBy("clabel", "__i")
        .agg(round(avg(col("__v")), 6).as("__c"))
        .groupBy("clabel")
        .agg(expr("transform(array_sort(collect_list(struct(__i, __c))), x -> x.__c)")
          .as("cvec"))
        .agg(collect_list(struct(col("clabel"), col("cvec"))).as("cents"))
      val dv = transform(col("embedding"), x => x.cast("double"))
      val n2v = Q.seededFold(zip_with(dv, dv, (a, b) => a * b))
      val cosArr = transform(col("cents"), c => struct(
        c.getField("clabel").as("clabel"),
        round(Q.seededFold(zip_with(dv, c.getField("cvec"), (a, b) => a * b)) /
          sqrt(n2v *
            Q.seededFold(zip_with(c.getField("cvec"), c.getField("cvec"), (a, b) => a * b))),
          6).as("cos")))
      val ownCos = element_at(transform(
        filter(col("__cos"), x => x.getField("clabel") === col("label")),
        x => x.getField("cos")), 1)
      val bestOther = array_max(transform(
        filter(col("__cos"), x => x.getField("clabel") =!= col("label")),
        x => x.getField("cos")))
      e.crossJoin(broadcast(cents))
        .withColumn("__cos", cosArr)
        .select(col("label"), col("vec_id"),
          ownCos.as("own"), bestOther.as("best_other"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          round(avg(col("own") - col("best_other")), 6).as("mean_margin"),
          count(when(col("own") < col("best_other"), 1)).cast("long")
            .as("n_confused"))
        .orderBy("label")
    },

    Q("q100_time_weighted_avg",
      // time-weighted average per user over irregular samples — the OPC-
      // historian statistic a plain avg() gets wrong when sampling density
      // correlates with the value. Each value holds until the next sample
      // (LOCF integral); durations are exact epoch-µs integers; the one
      // float sum's reorder noise sits ~1e8 below the 4dp rounding grid.
      """WITH w AS (
        |  SELECT user_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS tu,
        |    lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
        |      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS nu
        |  FROM events),
        |a AS (
        |  SELECT user_id, count(*) AS n_samples,
        |    sum(value * (nu - tu)) FILTER (nu IS NOT NULL) AS num,
        |    max(tu) - min(tu) AS den
        |  FROM w GROUP BY user_id)
        |SELECT user_id, n_samples, round(num / den, 4) AS twa
        |FROM a WHERE den > 0 ORDER BY user_id""".stripMargin) { (s, d) =>
      TimeSeries.timeWeightedAvg(t(s, d, "events"),
          "user_id", "ts", "event_id", "value", roundTo = 4)
        .orderBy("user_id")
    },

    Q("q101_heavy_hitters",
      // top-15 tokens through the SpaceSaving sketch pipeline (per-
      // partition bounded summaries → candidate semi-join → exact count
      // of candidates only) — shuffle is O(candidates), not O(distinct
      // items). With capacity far above this corpus's vocabulary the
      // candidate set provably covers the true top-k, so the result
      // equals the exact top-k the oracle computes. Integer counts,
      // (n desc, item) total order: deterministic cut.
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS item
        |  FROM documents)
        |SELECT item, count(*) AS n FROM toks GROUP BY item
        |ORDER BY n DESC, item LIMIT 15""".stripMargin) { (s, d) =>
      import graft.operators.HeavyHitters
      val toks = t(s, d, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("item"))
      HeavyHitters.topK(toks, "item", 15, capacity = 4096)
    }
  )
}
