package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q.t

/** Classic TPC-H query shapes (Q3 / Q5 / Q10 adapted to the test schema) —
  * the canonical multi-join analytical plans every warehouse engine is
  * judged on, here as macro-tests of join ordering, dimension broadcasting
  * and partial aggregation working together.
  *
  * All revenue math is DECIMAL end-to-end (exact, order-independent) with
  * one final cast to double, so top-k cuts on revenue are deterministic
  * across engines — a float sum would make the LIMIT boundary
  * summation-order dependent (the q49/q89 lesson).
  */
object TpchQueries {

  /** sum(extendedprice · (1 − discount)) as exact decimal, cast to double. */
  private def revenue = sum(
    col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
    .cast("double")

  private val revenueSql =
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"

  /** Synthetic `partsupp`: the testdata ships no partsupp table, which
    * blocked TPC-H Q2/Q9/Q11/Q16/Q20 (the five classic plan stressors
    * that join it). Derive it as a PURE function of the shipped keys —
    * 4 suppliers per part, TPC-H-dbgen-style rotation
    * `(p + p div S + i·(S div 4)) mod S` for i ∈ 0..3 (distinct for any
    * S ≥ 4 since 3·(S div 4) < S), with availqty/supplycost from md5
    * prefixes of "partkey|suppkey" — so the DuckDB oracle recomputes the
    * IDENTICAL table as a CTE ([[psCte]]). supplycost is integer-valued
    * (1..1000 as double) and availqty ≤ 9999, keeping every downstream
    * sum/min exact in IEEE double on both engines.
    *
    * 100 TB posture: one narrow projection of `part` × a 4-row broadcast
    * range — no shuffle, no driver data; the only scalar is the supplier
    * COUNT (bounded, same number the oracle derives via COUNT(*)).
    */
  private def partsupp(s: SparkSession, d: String): DataFrame = {
    val nSupp = t(s, d, "supplier").count()
    val key = concat(col("ps_partkey").cast("string"), lit("|"),
      col("ps_suppkey").cast("string"))
    t(s, d, "part").select(col("p_partkey"))
      // 4-way row explode as a PROJECTION (generate over a literal
      // sequence) — a crossJoin(range(4)) would plan a nested-loop node
      .select(col("p_partkey"), explode(sequence(lit(0L), lit(3L))).as("i"))
      .select(col("p_partkey").as("ps_partkey"),
        ((col("p_partkey") + (col("p_partkey") / nSupp).cast("long") +
          col("i") * (nSupp / 4)) % nSupp).as("ps_suppkey"))
      .withColumn("ps_availqty",
        (conv(substring(md5(key), 1, 10), 16, 10).cast("long") % 9999 + 1).cast("int"))
      .withColumn("ps_supplycost",
        (conv(substring(md5(key), 11, 10), 16, 10).cast("long") % 1000 + 1).cast("double"))
  }

  /** DuckDB twin of [[partsupp]] — prepended to each Q2/Q9/Q11/Q16/Q20
    * oracle so both engines compute from the same derived table.
    */
  private val psCte =
    """WITH __ns AS (SELECT count(*) AS n FROM supplier),
      |__ps0 AS (
      |  SELECT p_partkey AS ps_partkey,
      |         (p_partkey + p_partkey // n + i.i * (n // 4)) % n AS ps_suppkey
      |  FROM part, __ns, (SELECT UNNEST([0,1,2,3]) AS i) AS i),
      |partsupp AS (
      |  SELECT ps_partkey, ps_suppkey,
      |    CAST(('0x' || substr(md5(ps_partkey::VARCHAR || '|' || ps_suppkey::VARCHAR), 1, 10))::BIGINT % 9999 + 1 AS INT) AS ps_availqty,
      |    CAST(('0x' || substr(md5(ps_partkey::VARCHAR || '|' || ps_suppkey::VARCHAR), 11, 10))::BIGINT % 1000 + 1 AS DOUBLE) AS ps_supplycost
      |  FROM __ps0)
      |""".stripMargin

  val all: Seq[Q] = Seq(

    Q("q95_tpch_q3",
      // TPC-H Q3 (shipping priority): segment-filtered customers ⋈ orders
      // ⋈ lineitem, top-10 orders by exact-decimal revenue. customer is a
      // broadcast dim; the only shuffle join is lineitem ⋈ orders.
      s"""SELECT l_orderkey, $revenueSql AS revenue,
         |  CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         |  AND l_orderkey = o_orderkey
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revenue.as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    Q("q96_tpch_q5",
      // TPC-H Q5 (local supplier volume): six-table join, revenue per
      // nation where customer and supplier share the nation. region,
      // nation, supplier, customer all broadcast; lineitem ⋈ orders is
      // the single big shuffle.
      s"""SELECT n_name, $revenueSql AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      val asiaNations = t(s, d, "nation")
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val supp = t(s, d, "supplier")
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
      val cust = t(s, d, "customer").select("c_custkey", "c_nationkey")
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      t(s, d, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(revenue.as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    Q("q97_tpch_q10",
      // TPC-H Q10 (returned-item reporting): revenue lost to returns per
      // customer in a quarter, top 20. nation broadcast onto the
      // customer-side aggregate.
      s"""SELECT c_custkey, c_name, $revenueSql AS revenue, n_name
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-04-01'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val custNation = t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name")
      t(s, d, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(custNation), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(revenue.as("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    Q("q128_tpch_q7",
      // TPC-H Q7 (volume shipping): bilateral trade between two nations
      // by ship year. Catalyst cannot derive per-side IN-filters from the
      // two-attribute symmetric OR, so the nation-name filter is pushed
      // into BOTH broadcast sides by hand (VERDICT r6 item 3): n1/n2 are
      // pre-filtered to the two names, which shrinks the supplier
      // broadcast ~12× and kills ~92% of lineitem rows at the first join,
      // BEFORE the orders and customer shuffles. The symmetric
      // disjunction remains as the residual filter (it only has to
      // exclude the two same-nation combinations that survive the
      // per-side filters).
      s"""SELECT supp_nation, cust_nation, l_year, $revenueSql AS revenue
         |FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |    year(l_shipdate) AS l_year, l_extendedprice, l_discount
         |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
         |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
         |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
         |    AND c_nationkey = n2.n_nationkey
         |    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')))
         |GROUP BY supp_nation, cust_nation, l_year
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, d) =>
      val names = Seq("NATION_3", "NATION_7")
      val n1 = t(s, d, "nation").filter(col("n_name").isin(names: _*))
        .select(col("n_nationkey").as("__nk1"), col("n_name").as("supp_nation"))
      val n2 = t(s, d, "nation").filter(col("n_name").isin(names: _*))
        .select(col("n_nationkey").as("__nk2"), col("n_name").as("cust_nation"))
      // supplier and customer each shrink to the two nations' fraction
      // before touching the big tables; the filtered supplier side stays
      // broadcast (it only got smaller than the unfiltered broadcast the
      // spec's join order implies)
      val supp = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
        .join(broadcast(n1), col("s_nationkey") === col("__nk1"))
        .select(col("s_suppkey"), col("supp_nation"))
      val cust = t(s, d, "customer").select("c_custkey", "c_nationkey")
        .join(broadcast(n2), col("c_nationkey") === col("__nk2"))
        .select(col("c_custkey"), col("cust_nation"))
      t(s, d, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          col("l_extendedprice"), col("l_discount"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
          (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(revenue.as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    Q("q129_tpch_q8",
      // TPC-H Q8 (national market share): NATION_5's share of ASIA-region
      // STANDARD-part import volume by order year. The share is a ratio
      // of two exact-decimal sums (one CASE-masked), divided once in
      // double and 6dp-rounded — deterministic across engines where a
      // float-summed numerator would wobble the quotient.
      """SELECT o_year,
        |  round(CAST(sum(CASE WHEN nation = 'NATION_5'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6)
        |    AS mkt_share
        |FROM (
        |  SELECT year(o_orderdate) AS o_year, l_extendedprice, l_discount,
        |    n2.n_name AS nation
        |  FROM part, supplier, lineitem, orders, customer,
        |    nation n1, nation n2, region
        |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        |    AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        |    AND p_type = 'STANDARD')
        |GROUP BY o_year ORDER BY o_year""".stripMargin) { (s, d) =>
      val dec = (c: String) => col(c).cast("decimal(18,2)")
      val vol = dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))
      val asiaNations = t(s, d, "nation")
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("__cnk"))
      val suppNation = t(s, d, "nation")
        .select(col("n_nationkey").as("__snk"), col("n_name").as("nation"))
      t(s, d, "lineitem")
        .select("l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount")
        .join(broadcast(t(s, d, "part").filter(col("p_type") === "STANDARD")
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .join(t(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(asiaNations), col("c_nationkey") === col("__cnk"))
        .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(suppNation), col("s_nationkey") === col("__snk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(
          sum(when(col("nation") === "NATION_5", vol)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
            sum(vol).cast("double"), 6).as("mkt_share"))
        .orderBy("o_year")
    },

    Q("q131_tpch_q18",
      // TPC-H Q18 (large-volume customers): orders whose total quantity
      // crosses a HAVING threshold, re-joined to their lines for the
      // per-order report. The grouped subquery's survivors (~1-2% of
      // orders) are BROADCAST into a semi-join against lineitem, so the
      // big table is filtered before the orders/customer joins — the
      // HAVING result is small by construction (that is the query's
      // point), making the broadcast safe at any SF. l_quantity is
      // integer-valued, so double sums are exact on both engines.
      """SELECT c_name, c_custkey, o_orderkey,
        |  CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
        |  o_totalprice, sum(l_quantity) AS total_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (
        |    SELECT l_orderkey FROM lineitem
        |    GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin) { (s, d) =>
      val big = t(s, d, "lineitem").groupBy("l_orderkey")
        .agg(sum("l_quantity").as("__qty"))
        .filter(col("__qty") > 250)
        .select(col("l_orderkey").as("__bigkey"))
      t(s, d, "lineitem").select("l_orderkey", "l_quantity")
        .join(broadcast(big), col("l_orderkey") === col("__bigkey"), "left_semi")
        .join(t(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer").select("c_custkey", "c_name"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(sum("l_quantity").as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
        .limit(100)
    },

    Q("q132_tpch_q21",
      // TPC-H Q21 (suppliers who kept orders waiting), adapted to the
      // test schema: "late" is l_returnflag = 'R' (no commit/receipt
      // dates here). The oracle keeps the spec's EXISTS / NOT EXISTS
      // self-joins; the Spark plan collapses both correlated subqueries
      // into per-order window aggregates over ONE lineitem scan —
      //   EXISTS(other supplier on the order)      ⇔ #distinct suppliers > 1
      //   NOT EXISTS(other supplier late)          ⇔ #distinct late suppliers = 1
      // (the current row is late, so it IS the one) — one shuffle of
      // lineitem by l_orderkey instead of three self-join scans, and the
      // subsequent orders semi-join reuses that partitioning. Supplier
      // and nation stay broadcast dims.
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (
        |    SELECT * FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT * FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
        |  AND s_nationkey = n_nationkey
        |  AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_orderkey")
      val supp = t(s, d, "supplier").select("s_suppkey", "s_nationkey", "s_name")
        .join(broadcast(t(s, d, "nation")
          .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
          .select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")
      val waiting = t(s, d, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_returnflag")
        .withColumn("__nsupp", size(collect_set(col("l_suppkey")).over(w)))
        .withColumn("__nlate", size(collect_set(
          when(col("l_returnflag") === "R", col("l_suppkey"))).over(w)))
        .filter(col("l_returnflag") === "R" &&
          col("__nsupp") > 1 && col("__nlate") === 1)
      waiting
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "F")
          .select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },

    Q("q135_tpch_q4",
      // TPC-H Q4 (order-priority checking), "late" adapted to
      // l_returnflag = 'R' as in q132: EXISTS over lineitem becomes a
      // left-semi hash join; the date filter prunes orders at the scan.
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND EXISTS (
        |    SELECT * FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
        .select("o_orderkey", "o_orderpriority")
        .join(t(s, d, "lineitem").filter(col("l_returnflag") === "R")
          .select("l_orderkey"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    Q("q136_tpch_q12",
      // TPC-H Q12 (shipping-mode priority pivot), l_linestatus standing in
      // for the schema's missing l_shipmode: the classic dual
      // CASE-mask aggregation — both counts in ONE pass over the join,
      // no union of two filtered scans.
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders, lineitem
        |WHERE o_orderkey = l_orderkey AND l_returnflag = 'A'
        |  AND l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { (s, d) =>
      val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, d, "lineitem")
        .filter(col("l_returnflag") === "A" &&
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linestatus")
        .join(t(s, d, "orders").select("o_orderkey", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
          sum(when(urgent, 1L).otherwise(0L)).cast("long").as("high_line_count"),
          sum(when(!urgent, 1L).otherwise(0L)).cast("long").as("low_line_count"))
        .orderBy("l_linestatus")
    },

    Q("q137_tpch_q13",
      // TPC-H Q13 (customer order-count distribution): LEFT join with the
      // extra non-key predicate INSIDE the join condition (customers with
      // only '5-LOW' orders must count 0, not disappear), then the
      // count-of-counts histogram — two aggregations, the first keyed on
      // the customer (map-side combinable), the second tiny.
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
      t(s, d, "customer").select("c_custkey")
        .join(t(s, d, "orders").filter(col("o_orderpriority") =!= "5-LOW")
          .select("o_custkey", "o_orderkey"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    Q("q138_tpch_q14",
      // TPC-H Q14 (promotion effect): a ratio of two CASE-masked
      // exact-decimal sums over one month of lineitem ⋈ broadcast(part) —
      // single row, single pass, no second scan for the denominator.
      s"""SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
         |    THEN CAST(l_extendedprice AS DECIMAL(18,2))
         |      * (1 - CAST(l_discount AS DECIMAL(18,2)))
         |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
         |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6)
         |  AS promo_revenue
         |FROM lineitem, part
         |WHERE l_partkey = p_partkey
         |  AND l_shipdate >= TIMESTAMP '1997-09-01'
         |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin) { (s, d) =>
      val dec = (c: String) => col(c).cast("decimal(18,2)")
      val vol = dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        .select("l_partkey", "l_extendedprice", "l_discount")
        .join(broadcast(t(s, d, "part").select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(round(
          lit(100.0) *
            sum(when(col("p_type") === "PROMO", vol)
              .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
            sum(vol).cast("double"), 6).as("promo_revenue"))
    },

    Q("q139_tpch_q17",
      // TPC-H Q17 (small-quantity-order revenue): the correlated
      // per-part average subquery decorrelated into a per-part WINDOW
      // aggregate over the same broadcast-filtered join — lineitem is
      // scanned ONCE and shuffled once (by part key, high cardinality,
      // small groups), instead of a second scan + aggregate + join-back.
      // The subquery's correlation target (p_partkey) is exactly the
      // window partition key, so semantics are identical.
      """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    AS DOUBLE) / 7.0, 2) AS avg_yearly
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND p_type = 'ECONOMY'
        |  AND l_quantity < (
        |    SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        |    WHERE l2.l_partkey = p_partkey)""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val econParts = broadcast(
        t(s, d, "part").filter(col("p_type") === "ECONOMY").select("p_partkey"))
      t(s, d, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(econParts, col("l_partkey") === col("p_partkey"))
        .withColumn("__cap",
          avg("l_quantity").over(Window.partitionBy("l_partkey")) * 0.2)
        .filter(col("l_quantity") < col("__cap"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double") / 7.0, 2).as("avg_yearly"))
    },

    Q("q140_tpch_q22",
      // TPC-H Q22 (global sales opportunity): above-average-balance
      // customers with no urgent orders — a one-row scalar subquery
      // (broadcast, evaluated once) + an anti hash join, then a per-
      // segment rollup. 2dp rounding sits far above double summation
      // noise at this magnitude.
      """SELECT c_mktsegment,
        |  count(*) AS numcust,
        |  round(sum(c_acctbal), 2) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (
        |    SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (
        |    SELECT * FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      val cust = t(s, d, "customer")
      val thresh = cust.filter(col("c_acctbal") > 0.0)
        .agg(avg("c_acctbal").as("__avg"))
      cust.select("c_custkey", "c_mktsegment", "c_acctbal")
        .join(broadcast(thresh))
        .filter(col("c_acctbal") > col("__avg"))
        .join(t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
          .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("numcust"),
          round(sum("c_acctbal"), 2).as("totacctbal"))
        .orderBy("c_mktsegment")
    },

    Q("q141_tpch_q6",
      // TPC-H Q6 (forecasting revenue change): the pure scan-filter-agg
      // plan — every predicate reaches the parquet scan, aggregation is
      // one exact-decimal sum with map-side partials. The simplest TPC-H
      // query and the purest pushdown test.
      """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.02, 0.04) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)") *
          col("l_discount").cast("decimal(18,2)")).cast("double"), 2).as("revenue"))
    },

    Q("q142_tpch_q15",
      // TPC-H Q15 (top supplier): the revenue "view" computed once, its
      // max as a one-row broadcast scalar, equality over EXACT decimal
      // sums (a float-summed revenue would make the max tie-break
      // engine-dependent). Spark reuses the aggregated view for both the
      // max and the final filter.
      """WITH rev AS (
        |  SELECT l_suppkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |  round(CAST(total AS DOUBLE), 2) AS total_revenue
        |FROM supplier, rev
        |WHERE s_suppkey = l_suppkey AND total = (SELECT max(total) FROM rev)
        |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val dec = (c: String) => col(c).cast("decimal(18,2)")
      val rev = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(18,2)") - dec("l_discount"))).as("total"))
      val top = rev.agg(max("total").as("__max"))
      rev.join(broadcast(top)).filter(col("total") === col("__max"))
        .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          round(col("total").cast("double"), 2).as("total_revenue"))
        .orderBy("s_suppkey")
    },

    Q("q143_tpch_q19",
      // TPC-H Q19 (discounted revenue, adapted to the schema's columns:
      // brand/size/quantity bands instead of container/shipmode): the
      // classic OR-of-ANDs composite predicate. The part join stays a
      // broadcast hash join on p_partkey with the disjunction as a
      // residual — the OR must NOT degrade the join to a nested loop.
      s"""SELECT round($revenueSql, 2) AS revenue
         |FROM lineitem, part
         |WHERE p_partkey = l_partkey AND (
         |  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
         |    AND l_quantity BETWEEN 1 AND 11)
         |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
         |    AND l_quantity BETWEEN 10 AND 20)
         |  OR (p_brand = 'Brand#9' AND p_size BETWEEN 1 AND 30
         |    AND l_quantity BETWEEN 20 AND 30))""".stripMargin) { (s, d) =>
      val bands =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 20) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#9" && col("p_size").between(1, 30) &&
          col("l_quantity").between(20, 30))
      t(s, d, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(broadcast(t(s, d, "part").select("p_partkey", "p_brand", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .filter(bands)
        .agg(round(revenue, 2).as("revenue"))
    },

    Q("q157_tpch_q2",
      // TPC-H Q2 (minimum-cost supplier): the classic correlated-min
      // subquery against the same table. Adapted output (the schema has
      // no p_mfgr / s_address / s_phone / s_comment): p_type stands in
      // for mfgr. Spark plan: the correlated min decorrelates to a
      // per-part min over the SAME part-filtered EUROPE partsupp view,
      // broadcast back (VERDICT r8 audit: broadcast the min side) — both
      // sides prune to the selective part filter FIRST, so at 100 TB the
      // min table is O(filtered parts), never O(partsupp).
      psCte +
        """SELECT s_acctbal, s_name, n_name, p_partkey, p_type
          |FROM part, supplier, partsupp, nation, region
          |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
          |  AND p_size = 15 AND p_type = 'PROMO'
          |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          |  AND r_name = 'EUROPE'
          |  AND ps_supplycost = (
          |    SELECT min(ps_supplycost)
          |    FROM partsupp ps2, supplier s2, nation n2, region r2
          |    WHERE part.p_partkey = ps2.ps_partkey AND s2.s_suppkey = ps2.ps_suppkey
          |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
          |      AND r2.r_name = 'EUROPE')
          |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin) { (s, d) =>
      val eurSupp = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")
          .join(broadcast(t(s, d, "region").filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val parts = t(s, d, "part")
        .filter(col("p_size") === 15 && col("p_type") === "PROMO")
        .select("p_partkey", "p_type")
      // one shared view: filtered parts ⋈ partsupp ⋈ EUROPE suppliers —
      // the final answer and the per-part min both derive from it
      val eurPs = partsupp(s, d)
        .join(broadcast(parts), col("ps_partkey") === col("p_partkey"))
        .join(broadcast(eurSupp), col("ps_suppkey") === col("s_suppkey"))
      val minCost = eurPs.groupBy(col("ps_partkey").as("mc_partkey"))
        .agg(min("ps_supplycost").as("mc_min"))
      eurPs.join(broadcast(minCost),
          col("ps_partkey") === col("mc_partkey") &&
            col("ps_supplycost") === col("mc_min"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },

    Q("q158_tpch_q9",
      // TPC-H Q9 (product-type profit): 6-table join, profit =
      // revenue − supply cost, grouped by supplier nation × order year.
      // ONE lineitem scan; every other input is broadcast — partsupp
      // pruned to the selective p_name filter first, so its broadcast
      // side is O(filtered parts), and supplier⋈nation is a dim.
      // lineitem ⋈ orders is the single big shuffle. All money math in
      // DECIMAL (supplycost is integer-valued), one final double cast.
      psCte +
        """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
          |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
          |      * (1 - CAST(l_discount AS DECIMAL(18,2)))
          |      - CAST(ps_supplycost AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)))
          |    AS DOUBLE), 2) AS sum_profit
          |FROM lineitem, orders, part, supplier, nation, partsupp
          |WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
          |  AND l_suppkey = s_suppkey AND ps_partkey = l_partkey
          |  AND ps_suppkey = l_suppkey AND s_nationkey = n_nationkey
          |  AND p_name LIKE '%red%'
          |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin) { (s, d) =>
      val dec = (c: String) => col(c).cast("decimal(18,2)")
      val redParts = t(s, d, "part").filter(col("p_name").like("%red%"))
        .select("p_partkey")
      val suppNation = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "n_name")
      val ps = partsupp(s, d)
        .join(broadcast(redParts), col("ps_partkey") === col("p_partkey"))
        .select("ps_partkey", "ps_suppkey", "ps_supplycost")
      t(s, d, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice", "l_discount")
        .join(broadcast(ps),
          col("l_partkey") === col("ps_partkey") &&
            col("l_suppkey") === col("ps_suppkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("nation", col("n_name"))
        .withColumn("o_year", year(col("o_orderdate")).cast("long"))
        .groupBy("nation", "o_year")
        .agg(round(sum(dec("l_extendedprice") *
            (lit(1).cast("decimal(18,2)") - dec("l_discount")) -
            dec("ps_supplycost") * dec("l_quantity")).cast("double"), 2)
          .as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    Q("q159_tpch_q11",
      // TPC-H Q11 (important stock): per-part value HAVING against a
      // global scalar. The TPC-H fraction is SF-dependent (0.0001/SF);
      // here the threshold self-normalizes to 1.5× the MEAN per-part
      // value, so the query keeps selecting a real subset at every SF.
      // All values are exact-integer doubles (cost ≤ 1000 × qty ≤ 9999),
      // so sums are order-independent and the double division is the
      // same IEEE operation on both engines. Spark: the scalar is a
      // one-row broadcast (no driver collect).
      psCte +
        """, g AS (
          |  SELECT ps_partkey, ps_supplycost * ps_availqty AS v
          |  FROM partsupp, supplier, nation
          |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
          |    AND n_name = 'NATION_7')
          |SELECT ps_partkey, sum(v) AS value FROM g GROUP BY ps_partkey
          |HAVING sum(v) > 1.5 * (SELECT sum(v) / count(DISTINCT ps_partkey) FROM g)
          |ORDER BY value DESC, ps_partkey""".stripMargin) { (s, d) =>
      val g = partsupp(s, d)
        .join(broadcast(t(s, d, "supplier")
          .join(broadcast(t(s, d, "nation").filter(col("n_name") === "NATION_7")),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey")),
          col("ps_suppkey") === col("s_suppkey"))
        .select(col("ps_partkey"), (col("ps_supplycost") * col("ps_availqty")).as("v"))
      val perPart = g.groupBy("ps_partkey").agg(sum("v").as("value"))
      val thresh = g.agg((lit(1.5) * (sum("v") / countDistinct("ps_partkey"))).as("__thr"))
      perPart.join(broadcast(thresh))
        .filter(col("value") > col("__thr"))
        .select("ps_partkey", "value")
        .orderBy(col("value").desc, col("ps_partkey"))
    },

    Q("q160_tpch_q16",
      // TPC-H Q16 (parts/supplier relationship): NOT IN + per-group
      // count-distinct. Adapted: "complaint" suppliers = negative
      // account balance (the schema has no s_comment). The NOT IN is an
      // exact anti join (s_suppkey is never NULL); both dims broadcast.
      psCte +
        """SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
          |FROM partsupp, part
          |WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#13'
          |  AND p_type <> 'PROMO' AND p_size IN (1, 4, 9, 14, 23, 36, 45, 50)
          |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
          |GROUP BY p_brand, p_type, p_size
          |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (s, d) =>
      val parts = t(s, d, "part")
        .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 50))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val complaint = t(s, d, "supplier").filter(col("s_acctbal") < 0)
        .select("s_suppkey")
      partsupp(s, d)
        .join(broadcast(parts), col("ps_partkey") === col("p_partkey"))
        .join(broadcast(complaint), col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("ps_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },

    Q("q161_tpch_q20",
      // TPC-H Q20 (potential part promotion): the nested semi chain —
      // suppliers holding excess stock (availqty > half a year's sales)
      // of 'small%' parts, in one nation. The correlated scalar sum
      // decorrelates to a keyed aggregate + INNER join (reproducing the
      // strict NULL semantics: a pair with no sales compares NULL > x →
      // excluded); the chain ends in two semi joins. lineitem is scanned
      // once, pre-aggregated on (partkey, suppkey) before joining.
      psCte +
        """SELECT s_name, s_acctbal FROM supplier, nation
          |WHERE s_nationkey = n_nationkey AND n_name = 'NATION_3'
          |  AND s_suppkey IN (
          |    SELECT ps_suppkey FROM partsupp
          |    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          |      AND ps_availqty > 0.5 * (
          |        SELECT sum(l_quantity) FROM lineitem
          |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          |          AND l_shipdate >= TIMESTAMP '1996-01-01'
          |          AND l_shipdate < TIMESTAMP '1997-01-01'))
          |ORDER BY s_name""".stripMargin) { (s, d) =>
      val smallParts = t(s, d, "part").filter(col("p_name").like("small%"))
        .select("p_partkey")
      val qty = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum("l_quantity").as("__qty"))
      val excess = partsupp(s, d)
        .join(broadcast(smallParts), col("ps_partkey") === col("p_partkey"), "left_semi")
        .join(qty,
          col("ps_partkey") === col("l_partkey") &&
            col("ps_suppkey") === col("l_suppkey"))
        .filter(col("ps_availqty") > lit(0.5) * col("__qty"))
        .select("ps_suppkey")
      t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation").filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .join(excess, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    }
  )
}
