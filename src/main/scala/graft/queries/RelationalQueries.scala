package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.config.OpcConfigParser
import graft.functions.Normalize
import graft.model.RawReading
import graft.operators.{AsOfJoin, LastValue}
import Q.t

/** The relational query inventory over the driver test tables — SURVEY.md
  * §2.2–§2.9. Each query is declarative DataFrame code (Catalyst handles
  * pushdown/pruning/join selection); every floating aggregate is rounded
  * identically on both the Spark and oracle side so hash comparison is
  * stable across summation orders.
  */
object RelationalQueries {

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------- aggs
    Q("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
        |round(sum(l_extendedprice),2) AS sum_base_price,
        |round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        |round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        |round(avg(l_quantity),4) AS avg_qty, round(avg(l_extendedprice),4) AS avg_price,
        |round(avg(l_discount),6) AS avg_disc, count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin) {
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum("l_quantity"), 2).as("sum_qty"),
            round(sum("l_extendedprice"), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1d) - col("l_discount"))), 2).as("sum_disc_price"),
            round(sum(col("l_extendedprice") * (lit(1d) - col("l_discount")) * (lit(1d) + col("l_tax"))), 2).as("sum_charge"),
            round(avg("l_quantity"), 4).as("avg_qty"),
            round(avg("l_extendedprice"), 4).as("avg_price"),
            round(avg("l_discount"), 6).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
    },

    Q("q02_filter_project",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
        |AND l_discount BETWEEN 0.02 AND 0.09 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate").between(
          lit("1996-01-01 00:00:00").cast("timestamp"),
          lit("1996-12-31 00:00:00").cast("timestamp"))
          && col("l_discount").between(0.02, 0.09) && col("l_quantity") < 24)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // --------------------------------------------------------------- joins
    Q("q03_join_agg",
      """SELECT o_orderpriority, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        |count(DISTINCT o_orderkey) AS n_orders, count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderstatus") === "F")
        .groupBy("o_orderpriority")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1d) - col("l_discount"))), 2).as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_lines"))
        .orderBy("o_orderpriority")
    },

    Q("q04_star_broadcast",
      """SELECT r_name, n_name, round(sum(o_totalprice),2) AS revenue, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
      // dims are small at any SF — broadcast them so the fact table never shuffles
      t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy("r_name", "n_name")
    },

    Q("q05_left_join",
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
        |round(coalesce(sum(o_totalprice),0),2) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey", "c_name")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum("o_totalprice"), lit(0d)), 2).as("total_spent"))
        .orderBy("c_custkey")
    },

    Q("q06_semi_join",
      """SELECT c_mktsegment, count(*) AS n_customers, round(sum(c_acctbal),2) AS sum_bal
        |FROM customer WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      val big = t(s, d, "orders").filter(col("o_totalprice") > 200000).select("o_custkey")
      t(s, d, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"), round(sum("c_acctbal"), 2).as("sum_bal"))
        .orderBy("c_mktsegment")
    },

    Q("q07_anti_join",
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },

    Q("q08_full_outer",
      """SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
        |coalesce(n_customers, 0) AS n_customers, coalesce(n_suppliers, 0) AS n_suppliers
        |FROM (SELECT c_nationkey, count(*) AS n_customers FROM customer GROUP BY c_nationkey) c
        |FULL OUTER JOIN (SELECT s_nationkey, count(*) AS n_suppliers FROM supplier GROUP BY s_nationkey) s
        |ON c.c_nationkey = s.s_nationkey ORDER BY nationkey""".stripMargin) { (s, d) =>
      val cn = t(s, d, "customer").groupBy("c_nationkey").agg(count(lit(1)).as("n_customers"))
      val sn = t(s, d, "supplier").groupBy("s_nationkey").agg(count(lit(1)).as("n_suppliers"))
      cn.join(sn, cn("c_nationkey") === sn("s_nationkey"), "full_outer")
        .select(
          coalesce(cn("c_nationkey"), sn("s_nationkey")).as("nationkey"),
          coalesce(col("n_customers"), lit(0L)).as("n_customers"),
          coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
        .orderBy("nationkey")
    },

    Q("q28_theta_join",
      """SELECT c_nationkey, count(*) AS n_pairs, round(sum(c_acctbal - s_acctbal),2) AS sum_gap
        |FROM customer JOIN supplier ON c_nationkey = s_nationkey AND c_acctbal > s_acctbal
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "supplier"),
          col("c_nationkey") === col("s_nationkey") && col("c_acctbal") > col("s_acctbal"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_pairs"),
          round(sum(col("c_acctbal") - col("s_acctbal")), 2).as("sum_gap"))
        .orderBy("c_nationkey")
    },

    // ------------------------------------------------------------- windows
    Q("q09_topk_per_group",
      """SELECT o_custkey, CAST(row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn, o_orderkey, o_totalprice
        |FROM orders QUALIFY rn <= 3 ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    },

    Q("q10_window_lag",
      """SELECT o_custkey, o_orderkey, date_diff('day',
        |  lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  o_orderdate) AS days_since_prev
        |FROM orders QUALIFY days_since_prev IS NOT NULL
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .filter(col("prev_date").isNotNull)
        .select(col("o_custkey"), col("o_orderkey"),
          datediff(col("o_orderdate"), col("prev_date")).cast("long").as("days_since_prev"))
        .orderBy("o_custkey", "o_orderkey")
    },

    Q("q11_running_sum",
      // (l_orderkey, l_linenumber) is not unique in the test data, so the
      // window order includes every projected column: rows that still tie
      // are fully identical and contribute interchangeably.
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |round(sum(l_quantity) OVER (PARTITION BY l_orderkey
        |  ORDER BY l_linenumber, l_quantity, l_extendedprice
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_qty
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, running_qty""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          round(sum("l_quantity").over(w), 2).as("running_qty"))
        .orderBy("l_orderkey", "l_linenumber", "running_qty")
    },

    // -------------------------------------------------------- sorts / topk
    Q("q59_right_join",
      // RIGHT OUTER: orders ⟖ customer — every customer survives, orderless
      // customers with null order columns (completes the §2.3 inner/left/
      // right/full matrix; planner-wise Spark flips it to a left join)
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"), "right_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    },

    Q("q60_map_functions",
      // map construction + lookup (§2.8 map_* surface): per-priority order
      // counts pivoted into a map, then element_at lookups. The map is
      // engine-internal; outputs are plain scalars so the oracle can
      // compute them without map types.
      """SELECT o_custkey,
        |  sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)::BIGINT AS n_urgent,
        |  sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END)::BIGINT AS n_low
        |FROM orders GROUP BY o_custkey
        |HAVING sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) > 0
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .groupBy("o_custkey", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .groupBy("o_custkey")
        .agg(map_from_entries(collect_list(struct(col("o_orderpriority"), col("n"))))
          .as("by_priority"))
        .select(col("o_custkey"),
          coalesce(element_at(col("by_priority"), "1-URGENT"), lit(0L)).as("n_urgent"),
          coalesce(element_at(col("by_priority"), "5-LOW"), lit(0L)).as("n_low"))
        .filter(col("n_urgent") > 0)
        .orderBy("o_custkey")
    },

    Q("q12_global_topk",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      // Catalyst plans orderBy+limit as TakeOrderedAndProject — no full sort
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    },

    Q("q13_multi_sort",
      """SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber FROM lineitem
        |ORDER BY l_returnflag, l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .orderBy(col("l_returnflag").asc, col("l_extendedprice").desc,
          col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(100)
        .select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
    },

    // ------------------------------------------------------------- set ops
    Q("q14_union_all",
      """SELECT role, nationkey, count(*) AS n FROM (
        |  SELECT 'customer' AS role, c_nationkey AS nationkey FROM customer
        |  UNION ALL SELECT 'supplier' AS role, s_nationkey AS nationkey FROM supplier)
        |GROUP BY role, nationkey ORDER BY role, nationkey""".stripMargin) { (s, d) =>
      val cc = t(s, d, "customer").select(lit("customer").as("role"), col("c_nationkey").as("nationkey"))
      val ss = t(s, d, "supplier").select(lit("supplier").as("role"), col("s_nationkey").as("nationkey"))
      cc.unionByName(ss).groupBy("role", "nationkey")
        .agg(count(lit(1)).as("n")).orderBy("role", "nationkey")
    },

    Q("q15_intersect",
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin) { (s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    },

    Q("q16_except",
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin) { (s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .except(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    },

    Q("q56_multiset_ops",
      // INTERSECT ALL / EXCEPT ALL — multiset semantics preserve duplicate
      // counts (q15/q16 cover the set variants). Suppliers' nation keys
      // appear many times each, so the ALL variants differ materially from
      // the set ones.
      """SELECT 'except_all' AS op, nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  EXCEPT ALL SELECT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT 'intersect_all' AS op, nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  INTERSECT ALL SELECT s_nationkey FROM supplier)
        |ORDER BY op, nationkey""".stripMargin) { (s, d) =>
      val cust = t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      val supp = t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))
      cust.exceptAll(supp).select(lit("except_all").as("op"), col("nationkey"))
        .unionByName(
          cust.intersectAll(supp).select(lit("intersect_all").as("op"), col("nationkey")))
        .orderBy("op", "nationkey")
    },

    Q("q17_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      t(s, d, "lineitem").select("l_returnflag", "l_linestatus")
        .distinct().orderBy("l_returnflag", "l_linestatus")
    },

    // ------------------------------------------------- grouping sets et al.
    Q("q18_rollup",
      """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    Q("q19_cube",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |round(sum(o_totalprice),2) AS revenue
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },

    Q("q20_count_distinct",
      """SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations, count(*) AS n_customers
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      t(s, d, "customer").groupBy("c_mktsegment")
        .agg(countDistinct(col("c_nationkey")).as("n_nations"), count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    },

    Q.noOracle("q26_approx_distinct") { (s, d) =>
      // HLL++ sketch — numerically approximate by design, so no hash oracle;
      // the exact-count cross-check lives in the ScalaTest suite.
      t(s, d, "lineitem").agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"))
    },

    Q("q26b_approx_distinct_envelope",
      // q26's ENVELOPE replay twin (VERDICT r16 task #7): hash equality
      // on an HLL++ estimate is impossible by nature, but the published
      // error contract is replayable — the estimate must land within
      // 3×rsd (default rsd 0.05 → 15%) of the exact distinct count. The
      // Spark side computes BOTH and exports the bounded comparison as
      // a boolean; the oracle recomputes the exact side and asserts the
      // booleans true — so a Spark HLL regression past its envelope is
      // a hash MISMATCH, not an unexamined "approx" pass. Estimates are
      // deterministic given the value set, so the boolean is stable.
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey)::BIGINT AS exact_parts,
        |  count(DISTINCT l_orderkey)::BIGINT AS exact_orders,
        |  true AS parts_in_envelope, true AS orders_in_envelope
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_orderkey")).as("exact_orders"),
          approx_count_distinct(col("l_partkey")).as("__ap"),
          approx_count_distinct(col("l_orderkey")).as("__ao"))
        .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
          (abs(col("__ap") - col("exact_parts")).cast("double")
            <= col("exact_parts") * 0.15).as("parts_in_envelope"),
          (abs(col("__ao") - col("exact_orders")).cast("double")
            <= col("exact_orders") * 0.15).as("orders_in_envelope"))
        .orderBy("l_returnflag")
    },

    // ----------------------------------------------------- scalar functions
    Q("q21_string_funcs",
      """SELECT p_partkey, upper(p_brand) AS brand_u, substring(p_name,1,10) AS name10,
        |CAST(length(p_name) AS BIGINT) AS name_len,
        |regexp_replace(p_type,'[aeiou]','','g') AS type_consonants,
        |concat_ws('|', p_brand, p_type) AS brand_type
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 10).as("name10"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_replace(col("p_type"), "[aeiou]", "").as("type_consonants"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
        .orderBy("p_partkey")
    },

    Q("q22_date_funcs",
      """SELECT strftime(o_orderdate, '%Y-%m') AS ym, count(*) AS n_orders,
        |round(sum(o_totalprice),2) AS revenue
        |FROM orders GROUP BY ym ORDER BY ym""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("ym")
    },

    Q("q23_json_extract",
      """SELECT event_id, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |FROM events WHERE CAST(json_extract_string(props,'$.k') AS BIGINT) > 50
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .select(col("event_id"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k") > 50)
        .orderBy("event_id")
    },

    Q("q24_case_when",
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
        |  WHEN o_totalprice < 200000 THEN 'mid' ELSE 'high' END AS band,
        |count(*) AS n, round(avg(o_totalprice),2) AS avg_price
        |FROM orders GROUP BY band ORDER BY band""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .groupBy(when(col("o_totalprice") < 50000, "low")
          .when(col("o_totalprice") < 200000, "mid").otherwise("high").as("band"))
        .agg(count(lit(1)).as("n"), round(avg("o_totalprice"), 2).as("avg_price"))
        .orderBy("band")
    },

    Q("q25_stats",
      """SELECT l_returnflag, round(min(l_extendedprice),2) AS min_price,
        |round(max(l_extendedprice),2) AS max_price, round(avg(l_extendedprice),4) AS avg_price,
        |round(stddev_samp(l_extendedprice),4) AS sd_price, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(
          round(min("l_extendedprice"), 2).as("min_price"),
          round(max("l_extendedprice"), 2).as("max_price"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // ------------------------------------------------- temporal / telemetry
    Q("q27_asof_join",
      """WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(event_id) AS p_id,
        |  arg_max(value, event_id) AS p_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS click_ts, event_id AS click_id
        |  FROM events WHERE event_type = 'click')
        |SELECT c.user_id AS user_id, c.click_id, c.click_ts, p.p_id AS matched_p_id,
        |  p.p_value AS matched_p_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.click_ts >= p.ts
        |ORDER BY c.user_id, c.click_id""".stripMargin) { (s, d) =>
      val e = t(s, d, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts")
        .agg(max("event_id").as("p_id"), max_by(col("value"), col("event_id")).as("p_value"))
      AsOfJoin.leftAsOf(clicks, purchases, "user_id", "ts", Seq("p_id", "p_value"))
        .select(col("user_id"), col("click_id"), col("ts").as("click_ts"),
          col("p_id").as("matched_p_id"), col("p_value").as("matched_p_value"))
        .orderBy("user_id", "click_id")
    },

    Q("q177_asof_forward_tolerance",
      // FORWARD as-of with a gap bound: each click attaches the EARLIEST
      // purchase at-or-after it, but only within 2 hours — the
      // attribution-window join (pandas merge_asof direction='forward',
      // tolerance=...). Same one-shuffle union+window shape as q27's
      // backward as-of; the descending carry pass adds a sort, never a
      // shuffle. Oracle: DuckDB ASOF accepts the <= inequality directly
      // (earliest right with l.ts <= r.ts); the tolerance is applied to
      // the matched row's own ts, exactly the engine's gap rule.
      """WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(event_id) AS p_id,
        |  arg_max(value, event_id) AS p_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS click_ts, event_id AS click_id
        |  FROM events WHERE event_type = 'click')
        |SELECT c.user_id AS user_id, c.click_id, c.click_ts,
        |  CASE WHEN p.ts <= c.click_ts + INTERVAL 2 HOUR THEN p.p_id END AS matched_p_id,
        |  CASE WHEN p.ts <= c.click_ts + INTERVAL 2 HOUR THEN p.p_value END AS matched_p_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.click_ts <= p.ts
        |ORDER BY c.user_id, c.click_id""".stripMargin) { (s, d) =>
      val e = t(s, d, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts")
        .agg(max("event_id").as("p_id"), max_by(col("value"), col("event_id")).as("p_value"))
      AsOfJoin.leftAsOf(clicks, purchases, "user_id", "ts", Seq("p_id", "p_value"),
          direction = "forward", toleranceMicros = Some(2L * 3600 * 1000000))
        .select(col("user_id"), col("click_id"), col("ts").as("click_ts"),
          col("p_id").as("matched_p_id"), col("p_value").as("matched_p_value"))
        .orderBy("user_id", "click_id")
    },

    Q("q178_asof_nearest",
      // NEAREST as-of: each click attaches whichever purchase is closer
      // in time (before or after), exact ties resolving backward — the
      // third merge_asof direction. The oracle reconstructs the same
      // choice rule from DuckDB's two directional ASOF joins: backward
      // wins iff it exists and its gap is <= the forward gap (interval
      // comparison), else forward if it exists.
      """WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(event_id) AS p_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS click_ts, event_id AS click_id
        |  FROM events WHERE event_type = 'click'),
        |b AS (SELECT c.user_id, c.click_id, c.click_ts, p.ts AS bts, p.p_id AS b_id
        |  FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.click_ts >= p.ts),
        |f AS (SELECT c.user_id, c.click_id, p.ts AS fts, p.p_id AS f_id
        |  FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.click_ts <= p.ts)
        |SELECT b.user_id AS user_id, b.click_id, b.click_ts,
        |  CASE WHEN b.bts IS NOT NULL
        |         AND (f.fts IS NULL OR (b.click_ts - b.bts) <= (f.fts - b.click_ts))
        |       THEN b.b_id ELSE f.f_id END AS matched_p_id
        |FROM b JOIN f ON b.user_id = f.user_id AND b.click_id = f.click_id
        |ORDER BY b.user_id, b.click_id""".stripMargin) { (s, d) =>
      val e = t(s, d, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts")
        .agg(max("event_id").as("p_id"))
      AsOfJoin.leftAsOf(clicks, purchases, "user_id", "ts", Seq("p_id"),
          direction = "nearest")
        .select(col("user_id"), col("click_id"), col("ts").as("click_ts"),
          col("p_id").as("matched_p_id"))
        .orderBy("user_id", "click_id")
    },

    Q("q29_last_per_key",
      """SELECT user_id, event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      // the reference's last-value-per-tag materialization (Program.cs:1179-1182)
      // expressed as a single partial-aggregating max_by — no window sort
      LastValue.latestPerKey(t(s, d, "events"), Seq("user_id"), Seq("ts", "event_id"))
        .select("user_id", "event_id", "event_type", "value", "ts")
        .orderBy("user_id")
    },

    Q("q30_tumbling_window",
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type, count(*) AS n,
        |round(sum(value),2) AS sum_value
        |FROM events GROUP BY hour, event_type ORDER BY hour, event_type""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("hour", "event_type")
    },

    // ------------------------------------------- reference-semantics golden
    Q("q31_normalize_golden",
      """SELECT * FROM (VALUES
        |('t_bool',  CAST(1.0 AS DOUBLE), true,  'true'),
        |('t_bool2', CAST(0.0 AS DOUBLE), false, 'false'),
        |('t_date',  CAST(638396640000000000 AS DOUBLE), false, '2024-01-01 00:00:00'),
        |('t_double',CAST(3.14 AS DOUBLE), true,  '3.14'),
        |('t_float', CAST(-2.5 AS DOUBLE), true,  '-2.5'),
        |('t_int',   CAST(42 AS DOUBLE),  true,  '42'),
        |('t_int64_big', CAST(9007199254740992 AS DOUBLE), true, '9007199254740993'),
        |('t_state', CAST(3 AS DOUBLE),   true,  '3'),
        |('t_str',   CAST(0.0 AS DOUBLE), false, 'hello'),
        |('t_strnum',CAST(12.5 AS DOUBLE), true, '12.5'),
        |('t_vtr4',  CAST(1.5 AS DOUBLE), true,  '1.5'))
        |AS v(tag, double_value, bool_value, string_value) ORDER BY tag""".stripMargin) { (s, d) =>
      import s.implicits._
      val ts = Timestamp.valueOf("2024-06-01 00:00:00")
      def r(tag: String, dt: String, raw: String) =
        RawReading("srv", tag, s"ns=1;s=$tag", dt, raw, ts, ts, 192)
      val raw = Seq(
        r("t_bool", "Boolean", "true"),
        r("t_bool2", "Bool", "false"),
        r("t_date", "DateTime", "2024-01-01 00:00:00"),
        r("t_double", "Double", "3.14"),
        r("t_float", "Float", "-2.5"),
        r("t_int", "Int32", "42"),
        r("t_int64_big", "Int64", "9007199254740993"),
        r("t_state", "state", "3"),
        r("t_str", "String", "hello"),
        r("t_strnum", "String", "12.5"),
        r("t_vtr4", "VT_R4", "1.5")).toDF()
      Normalize.normalize(raw)
        .select(col("tag"), col("doubleValue").as("double_value"),
          col("boolValue").as("bool_value"), col("stringValue").as("string_value"))
        .orderBy("tag")
    },

    Q("q32_config_parse",
      """SELECT * FROM (VALUES
        |('Alpha', 'opc.tcp://host1:4840', 10, true,  'ns=1;s=Plant.Temp',  'Double', true,  'Plant.Temp'),
        |('Alpha', 'opc.tcp://host1:4840', 10, true,  'ns=1;s=Plant.Count', 'Int32',  false, 'ns=1;s=Plant.Count'),
        |('Beta',  'opcda://host2/da',     20, false, 'Channel.Device.Tag1','VT_R4',  true,  'T1'))
        |AS v(server_name, opc_url, read_period_sec, is_ua, opc_path, data_type, subscribe, tag)
        |ORDER BY server_name, tag""".stripMargin) { (s, d) =>
      import s.implicits._
      val conf =
        """# demo topology
          |mongodb://localhost:27017/graft
          |opc.tcp://host1:4840, 10, Alpha, cert.pfx, pw
          |ns=1;s=Plant.Temp    ,Double ,Y ,Plant.Temp
          |ns=1;s=Plant.Count   ,Int32  ,N ,
          |opcda://host2/da, 20, Beta
          |Channel.Device.Tag1  ,VT_R4  ,Y ,T1
          |bad line
          |""".stripMargin
      val parsed = OpcConfigParser.parse(conf).config
      parsed.servers.flatMap { srv =>
        srv.entries.map(e =>
          (srv.serverName, srv.opcUrl, srv.readPeriodSec, srv.isUa,
            e.opcPath, e.dataType, e.subscribe, e.tag))
      }.toDF("server_name", "opc_url", "read_period_sec", "is_ua",
        "opc_path", "data_type", "subscribe", "tag")
        .orderBy("server_name", "tag")
    }
  )
}
