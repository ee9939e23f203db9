package graft

import org.apache.spark.sql.functions._

import graft.queries.Q

/** Inventory-level checks that the DuckDB oracle can't express. */
class QueriesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has a unique name; oracle keys are a subset") {
    val names = SparkEntry.inventory.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q26 approx_count_distinct within 10% of exact counts") {
    val approx = SparkEntry.queries("q26_approx_distinct")(spark, sf)
      .as[(Long, Long)].collect().head
    val exact = Q.t(spark, sf, "lineitem")
      .agg(countDistinct(col("l_partkey")), countDistinct(col("l_orderkey")))
      .as[(Long, Long)].collect().head
    // HLL++ default rsd is 5%; allow 2 sigma
    def close(a: Long, e: Long) = math.abs(a - e).toDouble / e < 0.10
    assert(close(approx._1, exact._1), s"$approx vs $exact")
    assert(close(approx._2, exact._2), s"$approx vs $exact")
  }

  test("q57 approx percentiles close to exact q45") {
    def byFlag(name: String) = SparkEntry.queries(name)(spark, sf)
      .select("l_returnflag", "q1", "median", "q3")
      .as[(String, Double, Double, Double)].collect()
      .map { case (f, a, b, c) => f -> Seq(a, b, c) }.toMap
    val exact = byFlag("q45_percentiles")
    val approx = byFlag("q57_approx_percentiles")
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (flag, e) =>
      e.zip(approx(flag)).foreach { case (ev, av) =>
        // l_quantity spans 1..50; accuracy=1000 keeps the sketch within a
        // couple of quantity units at these group sizes
        assert(math.abs(ev - av) <= 2.0, s"$flag exact=$ev approx=$av")
      }
    }
  }

  test("q54 IVF top-k recall >= 0.5 against exact q40 on sf0.001") {
    val exact = SparkEntry.queries("q40_ann_topk")(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = SparkEntry.queries("q54_ivf_topk")(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("q42 LSH top-k recall >= 0.5 against exact q40 on sf0.001") {
    val exact = SparkEntry.queries("q40_ann_topk")(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = SparkEntry.queries("q42_lsh_topk")(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
  }
}
