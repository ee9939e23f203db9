package graft

import graft.operators.{IncrementalAgg, Snapshot}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: the CDF payload semantics and
  * delta algebra cases q185's fixture can't exercise (group migration,
  * zero-count removal, malformed feeds).
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  test("changeDataFeed emits CDF row types with the right payload side") {
    val old = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      .toDF("k", "g", "v")
    val neu = Seq((2L, "a", 25L), (3L, "b", 30L), (4L, "c", 40L))
      .toDF("k", "g", "v")
    val cdf = Snapshot.changeDataFeed(old, neu, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSet
    assert(cdf === Set(
      (1L, "a", 10L, "delete"),            // old payload
      (2L, "a", 20L, "update_preimage"),   // old payload
      (2L, "a", 25L, "update_postimage"),  // new payload
      (4L, "c", 40L, "insert")))           // new payload; key 3 unchanged → absent
  }

  test("refresh equals recompute, including group migration and group death") {
    // old: g=a {k1:10, k2:20}, g=b {k3:30}
    // new: k1 deleted (a loses a row), k2 MIGRATES a→b with v=21,
    //      k4 inserted into c → group a must DIE (count 0), b gains
    val old = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      .toDF("k", "g", "v")
    val neu = Seq((2L, "b", 21L), (3L, "b", 30L), (4L, "c", 40L))
      .toDF("k", "g", "v")
    val prev = old.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("v"))
    val got = IncrementalAgg.refreshSumCount(prev,
        Snapshot.changeDataFeed(old, neu, "k"), Seq("g"), "n", Seq("v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = neu.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
    assert(!got.contains("a"), "a zero-count group must leave the state")
  }

  test("repeated refresh composes: v1→v2→v3 equals direct v3 aggregate") {
    val v1 = Seq((1L, "x", 1L), (2L, "x", 2L)).toDF("k", "g", "v")
    val v2 = Seq((1L, "x", 5L), (2L, "x", 2L), (3L, "y", 7L)).toDF("k", "g", "v")
    val v3 = Seq((2L, "y", 2L), (3L, "y", 7L)).toDF("k", "g", "v")
    var state = v1.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("v"))
    state = IncrementalAgg.refreshSumCount(state,
      Snapshot.changeDataFeed(v1, v2, "k"), Seq("g"), "n", Seq("v"))
    state = IncrementalAgg.refreshSumCount(state,
      Snapshot.changeDataFeed(v2, v3, "k"), Seq("g"), "n", Seq("v"))
    val got = state.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map("y" -> ((2L, 9L))))
  }

  test("a malformed change_type fails loudly instead of dropping weight") {
    val bad = Seq(("a", 1L, "upsert")).toDF("g", "v", "change_type")
    val e = intercept[Exception] {
      IncrementalAgg.sumCountDeltas(bad, Seq("g"), Seq("v")).collect()
    }
    assert(e.getMessage.contains("unknown change_type")
      || Option(e.getCause).exists(_.getMessage.contains("unknown change_type")))
  }
}
