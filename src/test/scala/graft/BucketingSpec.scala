package graft

import graft.operators.Bucketing

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two same-bucketed tables plans with zero exchanges") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (1 to 1000).map(i => (i.toLong % 50, s"f$i", i * 1.5)).toDF("k", "tag", "v")
      val dims = (1 to 500).map(i => (i.toLong % 50, s"d$i")).toDF("k", "name")
      Bucketing.writeBucketed(facts, "b_facts", Seq("k"), 8, Seq("k"))
      Bucketing.writeBucketed(dims, "b_dims", Seq("k"), 8, Seq("k"))

      val joined = Bucketing.bucketedJoin(spark, "b_facts", "b_dims", Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000L * 10) // each k has 20 facts × 10 dims
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
