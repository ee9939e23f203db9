package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 90%-hot fixture: key 1L dominates, plus duplicates, a null key, and
  // fact keys with no build match
  private val fact = (
    (1 to 900).map(i => (Option(1L), s"v${i % 10}")) ++  // hot key, dup rows
      (1 to 50).map(i => (Option(2L), s"w$i")) ++
      Seq((Option(99L), "orphan"), (Option.empty[Long], "nullkey"))
    ).toDF("k", "payload")
  private val build =
    Seq((1L, "one"), (2L, "two"), (3L, "unmatched")).toDF("bk", "name")

  test("salted join equals the plain join exactly (incl. dups, nulls, orphans)") {
    val salted = SkewJoin.saltedEquiJoin(fact, "k", build, "bk", numSalts = 16)
    val plain = fact.join(build, fact("k") === build("bk"))
    assert(salted.columns.toSeq == plain.columns.toSeq)
    // multiset equality: group-count both sides
    val a = salted.groupBy("k", "payload", "bk", "name").count()
      .as[(Long, String, Long, String, Long)].collect().toSet
    val b = plain.groupBy("k", "payload", "bk", "name").count()
      .as[(Long, String, Long, String, Long)].collect().toSet
    assert(a == b)
    assert(salted.count() == 950) // 900 hot + 50 warm; orphan + null drop
  }

  test("the hot key's rows span >1 shuffle partition after salting") {
    // force a shuffled join (no broadcast) and keep shuffle partitions
    // un-coalesced so partition ids reflect the hash partitioning
    val conf = spark.conf
    val savedBc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedCo = conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val salted = SkewJoin.saltedEquiJoin(fact, "k", build, "bk", numSalts = 16)
      val hotParts = salted.filter(col("k") === 1L)
        .select(spark_partition_id()).distinct().count()
      assert(hotParts > 1, s"hot key landed in $hotParts partition(s)")
      // the plain join puts every hot row in exactly one partition — the
      // straggler this operator exists to break up
      val plainParts = fact.join(build, fact("k") === build("bk"))
        .filter(col("k") === 1L)
        .select(spark_partition_id()).distinct().count()
      assert(plainParts == 1L)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", savedCo)
    }
  }

  test("numSalts = 1 degenerates to the plain join") {
    val salted = SkewJoin.saltedEquiJoin(fact, "k", build, "bk", numSalts = 1)
    assert(salted.count() == 950)
  }
}
