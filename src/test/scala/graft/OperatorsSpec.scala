package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, LastValue, RangeJoin}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("leftAsOf attaches latest right row with ts <= left ts, per key") {
    val left = Seq(
      ("k1", 10L, "L1"), ("k1", 25L, "L2"), ("k1", 5L, "L0"),
      ("k2", 50L, "L3"), ("k3", 7L, "L4"))
      .toDF("key", "t", "lbl")
      .select(col("key"), timestamp_seconds(col("t")).as("ts"), col("lbl"))
    val right = Seq(
      ("k1", 10L, 1.0), ("k1", 20L, 2.0), ("k2", 60L, 3.0))
      .toDF("key", "t", "v")
      .select(col("key"), timestamp_seconds(col("t")).as("ts"), col("v"))

    val got = AsOfJoin.leftAsOf(left, right, "key", "ts", Seq("v"))
      .select("lbl", "v").as[(String, Option[Double])].collect().toMap
    assert(got("L0").isEmpty)        // before any right row
    assert(got("L1").contains(1.0))  // equal ts is inclusive
    assert(got("L2").contains(2.0))  // latest preceding
    assert(got("L3").isEmpty)        // right row is later than left
    assert(got("L4").isEmpty)        // key with no right rows
  }

  test("leftAsOf directions and tolerance: forward, nearest, tie-backward, gap bound") {
    val left = Seq(
      ("k1", 10L, "L1"),  // right at 10 (back, gap 0) and 20 (fwd, gap 10)
      ("k1", 16L, "L2"),  // back 10 (gap 6), fwd 20 (gap 4) → nearest = fwd
      ("k1", 15L, "L3"),  // back 10 (gap 5), fwd 20 (gap 5) → tie → backward
      ("k1", 40L, "L4"),  // only back 20 (gap 20)
      ("k2", 50L, "L5"))  // only fwd 60 (gap 10)
      .toDF("key", "t", "lbl")
      .select(col("key"), timestamp_seconds(col("t")).as("ts"), col("lbl"))
    val right = Seq(
      ("k1", 10L, 1.0), ("k1", 20L, 2.0), ("k2", 60L, 3.0))
      .toDF("key", "t", "v")
      .select(col("key"), timestamp_seconds(col("t")).as("ts"), col("v"))

    def run(dir: String, tol: Option[Long] = None): Map[String, Option[Double]] =
      AsOfJoin.leftAsOf(left, right, "key", "ts", Seq("v"), dir, tol)
        .select("lbl", "v").as[(String, Option[Double])].collect().toMap

    val fwd = run("forward")
    assert(fwd("L1").contains(1.0), "equal ts inclusive forward")
    assert(fwd("L2").contains(2.0) && fwd("L3").contains(2.0))
    assert(fwd("L4").isEmpty, "nothing after 40 for k1")
    assert(fwd("L5").contains(3.0))

    val near = run("nearest")
    assert(near("L1").contains(1.0)) // gap 0 backward
    assert(near("L2").contains(2.0)) // fwd gap 4 < back gap 6
    assert(near("L3").contains(1.0)) // exact tie resolves backward
    assert(near("L4").contains(2.0)) // only backward exists
    assert(near("L5").contains(3.0)) // only forward exists

    // tolerance (seconds → micros): backward within 6s drops L4 (gap 20)
    val backTol = run("backward", Some(6L * 1000000))
    assert(backTol("L2").contains(1.0) && backTol("L4").isEmpty)
    // nearest with 4s tolerance: L3's both gaps are 5 → no match; L2
    // keeps the forward match (gap 4) even though backward (gap 6) is
    // out of range — per-direction tolerance before choosing
    val nearTol = run("nearest", Some(4L * 1000000))
    assert(nearTol("L2").contains(2.0))
    assert(nearTol("L3").isEmpty)
    assert(nearTol("L1").contains(1.0), "gap-0 backward survives any tolerance")

    // numeric (non-timestamp) ts axis works with plain-unit tolerance
    val leftN = Seq(("k1", 16L, "N1")).toDF("key", "ts", "lbl")
    val rightN = Seq(("k1", 10L, 1.0), ("k1", 20L, 2.0)).toDF("key", "ts", "v")
    val gotN = AsOfJoin.leftAsOf(leftN, rightN, "key", "ts", Seq("v"), "nearest", Some(4L))
      .select("lbl", "v").as[(String, Option[Double])].collect().toMap
    assert(gotN("N1").contains(2.0))

    // default direction unchanged: backward == the original contract
    assert(run("backward") === Map("L1" -> Some(1.0), "L2" -> Some(1.0),
      "L3" -> Some(1.0), "L4" -> Some(2.0), "L5" -> None))

    // an ORDERABLE-but-not-numeric ts axis (ISO strings sort
    // chronologically) still works for the plain carries — the gap
    // machinery must not run when nothing needs a gap
    val leftS = Seq(("k1", "2024-01-15", "S1")).toDF("key", "ts", "lbl")
    val rightS = Seq(("k1", "2024-01-10", 1.0), ("k1", "2024-01-20", 2.0))
      .toDF("key", "ts", "v")
    assert(AsOfJoin.leftAsOf(leftS, rightS, "key", "ts", Seq("v"))
      .select("v").as[Option[Double]].head().contains(1.0))
    assert(AsOfJoin.leftAsOf(leftS, rightS, "key", "ts", Seq("v"), "forward")
      .select("v").as[Option[Double]].head().contains(2.0))
    // ...and gap-needing modes reject it loudly instead of mis-casting
    assertThrows[IllegalArgumentException](
      AsOfJoin.leftAsOf(leftS, rightS, "key", "ts", Seq("v"), "nearest"))

    // fractional numeric axis: gaps stay fractional — left 10.9 with
    // rights at 10.0 (gap 0.9) and 11.05 (gap 0.15) must pick FORWARD
    // (integer truncation would score them 0 vs 1 and pick backward)
    val leftD = Seq(("k1", 10.9, "D1")).toDF("key", "ts", "lbl")
    val rightD = Seq(("k1", 10.0, 1.0), ("k1", 11.05, 2.0)).toDF("key", "ts", "v")
    assert(AsOfJoin.leftAsOf(leftD, rightD, "key", "ts", Seq("v"), "nearest")
      .select("v").as[Option[Double]].head().contains(2.0))
  }

  test("leftAsOf date-axis gaps use calendar days, immune to session-TZ DST") {
    // US fall-back 2024-11-03: the local day is 25 h in America/New_York.
    // A date→timestamp cast through that session zone would measure
    // 2024-11-02 → 2024-11-05 as 3 days + 1 h and DROP a match at an
    // exactly-3-day tolerance; calendar-day gap math keeps it.
    val d = java.sql.Date.valueOf(_: String)
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val left = Seq(("k1", d("2024-11-05"), "L1")).toDF("key", "ts", "lbl")
      val right = Seq(("k1", d("2024-11-02"), 1.0)).toDF("key", "ts", "v")
      val got = AsOfJoin.leftAsOf(left, right, "key", "ts", Seq("v"),
          "backward", Some(3L * 86400000000L))
        .select("v").as[Option[Double]].head()
      assert(got.contains(1.0), "3 calendar days must satisfy a 3-day tolerance")
      // and a genuinely-out-of-range match still drops (boundary is real)
      val gotOut = AsOfJoin.leftAsOf(left, right, "key", "ts", Seq("v"),
          "backward", Some(3L * 86400000000L - 1))
        .select("v").as[Option[Double]].head()
      assert(gotOut.isEmpty)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("latestPerKey keeps exactly the max-order row per key") {
    val df = Seq(
      ("a", 1L, "x1"), ("a", 3L, "x3"), ("a", 2L, "x2"),
      ("b", 9L, "y9"), ("b", 9L, "y9b"))
      .toDF("k", "ord", "payload")
    val got = LastValue.latestPerKey(df, Seq("k"), Seq("ord", "payload"))
      .select("k", "payload").as[(String, String)].collect().toMap
    assert(got == Map("a" -> "x3", "b" -> "y9b")) // tie broken by payload
  }

  test("latestPerKeySalted agrees with latestPerKey") {
    val df = (1 to 500).map { i =>
      (s"k${i % 7}", (i * 37 % 101).toLong, s"p$i")
    }.toDF("k", "ord", "payload")
    // orderCols fully disambiguate rows (payload unique), so the random
    // salt assignment cannot change which row wins
    val a = LastValue.latestPerKey(df, Seq("k"), Seq("ord", "payload"))
      .select("k", "payload").as[(String, String)].collect().toMap
    val b = LastValue.latestPerKeySalted(df, Seq("k"), Seq("ord", "payload"), 8)
      .select("k", "payload").as[(String, String)].collect().toMap
    assert(a == b)
  }

  test("latestPerKeySalted on a hot-key fixture: equivalent, deterministic, spread salts") {
    // telemetry-shaped skew: one tag carries 95% of all events
    val rows = (1 to 100000).map { i =>
      val k = if (i % 20 != 0) "hot" else s"cold${i % 997}"
      (k, i.toLong, s"p$i")
    }
    val df = rows.toDF("k", "ord", "payload").repartition(16)
    val exact = LastValue.latestPerKey(df, Seq("k"), Seq("ord", "payload"))
      .select("k", "payload").as[(String, String)].collect().toMap
    def salted() = LastValue.latestPerKeySalted(df, Seq("k"), Seq("ord", "payload"), 32)
      .select("k", "payload").as[(String, String)].collect().toMap
    val s1 = salted()
    assert(s1 == exact)
    assert(s1 == salted()) // deterministic hash salt: identical across runs
    // the hot key's rows actually spread across salt buckets (the point of
    // salting: no single reducer sees all of the hot key's partials)
    val nBuckets = df.filter(col("k") === "hot")
      .select(pmod(xxhash64(col("ord"), col("payload")), lit(32)).as("b"))
      .distinct().count()
    assert(nBuckets == 32L, s"hot key only hit $nBuckets/32 salt buckets")
  }

  test("rangeJoin pointInInterval equals the naive between-join") {
    val pts = (0L to 200L by 3L).map(p => (p, s"pt$p")).toDF("pt", "plbl")
    val ivs = Seq((0L, 10L, "a"), (5L, 64L, "b"), (63L, 65L, "c"),
      (100L, 100L, "d"), (190L, 300L, "e"), (400L, 410L, "f"))
      .toDF("start", "end", "ilbl")
    val got = RangeJoin.pointInInterval(pts, ivs, "pt", "start", "end", bucketWidth = 16)
      .select("pt", "ilbl").as[(Long, String)].collect().toSet
    val naive = pts.join(ivs, col("pt") >= col("start") && col("pt") <= col("end"))
      .select("pt", "ilbl").as[(Long, String)].collect().toSet
    assert(got == naive && got.nonEmpty)
  }

  test("rangeJoin extraKeys: intervals match only within their entity (SCD2 shape)") {
    // two entities with the SAME validity windows but different payloads;
    // a bucket-only join would cross-match them
    val dim = Seq(("e1", 0L, 9L, "e1v0"), ("e1", 10L, 19L, "e1v1"),
      ("e2", 0L, 9L, "e2v0"), ("e2", 10L, 19L, "e2v1"))
      .toDF("ent", "start", "end", "ver")
    val facts = Seq(("e1", 5L), ("e1", 15L), ("e2", 5L), ("e2", 19L))
      .toDF("ent", "pt")
    val got = RangeJoin.pointInInterval(facts, dim, "pt", "start", "end",
        bucketWidth = 10, extraKeys = Seq("ent"))
      .select("ent", "pt", "ver").as[(String, Long, String)].collect().toSet
    assert(got == Set(("e1", 5L, "e1v0"), ("e1", 15L, "e1v1"),
      ("e2", 5L, "e2v0"), ("e2", 19L, "e2v1")))
  }

  test("latestPerKey plans partial (map-side) aggregation and no window") {
    val df = Seq(("a", 1L, "x")).toDF("k", "ord", "payload")
    val plan = LastValue.latestPerKey(df, Seq("k"), Seq("ord"))
      .queryExecution.executedPlan.toString
    // the 100 TB property: shuffle carries at most one row per key per input
    // partition (partial_max_by below the Exchange), and no window sort of
    // the full input. (max_by over a struct buffer is sort-agg locally —
    // per-partition sort, not a global one.)
    assert(plan.contains("partial_max_by"), s"expected map-side combine:\n$plan")
    assert(!plan.contains("Window"), "must not use a window sort")
  }
}
