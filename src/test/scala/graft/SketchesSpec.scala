package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // 3 groups x 40 buckets, values overlapping across buckets within a group
  private def fixture = (1 to 2000).map { i =>
    (s"g${i % 3}", i % 40, s"v${i % (100 + (i % 3) * 150)}")
  }.toDF("g", "b", "v")

  test("hllRollup: estimates land inside the HLL error envelope, exact rides along") {
    val got = Sketches.hllRollup(fixture, "g", col("b"), "v")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == 3)
    got.values.foreach { case (g, nBuckets, approx, exact, relErr) =>
      assert(nBuckets == 40L, s"$g buckets")
      // lgK=12 standard error ~1.6%; 5% is a generous, stable envelope
      assert(relErr <= 0.05, s"$g: approx $approx vs exact $exact")
      assert(math.abs(approx - exact) <= math.ceil(exact * 0.05).toLong)
    }
    // exact side is the true distinct count of the fixture
    val trueDistinct = fixture.filter($"g" === "g0").select("v").distinct().count()
    assert(got("g0")._4 == trueDistinct)
  }

  test("hllRollup: merge topology moves estimates only inside the envelope") {
    val merged = Sketches.hllRollup(fixture, "g", col("b"), "v")
      .select("g", "approx_distinct").as[(String, Long)].collect().toMap
    // DataSketches HLL estimates depend on the value set AND the merge
    // topology (sparse→dense conversion points differ) — so neither
    // re-bucketing nor re-partitioning is bit-stable, and BOTH must stay
    // inside a tight envelope of each other (measured drift: ~±1 count)
    val whole = Sketches.hllRollup(fixture, "g", lit(0), "v")
      .select("g", "approx_distinct").as[(String, Long)].collect().toMap
    val repart = Sketches.hllRollup(fixture.repartition(13), "g", col("b"), "v")
      .select("g", "approx_distinct").as[(String, Long)].collect().toMap
    Seq(whole, repart).foreach { other =>
      merged.foreach { case (g, m) =>
        assert(math.abs(m - other(g)).toDouble / other(g) <= 0.02,
          s"$g: $m vs ${other(g)}")
      }
    }
  }

  test("hllRollup: null values carry no cardinality; empty input yields no rows") {
    val withNulls = Seq(("g", 1, "a"), ("g", 1, null), ("g", 2, "a"), ("g", 2, null))
      .toDF("g", "b", "v")
    val row = Sketches.hllRollup(withNulls, "g", col("b"), "v")
      .as[(String, Long, Long, Long, Double)].collect().head
    assert((row._2, row._3, row._4) == ((2L, 1L, 1L)), "only 'a' is distinct")
    val empty = Seq.empty[(String, Int, String)].toDF("g", "b", "v")
    assert(Sketches.hllRollup(empty, "g", col("b"), "v").count() == 0)
  }

  test("countMin: one-sided (est >= exact), exact at generous width, absent key = 0") {
    import spark.implicits._
    val items = (Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val exact = Map("a" -> 7L, "b" -> 3L, "c" -> 1L)
    for (width <- Seq(2, 4096)) {
      val sk = Sketches.countMinSketch(items, "k", depth = 4, width = width)
      val est = Sketches.countMinEstimate(sk,
        Seq("a", "b", "c", "never").toDF("k"), "k", depth = 4, width = width)
        .as[(String, Long)].collect().toMap
      exact.foreach { case (k, ex) =>
        assert(est(k) >= ex, s"width=$width key=$k: ${est(k)} < $ex") }
      if (width == 4096) assert(est.view.filterKeys(exact.contains).toMap == exact)
      // a key never inserted can still collide at width 2; at 4096 it is 0
      if (width == 4096) assert(est("never") == 0L)
    }
  }

  test("countMin: sketches MERGE by cell-wise addition — union == sum of parts") {
    import spark.implicits._
    val a = Seq("x", "x", "y").toDF("k")
    val b = Seq("x", "z", "z").toDF("k")
    val whole = Sketches.countMinSketch(a.unionAll(b), "k", 4, 64)
      .as[(Int, Long, Long)].collect().toSet
    val merged = Sketches.countMinSketch(a, "k", 4, 64)
      .unionAll(Sketches.countMinSketch(b, "k", 4, 64))
      .groupBy("r", "bucket").agg(sum("cnt").as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    assert(whole == merged)
    intercept[IllegalArgumentException](
      Sketches.countMinSketch(a, "k", depth = 0, width = 64))
  }

  test("countMin: NULL keys keep the one-sided est >= exact guarantee (ADVICE r13)") {
    import spark.implicits._
    // 3 NULLs + 2 "a": before the sentinel fix a NULL key hashed to a
    // NULL bucket on the build side and the estimate join missed it —
    // estimating 0 for a key present 3 times. The sentinel must be
    // IDENTICAL on both sides (a build/estimate mismatch reintroduces
    // exactly that bug — regression-pinned here).
    val items = Seq(Some("a"), None, Some("a"), None, None).toDF("k")
    val sk = Sketches.countMinSketch(items, "k", depth = 4, width = 4096)
    val est = Sketches.countMinEstimate(sk,
      Seq(Some("a"), None).toDF("k"), "k", depth = 4, width = 4096)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(est(Some("a")) >= 2L && est(None) >= 3L, est.toString)
    // at width 4096 with 2 distinct keys, no collision: exact
    assert(est(Some("a")) == 2L && est(None) == 3L)
  }

  test("kmv: exact below k, topology-free merge, estimate within the k=256 envelope") {
    import spark.implicits._
    // below k: signature IS the set, estimate exact
    val small = (1 to 40).map(v => ("g1", v)).toDF("g", "v")
    val sSmall = Sketches.kmvSignature(small, "g", "v", k = 256)
    val eSmall = Sketches.kmvDistinctEstimate(sSmall, "g", k = 256)
      .as[(String, Long, Double)].collect().head
    assert(eSmall == (("g1", 40L, 40.0)))
    // at k: 5000 distinct values, estimate within 20% (k=256 → se ~6%)
    val big = (1 to 5000).map(v => ("g2", v)).toDF("g", "v")
    val eBig = Sketches.kmvDistinctEstimate(
      Sketches.kmvSignature(big, "g", "v", k = 256), "g", k = 256)
      .as[(String, Long, Double)].collect().head
    assert(eBig._2 == 256L)
    assert(math.abs(eBig._3 - 5000.0) / 5000.0 < 0.2, eBig.toString)
    // topology-free: signature of the whole == merge of two shard
    // signatures == signature under any repartitioning
    val a = (1 to 3000).map(v => ("g", v)).toDF("g", "v")
    val b = (2000 to 5000).map(v => ("g", v)).toDF("g", "v")
    val whole = Sketches.kmvSignature(a.unionAll(b), "g", "v", 256)
      .select("kmv").as[Seq[Long]].collect().head
    val merged = Sketches.kmvSignature(a, "g", "v", 256)
      .join(Sketches.kmvSignature(b, "g", "v", 256)
        .withColumnRenamed("kmv", "kmv2"), "g")
      .select(Sketches.kmvMerge(col("kmv"), col("kmv2"), 256))
      .as[Seq[Long]].collect().head
    assert(whole == merged)
    val repart = Sketches.kmvSignature(
        a.unionAll(b).repartition(13), "g", "v", 256)
      .select("kmv").as[Seq[Long]].collect().head
    assert(whole == repart)
    intercept[IllegalArgumentException](Sketches.kmvSignature(a, "g", "v", 1))
  }

  test("kmv set ops: ground-truth Jaccard recovered within the sketch envelope") {
    import spark.implicits._
    // A = 1..4000, B = 2001..6000: |A∩B|=2000, |A∪B|=6000, J = 1/3
    val rows = (1 to 4000).map(v => ("A", v)) ++ (2001 to 6000).map(v => ("B", v))
    val sigs = Sketches.kmvSignature(rows.toDF("g", "v"), "g", "v", k = 256)
    val ops = Sketches.kmvSetOps(sigs, "g", k = 256)
      .as[(String, String, Long, Long, Double, Double)].collect().head
    val (ga, gb, mSize, _, jac, union) = ops
    assert(ga == "A" && gb == "B" && mSize == 256L)
    assert(math.abs(jac - 1.0 / 3) < 0.12, ops.toString)
    assert(math.abs(union - 6000.0) / 6000.0 < 0.2, ops.toString)
  }
}
