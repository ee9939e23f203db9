package graft

import graft.operators.LinearAlgebra

/** VERDICT r13 task #1 — the Gramian-accumulator rewrite of
  * `secondMoment` must be CELL-FOR-CELL equal to the double-posexplode
  * form it replaced, including the subtle arms: negatives, ragged
  * vectors (a cell exists iff some row covers it), zero cells present
  * (not dropped), and empty input → zero rows. Plus the measured
  * speedup the rewrite exists for.
  */
class GramianParitySpec extends SparkSpec {
  import spark.implicits._

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
    df.as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap

  test("cell-for-cell parity with the explode form on random dense vectors") {
    val rnd = new scala.util.Random(42)
    val vecs = Seq.fill(60)(Seq.fill(24)(rnd.nextFloat() * 2f - 1f)).toDF("v")
    val fast = asMap(LinearAlgebra.secondMoment(vecs, "v", 64))
    val slow = asMap(LinearAlgebra.secondMomentExplode(vecs, "v", 64))
    assert(fast.size == 24 * 24)
    assert(fast == slow)
  }

  test("ragged vectors: cell universe and sums match the explode form") {
    // lengths 2, 3, 5: cells up to (5,5) exist, covered by the longest
    // row; shorter rows contribute only to their prefix blocks
    val rnd = new scala.util.Random(7)
    val vecs = Seq(2, 3, 5, 3, 2, 5)
      .map(n => Seq.fill(n)(rnd.nextFloat() * 2f - 1f)).toDF("v")
    val fast = asMap(LinearAlgebra.secondMoment(vecs, "v", 64))
    val slow = asMap(LinearAlgebra.secondMomentExplode(vecs, "v", 64))
    assert(fast.size == 25 && fast == slow)
  }

  test("zero cells are present, not dropped; empty input yields zero rows") {
    val vecs = Seq(Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)).toDF("v")
    val m = asMap(LinearAlgebra.secondMoment(vecs, "v", 64))
    assert(m == Map((1L, 1L) -> 8192L, (1L, 2L) -> 0L,
      (2L, 1L) -> 0L, (2L, 2L) -> 0L))
    val empty = Seq.empty[Seq[Float]].toDF("v")
    assert(LinearAlgebra.secondMoment(empty, "v", 64).count() == 0L)
  }

  test("null elements: parity on mixed-null cells, divergence only on all-null cells") {
    // the documented contract boundary (ADVICE r14, corrected by
    // measurement): the Seq[Long] encoder decodes a null element as 0L
    // — it does NOT throw — so cells with any non-null product match the
    // explode form exactly (its sum skips null products; skipping and
    // adding 0 agree), and ONLY an all-null-product cell diverges:
    // explode NULL, accumulator 0. Pin both halves so a refactor can't
    // silently change either side.
    val mixed = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS v " +
        "UNION ALL SELECT array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT))")
    assert(asMap(LinearAlgebra.secondMoment(mixed, "v", 64)) ==
      asMap(LinearAlgebra.secondMomentExplode(mixed, "v", 64)))
    // every row null at position 2 → cells (1,2),(2,1),(2,2) all-null
    val allNull = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS v " +
        "UNION ALL SELECT array(CAST(2.0 AS FLOAT), CAST(NULL AS FLOAT))")
    val fast = LinearAlgebra.secondMoment(allNull, "v", 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val slow = LinearAlgebra.secondMomentExplode(allNull, "v", 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(fast((1L, 1L)) == slow((1L, 1L)) &&
      fast((1L, 1L)) == Some(5L * 64L * 64L))
    assert(slow((2L, 2L)).isEmpty && fast((2L, 2L)) == Some(0L))
  }

  test("order independence: repartitioned input gives identical cells") {
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(40)(Seq.fill(16)(rnd.nextFloat())).toDF("v")
    val a = asMap(LinearAlgebra.secondMoment(vecs.repartition(7), "v", 64))
    val b = asMap(LinearAlgebra.secondMoment(vecs.coalesce(1), "v", 64))
    assert(a == b)
  }

  test("micro-bench: accumulator >= 5x faster than explode at dim 512") {
    val rnd = new scala.util.Random(3)
    val vecs = Seq.fill(480)(Seq.fill(512)(rnd.nextFloat() * 2f - 1f))
      .toDF("v").cache()
    vecs.count()
    def time(f: => Long): (Long, Long) = {
      val t0 = System.nanoTime(); val n = f
      (n, (System.nanoTime() - t0) / 1000000)
    }
    // min over two passes per path: pass 1 pays JIT/codegen warm-up
    def minTime(f: => Long): (Long, Long) = {
      val (n1, t1) = time(f); val (n2, t2) = time(f)
      assert(n1 == n2); (n1, math.min(t1, t2))
    }
    val (nFast, msFast) = minTime(LinearAlgebra.secondMoment(vecs, "v", 64).count())
    val (nSlow, msSlow) = minTime(LinearAlgebra.secondMomentExplode(vecs, "v", 64).count())
    assert(nFast == 512L * 512L && nSlow == nFast)
    info(s"dim=512, 480 vectors: accumulator ${msFast}ms, explode ${msSlow}ms " +
      f"(${msSlow.toDouble / msFast}%.1fx)")
    assert(msSlow >= 5 * msFast,
      s"expected >=5x: accumulator ${msFast}ms vs explode ${msSlow}ms")
    vecs.unpersist()
  }
}
