package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomPrune

/** Bloom-pruned join: exactness vs the plain join, the empty-dim-side
  * regression (stat.bloomFilter NPEs on zero rows — q102's round-4 failure
  * mode), and the plan property that the probe filter sits on the fact scan
  * side (before the join).
  */
class BloomPruneSpec extends SparkSpec {

  import spark.implicits._

  private lazy val fact =
    (1L to 1000L).map(i => (i, i % 50, i * 2.5)).toDF("id", "k", "v")
  private lazy val dim =
    Seq((3L, "a"), (17L, "b"), (42L, "c")).toDF("dk", "name")

  test("pruned join result equals plain join result") {
    val pruned = BloomPrune.prunedEquiJoin(fact, "k", dim, "dk",
      expectedItems = 16, fpp = 0.01)
    val plain = fact.join(dim, col("k") === col("dk"))
    assert(pruned.count() === 60)
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("empty dim side yields empty result, no NPE") {
    val noDim = dim.filter(col("name") === "zzz")
    val out = BloomPrune.prunedEquiJoin(fact, "k", noDim, "dk")
    assert(out.count() === 0)
    assert(out.columns.toSeq === Seq("id", "k", "v", "dk", "name"))
  }

  test("buildBloom returns None on empty input, Some on rows") {
    assert(BloomPrune.buildBloom(dim.limit(0), "dk", 16, 0.01).isEmpty)
    val bytes = BloomPrune.buildBloom(dim, "dk", 16, 0.01)
    assert(bytes.nonEmpty && bytes.get.length > 0)
  }

  test("probe filter runs on the fact side before the join") {
    // LocalRelation fixtures constant-fold before the plan is observable
    // (NOTES.md) — route through parquet so the Filter survives.
    val dir = java.nio.file.Files.createTempDirectory("bloomspec").toString
    fact.write.mode("overwrite").parquet(s"$dir/fact")
    val factP = spark.read.parquet(s"$dir/fact")
    val pruned = BloomPrune.prunedEquiJoin(factP, "k", dim, "dk",
      expectedItems = 16, fpp = 0.01)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected bloom probe in plan:\n$plan")
  }
}
