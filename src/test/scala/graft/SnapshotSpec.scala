package graft

import graft.operators.Snapshot

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added / removed / changed and drops unchanged") {
    val oldDf = Seq(
      (1L, "a", 10.0),   // unchanged
      (2L, "b", 20.0),   // payload change
      (3L, "c", 30.0),   // removed
      (4L, null.asInstanceOf[String], 40.0)) // null -> value change
      .toDF("k", "s", "v")
    val newDf = Seq(
      (1L, "a", 10.0),
      (2L, "b", 21.0),
      (4L, "", 40.0),
      (5L, "e", 50.0))   // added
      .toDF("k", "s", "v")
    val got = Snapshot.diff(oldDf, newDf, "k")
      .as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "added"))
  }

  test("diff: null and empty string do not collide in the content hash") {
    val oldDf = Seq((1L, null.asInstanceOf[String])).toDF("k", "s")
    val newDf = Seq((1L, "")).toDF("k", "s")
    assert(Snapshot.diff(oldDf, newDf, "k")
      .as[(Long, String)].collect().toSeq == Seq((1L, "changed")))
    // boundary shifts between adjacent columns must not collide either —
    // per-column digests make every column a fixed-width block
    val o2 = Seq((1L, "ab", "c")).toDF("k", "x", "y")
    val n2 = Seq((1L, "a", "bc")).toDF("k", "x", "y")
    assert(Snapshot.diff(o2, n2, "k").count() == 1)
    // the adversarial case for marker+value concatenation: values that
    // CONTAIN the marker character realign across the boundary
    // ("a","b1c" -> "1a"+"1b1c" == "1a1b"+"1c" <- "a1b","c")
    val o3 = Seq((1L, "a", "b1c")).toDF("k", "x", "y")
    val n3 = Seq((1L, "a1b", "c")).toDF("k", "x", "y")
    assert(Snapshot.diff(o3, n3, "k")
      .as[(Long, String)].collect().toSeq == Seq((1L, "changed")))
  }

  test("diff compares only columns common to both snapshots by default") {
    val oldDf = Seq((1L, "same", "dropped-col")).toDF("k", "s", "legacy")
    val newDf = Seq((1L, "same", 99.0)).toDF("k", "s", "added_col")
    // only "s" is common; it is equal -> no diff rows despite schema drift
    assert(Snapshot.diff(oldDf, newDf, "k").count() == 0)
    val changed = Snapshot.diff(oldDf,
      Seq((1L, "different", 99.0)).toDF("k", "s", "added_col"), "k")
    assert(changed.as[(Long, String)].collect().toSeq == Seq((1L, "changed")))
  }

  test("diff of identical snapshots is empty; empty-vs-full is all adds") {
    val df = (1L to 50L).map(i => (i, s"v$i")).toDF("k", "s")
    assert(Snapshot.diff(df, df, "k").count() == 0)
    val empty = Seq.empty[(Long, String)].toDF("k", "s")
    val adds = Snapshot.diff(empty, df, "k").as[(Long, String)].collect()
    assert(adds.length == 50 && adds.forall(_._2 == "added"))
  }
}
