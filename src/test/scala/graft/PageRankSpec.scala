package graft

import graft.operators.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Local mirror of the non-normalized formulation:
    * pr := (1-d) + d * Σ pr(in)/deg(in), over the deduped edge set.
    */
  private def localPageRank(
      edges: Seq[(Long, Long)], iters: Int, d: Double): Map[Long, Double] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toDouble }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var pr = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => pr(s) / deg(s) }.sum
      }
      pr = nodes.map(n => n -> ((1.0 - d) + d * in.getOrElse(n, 0.0))).toMap
    }
    pr
  }

  test("a 3-ring is a fixed point: every rank stays exactly 1.0") {
    // out-degree 1 everywhere, in-mass = predecessor's rank: 0.15+0.85*1=1
    val got = PageRank.pageRank(Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d"), 10)
      .as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0))
  }

  test("matches the local simulation on a graph with dangling nodes and dups") {
    // star out of 1, a 2-cycle (2,3), a dangling sink 4, duplicate edges
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (3L, 2L),
      (1L, 2L), (2L, 3L)) // dups must not change degrees or mass
    val got = PageRank.pageRank(edges.toDF("src", "dst"), iters = 5)
      .as[(Long, Double)].collect().toMap
    val want = localPageRank(edges, iters = 5, d = 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, pr) =>
      assert(math.abs(pr - want(id)) < 1e-12, s"node $id: $pr vs ${want(id)}")
    }
    // node 1 has no in-edges: exactly the base rank
    assert(got(1L) == 1.0 - 0.85)
  }

  test("damping parameter is honored and ranks order by connectivity") {
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 1L))
    val got = PageRank.pageRank(edges.toDF("a", "b"), iters = 8, damping = 0.5)
      .as[(Long, Double)].collect().toMap
    val want = localPageRank(edges, iters = 8, d = 0.5)
    got.foreach { case (id, pr) =>
      assert(math.abs(pr - want(id)) < 1e-12, s"node $id")
    }
    // 3 receives two in-edges, 2 none
    assert(got(3L) > got(1L) && got(1L) > got(2L))
  }

  test("reliable-checkpoint mode yields identical ranks") {
    // the graft.checkpoint.dir conf switches every round to reliable
    // Dataset.checkpoint() (fault-tolerant); the round structure is
    // unchanged, so ranks must match the local-mode run exactly
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (3L, 4L))
    val local = PageRank.pageRank(edges.toDF("s", "d"), iters = 5)
      .as[(Long, Double)].collect().toMap
    val dir = java.nio.file.Files.createTempDirectory("graft-pr-ck").toString
    spark.conf.set(graft.operators.Checkpoints.DirKey, dir)
    try {
      val reliable = PageRank.pageRank(edges.toDF("s", "d"), iters = 5)
        .as[(Long, Double)].collect().toMap
      assert(reliable == local, s"reliable=$reliable local=$local")
    } finally spark.conf.unset(graft.operators.Checkpoints.DirKey)
  }

  test("per-iteration checkpoint blocks are freed (no storage growth)") {
    val edges = (0L until 50L).map(i => (i, (i * 7 + 1) % 50)).toDF("s", "d")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val ranks = PageRank.pageRank(edges, iters = 6)
    assert(ranks.count() == 50)
    // the session is shared across suites, so measure the DELTA: of the 7
    // rank checkpoints this run created, only the FINAL one (backing the
    // returned DataFrame) may still be pinned — plus the init checkpoint's
    // entry if the unpersist is asynchronous. 6 intermediates must be gone.
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.size <= 2,
      s"expected <=2 new persisted RDDs after pageRank, got ${added.size}")
  }
}
