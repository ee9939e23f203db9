package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def stats(edges: Seq[(java.lang.Long, java.lang.Long)]) =
    Graph.triangleStats(edges.toDF("s", "d"), "s", "d")
      .as[(Long, Long, Long, Long, Double)].collect().head

  test("K4 plus a pendant: known census on a hand-checkable graph") {
    // K4 on {1,2,3,4} (4 triangles, every wedge closed) + pendant 5-1.
    // degs: 1->4, 2/3/4->3, 5->1; wedges = C(4,2)+3*C(3,2)+0 = 6+9 = 15.
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield
      (Long.box(a), Long.box(b))
    val (nodes, edges, wedges, tris, trans) = stats(k4 :+ ((Long.box(5L), Long.box(1L))))
    assert((nodes, edges, wedges, tris) == ((5L, 7L, 15L, 4L)))
    assert(trans == 0.8) // 3*4/15
  }

  test("canonicalization: duplicates, reversed edges, loops, nulls collapse") {
    val messy = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (2L, 1L), (1L, 2L), // one undirected edge, three spellings
      (2L, 3L), (3L, 1L),
      (4L, 4L),                      // self loop: dropped
      (null, 9L), (9L, null))        // null endpoints: dropped
    val und = Graph.canonicalEdges(messy.toDF("x", "y"), "x", "y")
      .as[(Long, Long)].collect().toSet
    assert(und == Set((1L, 2L), (2L, 3L), (1L, 3L)))
    val (nodes, edges, wedges, tris, trans) = stats(messy)
    assert((nodes, edges, wedges, tris) == ((3L, 3L, 3L, 1L)))
    assert(trans == 1.0)
  }

  test("triangle-free graphs count zero (bipartite ring)") {
    // 6-cycle = bipartite: wedges exist, no triangle closes
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 1L))
      .map { case (a, b) => (Long.box(a), Long.box(b)) }
    val (_, _, wedges, tris, trans) = stats(ring)
    assert(wedges == 6L && tris == 0L && trans == 0.0)
  }

  test("wedge-free graph (perfect matching): transitivity is NULL, not 0/0") {
    val matching = Seq((1L, 2L), (3L, 4L)).map { case (a, b) =>
      (Long.box(a), Long.box(b)) }
    val row = Graph.triangleStats(matching.toDF("s", "d"), "s", "d")
      .collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((4L, 2L, 0L, 0L)))
    assert(row.isNullAt(4), "transitivity must be NULL on zero wedges")
  }

  test("matches a brute-force count on a pseudo-random graph") {
    // deterministic LCG edge set over 12 nodes — dense enough for many
    // triangles, including degree ties (orientation tiebreak coverage)
    var x = 7L
    def next(): Long = { x = (x * 1103515245L + 12345L) % (1L << 31); x }
    val raw = (1 to 60).map(_ => (next() % 12, next() % 12))
    val und = raw.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val brute = (for {
      (a, b) <- und; (c, d) <- und if c == b
      if und.contains((math.min(a, d), math.max(a, d))) && a < b && b < d
    } yield 1).size
    val (_, edges, _, tris, _) =
      stats(raw.map { case (a, b) => (Long.box(a), Long.box(b)) })
    assert(edges == und.size.toLong)
    assert(tris == brute.toLong, s"expected $brute triangles")
  }

  // ------------------------------------------------------------ k-core

  /** Brute-force peel: drop sub-k nodes one round at a time. */
  private def bruteKCore(edges: Set[(Long, Long)], k: Int): Map[Long, Int] = {
    var e = edges
    var changed = true
    while (changed) {
      val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= k).keySet
      val e2 = e.filter(p => keep(p._1) && keep(p._2))
      changed = e2 != e
      e = e2
    }
    e.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.size).toMap
  }

  test("kCore equals brute-force peeling on random graphs, across k") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 8) {
      val n = 30
      val raw = (1 to 120).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val und = raw.filter(p => p._1 != p._2)
        .map(p => (p._1 min p._2, p._1 max p._2)).toSet
      for (k <- Seq(2, 3, 5)) {
        val got = graft.operators.Graph.kCore(
            raw.toDF("s", "d"), "s", "d", k)
          .as[(Long, Long)].collect().map { case (v, deg) => v -> deg.toInt }.toMap
        assert(got == bruteKCore(und, k), s"trial $trial k=$k")
      }
    }
  }

  test("kCore hand cases: a cycle is its own 2-core, a path has none; chain cascade") {
    val cycle = (0L until 6L).map(i => (i, (i + 1) % 6))
    val gotCycle = graft.operators.Graph.kCore(cycle.toDF("s", "d"), "s", "d", 2)
      .as[(Long, Long)].collect().toMap
    assert(gotCycle == (0L until 6L).map(_ -> 2L).toMap)
    val path = (0L until 6L).map(i => (i, i + 1))
    assert(graft.operators.Graph.kCore(path.toDF("s", "d"), "s", "d", 2).isEmpty)
    // the path peels one endpoint pair per round — a deep cascade that
    // must trip a too-small round bound LOUDLY
    val e = intercept[IllegalStateException](
      graft.operators.Graph.kCore(path.toDF("s", "d"), "s", "d", 2, maxRounds = 1))
    assert(e.getMessage.contains("did not converge"), e.getMessage)
  }

  test("bfsDistances: path graph, single source, bounded depth") {
    val path = (1L until 5L).map(i => (i, i + 1)) // 1-2-3-4-5
    val got = Graph.bfsDistances(path.toDF("s", "d"), "s", "d",
      Seq(1L).toDF("n"), "n", maxDepth = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L)) // 5 is absent
  }

  test("bfsDistances: multi-source takes the nearest source; depth 0 is sources only") {
    val path = (1L until 5L).map(i => (i, i + 1))
    val got = Graph.bfsDistances(path.toDF("s", "d"), "s", "d",
      Seq(1L, 5L).toDF("n"), "n", maxDepth = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
    val zero = Graph.bfsDistances(path.toDF("s", "d"), "s", "d",
      Seq(3L).toDF("n"), "n", maxDepth = 0)
      .as[(Long, Long)].collect().toMap
    assert(zero == Map(3L -> 0L))
  }

  test("bfsDistances: cycle never revisits; early-out on exhausted frontier") {
    val cycle = (0L until 6L).map(i => (i, (i + 1) % 6))
    // depth 10 >> diameter 3: frontier empties, distances are shortest arcs
    val got = Graph.bfsDistances(cycle.toDF("s", "d"), "s", "d",
      Seq(0L).toDF("n"), "n", maxDepth = 10)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 5L -> 1L, 2L -> 2L, 4L -> 2L, 3L -> 3L))
  }

  test("labelPropagation: two triangles with a bridge settle into two communities") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L))
    val got = Graph.labelPropagation(edges.toDF("s", "d"), "s", "d", rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("labelPropagation: round-by-round trace matches the synchronous min-tie rule") {
    // hand-traced round 1 of the same graph: every node adopts the
    // smallest among its neighbours' (all-distinct) labels
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L))
    val r1 = Graph.labelPropagation(edges.toDF("s", "d"), "s", "d", rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 4L, 6L -> 4L))
    // rounds = 0 is the identity labelling
    val r0 = Graph.labelPropagation(edges.toDF("s", "d"), "s", "d", rounds = 0)
      .as[(Long, Long)].collect().toMap
    assert(r0 == (1L to 6L).map(v => v -> v).toMap)
  }

  test("shortestPaths: weighted distances beat hop-count paths; parallel edges take the min") {
    // 0-1 (w 10) vs 0-2-1 (w 1+2=3): the 2-hop path must win; the
    // duplicated 0-2 edge (w 5) must lose to its w 1 twin
    val edges = Seq((0L, 1L, 10L), (0L, 2L, 1L), (0L, 2L, 5L),
      (2L, 1L, 2L), (1L, 3L, 1L))
    val got = Graph.shortestPaths(edges.toDF("s", "d", "w"), "s", "d", "w",
        Seq(0L).toDF("n"), "n", maxRounds = 10)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 2L -> 1L, 1L -> 3L, 3L -> 4L))
  }

  test("shortestPaths: early fixpoint exit equals the full round count; bounded rounds are partial") {
    val chain = (0L until 8L).map(i => (i, i + 1, 2L))
    def run(r: Int) = Graph.shortestPaths(chain.toDF("s", "d", "w"),
        "s", "d", "w", Seq(0L).toDF("n"), "n", maxRounds = r)
      .as[(Long, Long)].collect().toMap
    // diameter 8: fixpoint at round 8, and a huge budget changes nothing
    assert(run(8) == run(50))
    assert(run(50) == (0L to 8L).map(i => i -> 2 * i).toMap)
    // 3 rounds: exactly the 3-hop horizon is settled
    assert(run(3) == (0L to 3L).map(i => i -> 2 * i).toMap)
  }

  test("shortestPaths: negative weights and negative rounds refuse loudly") {
    val e = intercept[IllegalArgumentException](
      Graph.shortestPaths(Seq((0L, 1L, -1L)).toDF("s", "d", "w"),
        "s", "d", "w", Seq(0L).toDF("n"), "n", maxRounds = 3))
    assert(e.getMessage.contains("negative"))
    intercept[IllegalArgumentException](
      Graph.shortestPaths(Seq((0L, 1L, 1L)).toDF("s", "d", "w"),
        "s", "d", "w", Seq(0L).toDF("n"), "n", maxRounds = -1))
  }
}
