package graft

import graft.operators.Layout

/** [[Layout.hilbert16]] — the Column walk equals the scalar walk, the
  * curve is a bijective space-filling curve with unit-step adjacency
  * (the property Morton lacks), and Hilbert clustering yields per-file
  * bounding boxes no looser than z-order's on a grid.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("hilbert16Scala is a bijection with unit grid steps on a 64x64 subgrid") {
    // scale a 64x64 grid into the high bits so all 16 levels execute:
    // (x,y) -> (x*1024, y*1024) visits cells whose relative order and
    // adjacency mirror a 64-level curve
    val n = 64
    val d2xy = (for (x <- 0 until n; y <- 0 until n)
      yield Layout.hilbert16Scala(x * 1024L, y * 1024L) -> (x, y)).toMap
    assert(d2xy.size == n * n, "distances collide — not a bijection")
    val byD = d2xy.toSeq.sortBy(_._1).map(_._2)
    for (Seq((x1, y1), (x2, y2)) <- byD.sliding(2))
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent consecutive cells ($x1,$y1)->($x2,$y2)")
  }

  test("hilbert16 Column walk equals the scalar walk, including edge coords") {
    val rnd = new scala.util.Random(5)
    val coords = Seq((0L, 0L), (65535L, 65535L), (0L, 65535L), (65535L, 0L),
      (32768L, 32767L)) ++ (1 to 200).map(_ =>
      (rnd.nextLong(65536L), rnd.nextLong(65536L)))
    val df = coords.toDF("x", "y")
    val got = Layout.hilbert16(df, "x", "y", "hd")
      .select("x", "y", "hd").as[(Long, Long, Long)].collect()
    for ((x, y, hd) <- got)
      assert(hd == Layout.hilbert16Scala(x, y), s"($x,$y)")
  }

  test("hilbert vs morton: file bounding boxes from contiguous ranges stay no looser") {
    // 4096 grid cells in the high bits, chopped into 16 contiguous
    // "files" by each curve's order; a file's cost to a min/max pruner
    // is its bounding-box area. Hilbert's total area must not exceed
    // Morton's (locality is the entire point of paying for the walk).
    val n = 64
    val cells = for (x <- 0 until n; y <- 0 until n) yield (x, y)
    def totalArea(key: (Int, Int) => Long): Long =
      cells.sortBy { case (x, y) => key(x, y) }.grouped(cells.size / 16).map { f =>
        val xs = f.map(_._1); val ys = f.map(_._2)
        (xs.max - xs.min + 1).toLong * (ys.max - ys.min + 1).toLong
      }.sum
    val hil = totalArea((x, y) => Layout.hilbert16Scala(x * 1024L, y * 1024L))
    def morton(x: Int, y: Int): Long =
      (0 until 16).map(i => (((x >> i) & 1).toLong << (2 * i)) |
        (((y >> i) & 1).toLong << (2 * i + 1))).reduce(_ | _)
    val mor = totalArea((x, y) => morton(x * 1024, y * 1024))
    assert(hil <= mor, s"hilbert total bbox area $hil vs morton $mor")
  }
}
