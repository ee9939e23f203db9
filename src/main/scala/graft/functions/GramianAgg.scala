package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Final Gramian: the flat row-major dim×dim integer matrix plus its
  * dimension (cells(i*dim + j) = Σ_rows q_i · q_j).
  */
case class Gramian(dim: Int, cells: Array[Long])

/** Per-partition integer Gramian accumulator (VERDICT r13 task #1) —
  * the shuffle-shrinking rewrite of [[graft.operators.LinearAlgebra
  * .secondMoment]]'s double-`posexplode` form.
  *
  * The explode form generates dim² codegen rows PER VECTOR before the
  * map-side combine touches them: at production embedding dims
  * (1024–4096) that is 1M–16M short-lived rows per input row — a huge
  * constant factor over the inherent n·dim² multiply-adds. As a typed
  * `Aggregator` the inner loop is a plain `while` over two primitive
  * long arrays: each input partition reduces to ONE dim² buffer, the
  * exchange carries O(partitions) buffers instead of O(n·dim²) cell
  * rows, and the merge is elementwise adds.
  *
  * Semantics are IDENTICAL to the explode form for vectors of NON-NULL
  * elements (q273/q274 stay hash-green; GramianParitySpec pins
  * cell-for-cell equality). NULL ELEMENTS are outside that contract;
  * the measured divergence (pinned in GramianParitySpec) is narrower
  * than it looks: the `Seq[Long]` input encoder deserializes a null
  * element as 0L, so any cell with at least one non-null product gets
  * the SAME sum as the explode form (whose `sum` skips null products —
  * skipping and adding 0 agree), and only a cell whose EVERY product is
  * null diverges: explode emits NULL there, this Aggregator emits 0.
  * The null→0L decode is an encoder artifact, not a promise — a caller
  * with nullable elements must impute upstream (position-shifting null
  * removal would corrupt the index space).
  *
  * Remaining contract points:
  *  - integer products and order-insensitive integer sums — exact under
  *    any partitioning/merge order;
  *  - ragged inputs: the buffer grows to the longest vector seen, and a
  *    cell (i, j) exists in the output iff some row covered it — the
  *    longest row covers every cell of the final matrix, so emitting
  *    all dim² cells (zeros included) reproduces the explode form's
  *    group universe exactly;
  *  - empty input → dim 0 → zero output rows after the explode.
  *
  * Only the upper triangle (i ≤ j) is accumulated — the Gramian is
  * symmetric — and the mirror is filled once in `finish`, halving the
  * multiply work. Buffer memory is dim² longs per in-flight partial
  * (128 MB at dim 4096): the irreducible size of the answer itself,
  * held once per task rather than streamed as rows.
  */
case class GramianAgg() extends Aggregator[Seq[Long], Array[Long], Gramian] {

  override def zero: Array[Long] = Array.emptyLongArray

  private def dimOf(b: Array[Long]): Int =
    math.round(math.sqrt(b.length.toDouble)).toInt

  private def grow(b: Array[Long], newDim: Int): Array[Long] = {
    val oldDim = dimOf(b)
    if (newDim <= oldDim) b
    else {
      val nb = new Array[Long](newDim * newDim)
      var i = 0
      while (i < oldDim) {
        System.arraycopy(b, i * oldDim, nb, i * newDim, oldDim)
        i += 1
      }
      nb
    }
  }

  override def reduce(b0: Array[Long], v: Seq[Long]): Array[Long] = {
    val n = v.length
    if (n == 0) b0
    else {
      require(n <= (1 << 14),
        s"GramianAgg: vector has $n components > 2^14 — a dim² buffer " +
          "past this is no longer a sane single-task object")
      val b = grow(b0, n)
      val d = dimOf(b)
      val a = new Array[Long](n)
      var c = 0
      v.foreach { x => a(c) = x; c += 1 }
      var i = 0
      while (i < n) {
        val qi = a(i)
        if (qi != 0L) {
          val row = i * d
          var j = i
          while (j < n) { b(row + j) += qi * a(j); j += 1 }
        }
        i += 1
      }
      b
    }
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else {
      val (big, small) = if (x.length >= y.length) (x, y) else (y, x)
      val bd = dimOf(big)
      val sd = dimOf(small)
      var i = 0
      while (i < sd) {
        var j = i
        while (j < sd) { big(i * bd + j) += small(i * sd + j); j += 1 }
        i += 1
      }
      big
    }
  }

  override def finish(b: Array[Long]): Gramian = {
    val d = dimOf(b)
    var i = 1
    while (i < d) {
      var j = 0
      while (j < i) { b(i * d + j) = b(j * d + i); j += 1 }
      i += 1
    }
    Gramian(d, b)
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Gramian] = ExpressionEncoder()
}
