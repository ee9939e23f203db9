package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** jaro_winkler(a, b) → DOUBLE — Jaro-Winkler similarity, the standard
  * record-linkage scorer (Winkler 1990) completing the entity-resolution
  * toolkit beside bounded edit distance: transposition-tolerant, with a
  * prefix boost that rewards agreeing name stems.
  *
  * PINNED to the canonical parameterization so DuckDB's built-in
  * `jaro_winkler_similarity` is a bit-compatible oracle (probed, not
  * assumed): scaling p = 0.1, prefix ℓ ≤ 4, boost only when the Jaro
  * score exceeds 0.7, and EMPTY-string convention 0.0 (even for two
  * empties — DuckDB's choice; some libraries say 1.0). Comparison is
  * per UTF-16 code unit — identical to byte-wise for ASCII; the test
  * fixtures are ASCII (documented seam, as the tokenizers').
  *
  * One static call per row inside whole-stage codegen; O(|a|·|b|) per
  * pair like every Jaro implementation — pair generation must be
  * blocked/banded upstream (this scores candidates, it never generates
  * them).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires (STRING, STRING), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.functions.JaroWinkler.similarity($a.toString(), $b.toString());"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static per-row entry shared by eval and generated code. */
  def similarity(s1: String, s2: String): Double = {
    val n1 = s1.length
    val n2 = s2.length
    if (n1 == 0 || n2 == 0) return 0.0
    // match window: chars count as matching within this distance
    val window = math.max(0, math.max(n1, n2) / 2 - 1)
    val m1 = new Array[Boolean](n1)
    val m2 = new Array[Boolean](n2)
    var matches = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars out of relative order, halved
    var t = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / n1 + m / n2 + (m - t / 2) / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      while (l < math.min(4, math.min(n1, n2)) && s1.charAt(l) == s2.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }
}
