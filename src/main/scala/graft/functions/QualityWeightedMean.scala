package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate (SURVEY.md §2.4): quality-weighted mean of a
  * telemetry value — readings with higher OPC quality dominate; zero-weight
  * groups yield null. The reference carries quality per value
  * (/root/reference/OPC2MongoDB/Program.cs:81) but never aggregates it;
  * this is the natural analytics extension.
  *
  * `Aggregator[IN, BUF, OUT]` gets full map-side partial aggregation: the
  * shuffle carries one (sum, weight) pair per key per partition — the same
  * O(distinct keys) bound as the built-in aggregates.
  */
object QualityWeightedMean extends Aggregator[(Double, Int), (Double, Double), Option[Double]] {

  override def zero: (Double, Double) = (0.0, 0.0)

  override def reduce(b: (Double, Double), in: (Double, Int)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)

  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(r: (Double, Double)): Option[Double] =
    if (r._2 == 0.0) None else Some(r._1 / r._2)

  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)

  override def outputEncoder: Encoder[Option[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
