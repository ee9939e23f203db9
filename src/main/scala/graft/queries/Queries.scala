package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (when SQL-expressible)
  * an equivalent ANSI SQL string the driver runs in DuckDB over the same
  * parquet tables. Column names/aliases MUST match between the two.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)

  /** DuckDB `list_reduce` twin: left fold seeded with the FIRST element,
    * so operand order is identical on both engines — the bit-exact
    * cross-engine recipe used by the embedding queries (q73/q99/q146).
    * The 10000-element slice cap bounds any plausible vector dim; it
    * lives HERE so a future dim bump lands in one place.
    */
  def seededFold(
      arr: org.apache.spark.sql.Column,
      f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column =
        (a, x) => a + x): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{aggregate, element_at, slice}
    aggregate(slice(arr, 2, 10000), element_at(arr, 1), f)
  }

  /** Read one of the driver-generated test tables (TESTDATA.md).
    *
    * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * refuses to map to its µs TimestampType. All test values are µs-aligned
    * (verified across SFs), so we read nanos as long and convert losslessly.
    */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // integer division: the ns epoch exceeds 2^53, double math would round
      s.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    } else s.read.parquet(s"$dir/$name.parquet")
}
