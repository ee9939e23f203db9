package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared one-session-per-suite base. Small parallelism + shuffle counts:
  * these are semantic tests, not perf tests.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = {
    // one shared local session across suites; don't stop it per-suite
    super.afterAll()
  }

  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
}
