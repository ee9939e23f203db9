package graft
import org.apache.spark.sql.SparkSession
object BloomDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    try {
      val df = SparkEntry.queries("q102_bloom_pruned_join")(spark, "/root/testdata/sf0.001")
      df.show(5)
    } catch { case e: Throwable => e.printStackTrace() }
    spark.stop()
  }
}
