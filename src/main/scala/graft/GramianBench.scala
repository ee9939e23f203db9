package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** VERDICT r14 task #7 — the Gramian accumulator at PRODUCTION dims.
  * The r14 micro-bench ran at dim 512; the buffer math says a partial
  * is dim² longs (32 MB at 2048, 128 MB at 4096) held once per task.
  * This main measures wall time and the EXECUTOR-REPORTED peak
  * execution memory per task at dim 2048 and 4096 (one partial per
  * input partition, 2 partitions), validating that the 2^14 refusal
  * boundary (2 GB/partial) is the right order of magnitude and that
  * production dims are comfortably inside it. Local tooling only — the
  * driver's gates never run it.
  *
  * Usage: runMain graft.GramianBench [dim ...] (default: 2048 4096)
  */
object GramianBench {
  def main(args: Array[String]): Unit = {
    val dims = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(2048, 4096)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // typed-Aggregator buffers are plain on-heap arrays, INVISIBLE to the
    // execution memory manager (taskMetrics.peakExecutionMemory reads 0
    // for them — measured) — so the honest memory evidence is the JVM
    // heap watermark across the job plus the exact buffer arithmetic,
    // not a tracked-memory counter that does not track this allocation.
    @volatile var peakHeap = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val rt = Runtime.getRuntime
        peakHeap = math.max(peakHeap, rt.totalMemory() - rt.freeMemory())
      }
    })

    dims.foreach { dim =>
      val rnd = new scala.util.Random(dim)
      // 64 vectors is enough: the cost driver is dim² cells per partial,
      // not row count — and row count scales linearly anyway
      val vecs = Seq.fill(64)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
        .toDF("v").repartition(2).cache()
      vecs.count()
      def run(): (Long, Long) = {
        System.gc()
        peakHeap = 0L
        val t0 = System.nanoTime()
        val n = graft.operators.LinearAlgebra.secondMoment(vecs, "v", 64).count()
        ((System.nanoTime() - t0) / 1000000, n)
      }
      run() // warm-up: JIT + codegen
      val (ms, cells) = run()
      val bufMb = dim.toLong * dim * 8 / (1024 * 1024)
      println(f"GRAMIAN dim=$dim%d cells=$cells%d wall=${ms}%d ms " +
        f"bufferPerPartial=${bufMb}%d MB (2 partials + merge in flight) " +
        f"peakHeap=${peakHeap / 1024 / 1024}%d MB")
      vecs.unpersist()
    }
    spark.stop()
  }
}
