package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared measurement harness for the diagnostic probe tools: a
  * process-wide shuffle-write-bytes listener plus the timed-block
  * protocol (300 ms settle, wall + rows + MiB shuffled per labelled
  * block — pass 2 of a REPEAT loop is the steady reading). One
  * implementation so a protocol change (e.g. adding shuffle-read bytes)
  * cannot silently diverge across probes; TrussProbe predates this
  * object and carries the original inline copy its published numbers
  * were measured with. */
final class ProbeHarness(spark: SparkSession, tag: String) {
  private val shuffled = new java.util.concurrent.atomic.AtomicLong
  spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      if (te.taskMetrics != null)
        shuffled.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
  })

  /** Time `f` (a block returning its row count), print wall + shuffle. */
  def timed(label: String)(f: => Long): Unit = {
    Thread.sleep(300); shuffled.set(0)
    val t0 = System.nanoTime(); val r = f
    Thread.sleep(300)
    println(f"[$tag] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
      f"($r rows, ${shuffled.get() / 1048576.0}%.1f MiB shuffled)")
  }
}
