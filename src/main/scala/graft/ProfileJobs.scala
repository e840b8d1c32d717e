package graft

import org.apache.spark.scheduler._

/** Measurement helper (optimization rounds): run declared queries and
  * report DETERMINISTIC execution-shape metrics — job count, stage
  * count, task count, shuffle bytes/records read+written — via a
  * SparkListener. Wall-clock on a noisy host cannot adjudicate a
  * loop-shape change; these numbers can (a removed per-round exchange
  * is a removed stage and removed shuffle rows at ANY host speed).
  *
  * Usage: runMain graft.ProfileJobs <sfDir> q1 [q2 ...]
  * Prints one line per query:
  * `PROFILEJOBS <name> jobs=N stages=N tasks=N shufWriteMB=x shufRows=n sec=t`
  * (sf0.001 warm-up pass first, metrics reset between queries).
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = Sessions.get("graft-profilejobs")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var shufWrite = 0L
    @volatile var shufRead = 0L
    @volatile var shufRows = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs += 1
      override def onStageCompleted(
          s: SparkListenerStageCompleted): Unit = stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        val m = t.taskMetrics
        if (m != null) {
          shufWrite += m.shuffleWriteMetrics.bytesWritten
          shufRead += m.shuffleReadMetrics.totalBytesRead
          shufRows += m.shuffleWriteMetrics.recordsWritten
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      System.gc()
      Thread.sleep(300) // let queued listener events drain
      jobs = 0; stages = 0; tasks = 0
      shufWrite = 0L; shufRead = 0L; shufRows = 0L
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let queued listener events drain
      println(f"PROFILEJOBS $name jobs=$jobs stages=$stages " +
        f"tasks=$tasks shufWriteMB=${shufWrite / 1e6}%.1f " +
        f"shufRows=$shufRows sec=$sec%.3f")
    }
    spark.stop()
  }
}
