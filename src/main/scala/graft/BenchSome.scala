package graft

/** Measurement helper (optimization rounds): time a SUBSET of declared
  * queries in one JVM with [[Bench]]'s per-query protocol (sf0.001
  * warm-up pass, System.gc() between queries, min AND median of N
  * runs). One line per query: `BENCHSOME <name> <min> <median>`.
  *
  * Usage: runMain graft.BenchSome <sfDir> <runs> q1 [q2 ...]
  *
  * For iterating on a handful of targets this amortizes the ~40 s
  * JVM+Spark startup one BenchOne per query would pay; the official
  * before/after stamps still come from [[BenchOne]] fresh JVMs (the
  * adjudication protocol) and the full [[Bench]] suite.
  */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = Sessions.get("graft-bench-some")
    def median(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      System.gc()
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      (name, ts.min, median(ts))
    }
    spark.stop()
    results.foreach { case (n, mn, md) =>
      println(f"BENCHSOME $n $mn%.3f $md%.3f")
    }
  }
}
