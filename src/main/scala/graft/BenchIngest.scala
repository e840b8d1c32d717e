package graft

/** Ingest-only throughput re-stamp in a fresh JVM — the r15 verdict's
  * watch item: the suite bench read 89.2k blocks/s vs r14's 110.1k
  * with NO ingest-path code change, so the question is host noise vs
  * real. This runs [[Bench.ingestThroughput]] — the exact suite
  * probe, same warmup protocol — without the 200-query suite ahead of
  * it, so its heap/page-cache state is clean and repeatable.
  *
  * Usage: runMain graft.BenchIngest [runs]   (default 3)
  */
object BenchIngest {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val spark = Sessions.get("graft-bench-ingest")
    val bps = Bench.ingestThroughput(spark, runs)
    println(f"""{"metric":"ingest_blocks_per_sec","value":$bps%.0f}""")
    spark.stop()
  }
}
