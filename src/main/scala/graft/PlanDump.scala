package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Measurement helper (optimization rounds): dump `explain("formatted")`
  * for a set of declared queries to files in one JVM, so plan evidence
  * (`plans/rNN/<query>_{before,after}.txt`) does not pay one sbt+Spark
  * startup per query.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> [q1 q2 ...]
  * (no names = every declared query). Writes <outDir>/<name>_<suffix>.txt.
  * Queries whose construction itself runs jobs (lakehouse directory
  * kernels, iterative loops with localCheckpoint) pay that construction
  * here; the dumped plan is the final frame's — the same thing
  * DebugMain --plan shows.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    Files.createDirectories(Paths.get(outDir))
    val spark = Sessions.get("graft-plandump")
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
          txt.getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        println(s"[plandump] wrote $name")
      } catch {
        case e: Throwable =>
          println(s"[plandump] FAILED $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
