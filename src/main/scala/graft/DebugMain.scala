package graft

/** Dev helper: run one declared query (or `entry`) and show rows + plan.
  * Usage: runMain graft.DebugMain <queryName|entry> [sfDir] [--plan]
  */
object DebugMain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("entry")
    val d = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val s = Sessions.get("graft-debug")
    try {
      val df =
        if (name == "entry") SparkEntry.entry(s)
        else SparkEntry.queries(name)(s, d)
      if (args.contains("--plan")) df.explain("formatted")
      val outIdx = args.indexOf("--out")
      if (outIdx >= 0 && outIdx + 1 < args.length) {
        df.coalesce(1).write.mode("overwrite")
          .parquet(s"${args(outIdx + 1)}/$name")
        // oracle_sql.json alongside, so tools/check.py can compare a
        // single query without a full Verify pass (dev loop only)
        Verify.writeOracleJson(args(outIdx + 1))
      }
      df.show(20, truncate = false)
      println(s"[debug] $name rows=${df.count()}")
    } catch { case e: Throwable => e.printStackTrace() }
    s.stop()
  }
}
