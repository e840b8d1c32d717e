package graft

/** Developer tool: time individual declared queries at a chosen SF.
  * `java -cp classes:spark-jars graft.ProfileQ [sfDir] [query ...]` —
  * warm-up pass at sf0.001 (same policy as Bench), then 3 timed runs
  * each. Not part of the driver contract; used to chase bench outliers.
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    for (n <- names; r <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sf).count()
      println(f"$n run$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
