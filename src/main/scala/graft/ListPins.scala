package graft

object ListPins {
  def main(args: Array[String]): Unit = {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    println(s"DECLARED=${qs.size} ORACLED=${os.size}")
    println("PINS:")
    (qs -- os).toSeq.sorted.foreach(println)
  }
}
