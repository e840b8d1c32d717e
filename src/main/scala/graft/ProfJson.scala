package graft
import org.apache.spark.sql.functions._
object ProfJson {
  def main(a: Array[String]): Unit = {
    val spark = Sessions.get("prof")
    val d = "/root/testdata/sf0.1"
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"$n%-28s ${(System.nanoTime()-t0)/1e9}%.2f s  rows=$c")
    }
    time("warm docs")(Tables.documents(spark, d).count())
    for (_ <- 1 to 2)
      time("q_minhash_neardup")(SparkEntry.queries("q_minhash_neardup")(spark, d).count())
    spark.stop()
  }
}
