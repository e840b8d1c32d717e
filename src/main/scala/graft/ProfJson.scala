package graft
import org.apache.spark.sql.functions._
import graft.ingest.{Decode, SampleBlocks}
object ProfJson {
  def main(a: Array[String]): Unit = {
    val spark = Sessions.get("prof")
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"$n%-28s ${(System.nanoTime()-t0)/1e9}%.2f s  rows=$c")
    }
    val blocks = SampleBlocks.blocksDF(spark, 100000).persist()
    time("materialize blocks")(blocks.count())
    for (_ <- 1 to 3)
      time("decode 100k")(Decode.mainFromDecoded(Decode.decoded(blocks, SampleBlocks.output))
        .select(sum(length(col("block_hash")))).count())
    spark.stop()
  }
}
