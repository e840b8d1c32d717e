package graft

import java.nio.file.Files

import graft.ingest.{Decode, RangePartitioner, RangeSink, SampleBlocks}

/** Developer tool: time the ingest path (decode → explode → range sink)
  * in isolation — the same workload Bench reports as
  * `ingest_blocks_per_sec`. `args`: [nBlocks] [runs]. */
object ProfileIngest {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-ingest")
    val nBlocks = args.headOption.map(_.toLong).getOrElse(100000L)
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val blocks = SampleBlocks.blocksDF(spark, nBlocks).persist()
    blocks.count()
    for (r <- 1 to runs) {
      val root = Files.createTempDirectory("prof-ingest").toString
      val pt = RangePartitioner(start = 0, size = 5000)
      val t0 = System.nanoTime()
      val dec = Decode.decoded(blocks, SampleBlocks.output).persist()
      dec.count()
      val tDecode = (System.nanoTime() - t0) / 1e9
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val fields = graft.ingest.ProtoSchema.explodableFields(SampleBlocks.output)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(1 + fields.size)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try {
        val jobs = Future {
          RangeSink(s"$root/main", pt).writeAll(Decode.mainFromDecoded(dec))
        } +: fields.map { f => Future {
          RangeSink(s"$root/${f.name}", pt)
            .writeAll(Decode.childFromDecoded(dec, f))
        }}
        Await.result(Future.sequence(jobs), Duration.Inf)
      } finally pool.shutdown()
      dec.unpersist()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"ingest run$r ${sec}%.3f s  ${nBlocks / sec}%.0f blocks/s" +
        f"  (decode+cache ${tDecode}%.3f s, sinks ${sec - tDecode}%.3f s)")
    }
    spark.stop()
  }
}
