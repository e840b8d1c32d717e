package graft

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}

import graft.ingest.{DescriptorSet, ParquetTuning, RangePartitioner, SampleBlocks, StoreProbe}
import graft.streaming.BlockPipeline

/** The reference's CLI surface (main.go:19-22: `run` + `setup`),
  * Spark-first:
  *
  *   run <blocksDir> <outRoot> [--explode] [--partition-size N]
  *       [--start N] [--compression C] [--checkpoint DIR]
  *     consume a block-parquet directory as a stream (the file source
  *     stands in for the gRPC endpoint — SURVEY.md §7.3), decode, fan
  *     out main + child tables, land range-named parquet. Resumable:
  *     re-running with the same --checkpoint continues where it left
  *     off (cursor parity, SURVEY.md §2.A#17).
  *   setup <store_url>
  *     write/read/compare/delete probe (setup.go:31-66).
  *
  * Flag defaults mirror run.go: partition size 5000 (run.go:40), zstd
  * (run.go:43).
  */
object CliMain {

  private val blockSchema = StructType(Seq(
    StructField("block_number", LongType),
    StructField("block_id", StringType),
    StructField("payload", BinaryType)))

  def main(args: Array[String]): Unit = args.toList match {
    case "setup" :: url :: Nil =>
      val r = StoreProbe.probe(url)
      println(s"${if (r.ok) "OK" else "FAIL"}: ${r.detail}")
      if (!r.ok) sys.exit(1)
    case "run" :: blocksDir :: outRoot :: flags =>
      def flagVal(name: String): Option[String] =
        flags.dropWhile(_ != name).drop(1).headOption
      val pt = RangePartitioner(
        start = flagVal("--start").map(_.toLong).getOrElse(0L),
        size = flagVal("--partition-size").map(_.toLong).getOrElse(5000L))
      val tuning = ParquetTuning(
        compression = flagVal("--compression").getOrElse("zstd"),
        compressionLevel = flagVal("--compression-level").map(_.toInt))
      val checkpoint = flagVal("--checkpoint")
        .getOrElse(s"$outRoot/_checkpoint")
      // Manifest-driven schema (factory.go:183 / converter_proto.go:24-45):
      // a FileDescriptorSet (protoc --descriptor_set_out) or substreams
      // .spkg names the output message; without one the built-in sample
      // schema stands in (SURVEY.md §7.3).
      val schema = (flagVal("--descriptor-set"), flagVal("--message")) match {
        case (Some(ds), Some(m)) => DescriptorSet.load(ds, m)
        case (Some(_), None) | (None, Some(_)) =>
          System.err.println("--descriptor-set and --message go together")
          sys.exit(2)
        case _ => SampleBlocks.output
      }
      // only stop a session this command created — under tests (or an
      // embedding app) the session is shared and outlives the command
      val reused =
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
      val spark = Sessions.get("graft-run")
      val blocks = spark.readStream.schema(blockSchema).parquet(blocksDir)
      val q = BlockPipeline.start(blocks, schema, outRoot, pt,
        checkpoint, explode = flags.contains("--explode"),
        trigger = Trigger.AvailableNow(), tuning = tuning)
      q.processAllAvailable()
      q.stop()
      if (!reused) spark.stop()
    case _ =>
      System.err.println(
        """usage:
          |  graft.CliMain run <blocksDir> <outRoot> [--explode]
          |    [--partition-size N] [--start N] [--compression C]
          |    [--checkpoint DIR] [--descriptor-set F --message M]
          |    [--compression-level N]
          |  graft.CliMain setup <store_url>""".stripMargin)
      sys.exit(2)
  }
}
