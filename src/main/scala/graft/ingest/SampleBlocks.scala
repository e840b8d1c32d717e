package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

import ProtoSchema._

/** Sample block-stream schema + generator (FIXTURES.md §B): the test
  * message mirrors a typical substreams output module and exercises every
  * branch of the schema walker and wire codec. Shared by the ScalaTest
  * fixtures and the ingest throughput bench.
  */
object SampleBlocks {

  val meta: PMessage = PMessage("Meta", Seq(
    PField(1, "seconds", PInt64),
    PField(2, "nanos", PInt32)))

  val transfer: PMessage = PMessage("Transfer", Seq(
    PField(1, "from", PString, encoding = ELenDelim),
    PField(2, "to", PString, encoding = ELenDelim),
    PField(3, "amount", PUInt64),
    PField(4, "log_index", PInt32),
    PField(5, "kind", PEnum),
    PField(6, "topics", PBytes, repeated = true, encoding = ELenDelim)))

  val output: PMessage = PMessage("Output", Seq(
    PField(1, "block_hash", PString, encoding = ELenDelim),
    PField(2, "gas_used", PUInt64),
    PField(3, "transfers", transfer, repeated = true, encoding = ELenDelim),
    PField(4, "touched_accounts", PString, repeated = true, encoding = ELenDelim),
    PField(5, "balances", PMap(PString, PInt64), encoding = ELenDelim),
    PField(6, "meta", meta, encoding = ELenDelim)))

  /** A representative block payload value-map for the encoder. */
  def samplePayload(i: Long): Map[String, Any] = Map(
    "block_hash" -> s"0xhash$i",
    "gas_used" -> BigInt(i) * 1000000,
    "transfers" -> (0 until (i % 3).toInt).map(j => Map(
      "from" -> s"0xfrom${i}_$j",
      "to" -> s"0xto${i}_$j",
      "amount" -> BigInt(j + 1) * 10,
      "log_index" -> j,
      "kind" -> (j % 3),
      "topics" -> Seq(Array[Byte](1, 2), Array[Byte](3)))),
    "touched_accounts" -> Seq(s"0xacct${i}a", s"0xacct${i}b"),
    "balances" -> Map(s"0xacct${i}b" -> (i * 2), s"0xacct${i}a" -> i),
    "meta" -> Map("seconds" -> (1700000000L + i), "nanos" -> (i * 7 % 1000).toInt))

  /** Distributed block generator: blocks encoded ON THE EXECUTORS (the
    * driver never holds the stream), as a batch DataFrame with the
    * pipeline's input contract (block_number, block_id, payload). */
  def blocksDF(spark: SparkSession, n: Long, startBlock: Long = 0L): DataFrame = {
    import spark.implicits._
    spark.range(startBlock, startBlock + n)
      .map { i =>
        (i, s"0xblock$i", ProtoWire.encode(output, samplePayload(i)))
      }
      .toDF("block_number", "block_id", "payload")
  }
}
