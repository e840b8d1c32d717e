package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ingest.{ProtoWire, SampleBlocks}

/** `format("graft.sources.BlockStreamProvider")` — a DataSource V2
  * MicroBatchStream standing in for the reference's Substreams gRPC block
  * source (SURVEY.md §2.A#1; run.go:100-108). This environment has zero
  * egress, so the "endpoint" is a deterministic simulated chain; the
  * offset/batch/finality mechanics are exactly what a live gRPC
  * implementation would keep, with only the fetch swapped out.
  *
  * Options:
  *  - `numBlocks`       total chain length to emit (default 100)
  *  - `blocksPerBatch`  head advance per micro-batch (default 10)
  *  - `confirmations`   finality lag K: only blocks ≤ head−K are exposed
  *                      (the SOURCE-side undo buffer of SURVEY.md §7.6 —
  *                      downstream never sees a reorg)
  *  - `reorgs`          simulated reorg schedule "head:depth[,head:depth]"
  *                      — when the head first passes `head`, blocks in
  *                      (head−depth, head] are re-mined with new ids
  *
  * Emitted schema matches the pipeline contract:
  * (block_number long, block_id string, payload binary), payload being a
  * wire-encoded SampleBlocks.Output message.
  */
class BlockStreamProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BlockStreamSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BlockStreamTable(new CaseInsensitiveStringMap(properties))
}

object BlockStreamSource {
  val schema: StructType = StructType(Seq(
    StructField("block_number", LongType, nullable = false),
    StructField("block_id", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Reorg generation of block n under a schedule of (head, depth)
    * entries: each reorg re-mines blocks in (head−depth, head]. */
  def generation(n: Long, reorgs: Seq[(Long, Int)]): Int =
    reorgs.count { case (h, d) => h - d < n && n <= h }

  def blockId(n: Long, gen: Int): String =
    if (gen == 0) s"0xb$n" else s"0xb${n}_r$gen"
}

private[sources] class BlockStreamTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "block_stream_sim"
  override def schema(): StructType = BlockStreamSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = BlockStreamSource.schema
        override def toMicroBatchStream(checkpointLocation: String)
            : MicroBatchStream = new BlockMicroBatchStream(options)
      }
    }
}

private[sources] case class BlockOffset(exposed: Long) extends Offset {
  override def json(): String = exposed.toString
}

private[sources] class BlockMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val numBlocks = options.getLong("numBlocks", 100L)
  private val blocksPerBatch = options.getLong("blocksPerBatch", 10L)
  private val confirmations = options.getLong("confirmations", 0L)
  private val reorgs: Seq[(Long, Int)] =
    Option(options.get("reorgs")).filter(_.nonEmpty).toSeq
      .flatMap(_.split(',').toSeq.map { s =>
        val Array(h, d) = s.split(':'); (h.toLong, d.toInt)
      })

  // simulated chain head; advances per latestOffset() poll like a live
  // endpoint delivering blocks while we were away
  private var head = 0L

  override def initialOffset(): Offset = BlockOffset(0L)

  /** Trigger.AvailableNow: drain the whole (simulated) chain — advance
    * the head to the end so the final exposed offset covers everything. */
  override def prepareForTriggerAvailableNow(): Unit =
    head = numBlocks + confirmations

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is used")

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = {
    head = math.min(head + blocksPerBatch, numBlocks + confirmations)
    // only finalized blocks are exposed: reorgs (bounded by K) can never
    // touch them, so downstream stays reorg-free (SURVEY.md §7.6)
    BlockOffset(math.max(0L, math.min(head - confirmations, numBlocks)))
  }

  override def deserializeOffset(json: String): Offset =
    BlockOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val from = start.asInstanceOf[BlockOffset].exposed // exclusive
    val until = end.asInstanceOf[BlockOffset].exposed  // inclusive
    if (until <= from) Array.empty
    else Array(BlockRangePartition(from + 1, until + 1, reorgs))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new BlockRangeReader(p.asInstanceOf[BlockRangePartition])
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class BlockRangePartition(
    fromBlock: Long, untilBlock: Long, reorgs: Seq[(Long, Int)])
    extends InputPartition

private[sources] class BlockRangeReader(p: BlockRangePartition)
    extends PartitionReader[InternalRow] {
  private var n = p.fromBlock - 1

  override def next(): Boolean = { n += 1; n < p.untilBlock }

  override def get(): InternalRow = {
    // block numbering is 1-based on the wire; payload content keyed by n
    val gen = BlockStreamSource.generation(n, p.reorgs)
    val row = new GenericInternalRow(3)
    row.update(0, n)
    row.update(1, UTF8String.fromString(BlockStreamSource.blockId(n, gen)))
    row.update(2, ProtoWire.encode(SampleBlocks.output,
      SampleBlocks.samplePayload(n)))
    row
  }

  override def close(): Unit = ()
}
