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

/** `format("graft.sources.BlockStreamProvider")` — a DataSource V2
  * MicroBatchStream over a pluggable [[BlockClient]] (SURVEY.md §2.A#1;
  * run.go:100-108). The stream owns offsets, batching and finality
  * policy; the client owns the wire — a live Substreams gRPC client is a
  * drop-in [[BlockClientFactory]], and the default is the deterministic
  * simulated chain (zero-egress env).
  *
  * Options:
  *  - `client`          FQCN of a [[BlockClientFactory]] (default
  *                      [[SimChainClientFactory]]); receives the whole
  *                      option map — endpoint/network/manifest options
  *                      for a live client live here too
  *  - `confirmations`   finality lag K: only blocks ≤ head−K are exposed
  *                      (the SOURCE-side undo buffer of SURVEY.md §7.6 —
  *                      downstream never sees a reorg)
  *  - sim-client options: `numBlocks` chain length (default 100),
  *    `blocksPerBatch` head advance per poll (default 10), `reorgs`
  *    "head:depth[,head:depth]" re-mine schedule
  *
  * Emitted schema matches the pipeline contract:
  * (block_number long, block_id string, payload binary), payload being a
  * wire-encoded output message.
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

private[sources] object BlockClients {
  /** Instantiate the configured factory by FQCN (zero-arg ctor) — runs on
    * the driver for head polling and on each executor task for fetch. */
  def create(factoryClass: String, options: Map[String, String]): BlockClient =
    Class.forName(factoryClass).getDeclaredConstructor().newInstance()
      .asInstanceOf[BlockClientFactory].create(options)
}

private[sources] class BlockMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val confirmations = options.getLong("confirmations", 0L)
  private val factoryClass =
    options.getOrDefault("client", classOf[SimChainClientFactory].getName)
  private val optionMap: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    // normalized to lower-case keys: factories do plain Map lookups
    options.asCaseSensitiveMap().asScala.toMap
      .map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
  }
  // driver-side client instance: metadata plane only (head polls)
  private val client = BlockClients.create(factoryClass, optionMap)

  override def initialOffset(): Offset = BlockOffset(0L)

  override def prepareForTriggerAvailableNow(): Unit = client.prepareDrain()

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is used")

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset =
    // only finalized blocks are exposed: reorgs (bounded by K) can never
    // touch them, so downstream stays reorg-free (SURVEY.md §7.6)
    BlockOffset(math.max(0L, client.headBlock() - confirmations))

  override def deserializeOffset(json: String): Offset =
    BlockOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val from = start.asInstanceOf[BlockOffset].exposed // exclusive
    val until = end.asInstanceOf[BlockOffset].exposed  // inclusive
    if (until <= from) Array.empty
    else Array(BlockRangePartition(from + 1, until + 1, factoryClass, optionMap))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new BlockRangeReader(p.asInstanceOf[BlockRangePartition])
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = client.close()
}

private[sources] case class BlockRangePartition(
    fromBlock: Long, untilBlock: Long,
    factoryClass: String, options: Map[String, String])
    extends InputPartition

private[sources] class BlockRangeReader(p: BlockRangePartition)
    extends PartitionReader[InternalRow] {
  // data plane: each task dials its own client and streams its range
  private val client = BlockClients.create(p.factoryClass, p.options)
  private val it = client.blocks(p.fromBlock, p.untilBlock)
  private var current: BlockData = _

  override def next(): Boolean = { val has = it.hasNext; if (has) current = it.next(); has }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(3)
    row.update(0, current.number)
    row.update(1, UTF8String.fromString(current.id))
    row.update(2, current.payload)
    row
  }

  override def close(): Unit = client.close()
}
