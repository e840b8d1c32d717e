package graft.sources

import graft.ingest.{ProtoWire, SampleBlocks}

/** One block as delivered by an endpoint: number, canonical id at fetch
  * time, wire-encoded output payload. */
final case class BlockData(number: Long, id: String, payload: Array[Byte])

/** The client seam a live Substreams gRPC endpoint plugs into — the
  * repo's analogue of the reference's `sink.New(...)`-owned stream client
  * (sinker.go:91; endpoint/manifest resolution run.go:100-108).
  *
  * Split to match Spark's execution model:
  *  - the DRIVER holds one instance for head polling ([[headBlock]]
  *    backs `latestOffset`) — cheap, metadata-only calls;
  *  - each EXECUTOR task constructs its own instance (via
  *    [[BlockClientFactory]], shipped as class name + options in the
  *    InputPartition) and calls [[blocks]] for its range — the data
  *    plane, so payload bytes never route through the driver.
  *
  * [[blocks]] returns the canonical chain view AT FETCH TIME: blocks
  * re-mined by a reorg carry their new ids. The MicroBatchStream layers
  * finality policy on top (only blocks ≤ head−K are exposed), so
  * downstream never observes an id change — the undo-signal handling a
  * live sinker needs for unfinalized streaming lives in
  * `graft.ingest.UndoBuffer` (sinker.go:142-148 analogue).
  */
trait BlockClient extends AutoCloseable {
  /** Current chain head; advances between polls on a live chain. */
  def headBlock(): Long

  /** Blocks `[from, until)` in order, canonical view as of this call. */
  def blocks(from: Long, until: Long): Iterator[BlockData]

  /** Trigger.AvailableNow hint: the consumer intends to drain everything
    * available and stop. A live endpoint no-ops (the chain never ends);
    * the simulated chain fast-forwards its head to the chain end. */
  def prepareDrain(): Unit = ()

  override def close(): Unit = ()
}

/** Constructed by FQCN (source option `client`) with the source's full
  * option map — the endpoint-resolution seam: a real implementation reads
  * endpoint/network/manifest options here and dials gRPC; must have a
  * zero-arg constructor (instantiated on driver AND executors). */
trait BlockClientFactory {
  def create(options: Map[String, String]): BlockClient
}

/** Default client: a deterministic simulated chain (zero-egress env,
  * SURVEY.md §7.3). Options (lower-cased by Spark's option map):
  * `numblocks` chain length, `blocksperbatch` head advance per poll,
  * `reorgs` "head:depth[,head:depth]" re-mine schedule, `confirmations`
  * only to size the post-chain mining margin so a K-lagged consumer can
  * reach block numBlocks. */
final class SimChainClientFactory extends BlockClientFactory {
  override def create(o: Map[String, String]): BlockClient = new SimChainClient(
    numBlocks = o.getOrElse("numblocks", "100").toLong,
    blocksPerBatch = o.getOrElse("blocksperbatch", "10").toLong,
    margin = o.getOrElse("confirmations", "0").toLong,
    reorgs = SimChainClient.parseReorgs(o.getOrElse("reorgs", "")))
}

object SimChainClient {
  def parseReorgs(s: String): Seq[(Long, Int)] =
    if (s.isEmpty) Seq.empty
    else s.split(',').toSeq.map { e =>
      val Array(h, d) = e.split(':'); (h.toLong, d.toInt)
    }
}

final class SimChainClient(numBlocks: Long, blocksPerBatch: Long,
    margin: Long, reorgs: Seq[(Long, Int)]) extends BlockClient {
  private var head = 0L

  override def headBlock(): Long = {
    head = math.min(head + blocksPerBatch, numBlocks + margin)
    head
  }

  override def prepareDrain(): Unit = head = numBlocks + margin

  override def blocks(from: Long, until: Long): Iterator[BlockData] =
    (from until math.min(until, numBlocks + 1)).iterator.map { n =>
      val gen = BlockStreamSource.generation(n, reorgs)
      BlockData(n, BlockStreamSource.blockId(n, gen),
        ProtoWire.encode(SampleBlocks.output, SampleBlocks.samplePayload(n)))
    }
}
