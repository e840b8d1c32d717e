package graft.ingest

import scala.collection.mutable

/** Reorg/undo buffer — the implemented version of the reference's stub
  * (undo_buffer.go:19-27 buffers nothing; an undo signal without a buffer
  * is a hard error, sinker.go:142-148). Intended semantics per SURVEY.md
  * §7.6: hold the last K blocks unreleased; on undo(lastValidBlock),
  * silently discard held blocks above it; an undo reaching below the
  * buffer is unrecoverable (already released downstream).
  *
  * Lives at the SOURCE side of the pipeline — downstream operators and the
  * sink only ever see blocks that can no longer be undone, so the query
  * graph stays reorg-free (no compensating deletes at 100 TB).
  */
final class UndoBuffer[T](k: Int, blockNumOf: T => Long) {
  require(k >= 0, s"buffer size must be >= 0: $k")

  private val held = mutable.TreeMap.empty[Long, T]
  // Highest block number ever released downstream. Tracked independently of
  // `held` so an undo below the release horizon is a hard error even when
  // the buffer is momentarily empty (after flush(), with k=0, or when
  // exactly all held blocks were just released).
  private var maxReleased: Long = Long.MinValue

  /** Number of blocks currently held back. */
  def heldCount: Int = held.size

  /** Add a block; returns the blocks released (now final) — everything
    * beyond the most recent K, in ascending block order. */
  def addBlock(block: T): Seq[T] = {
    held.update(blockNumOf(block), block)
    val released = mutable.ArrayBuffer.empty[T]
    while (held.size > k) {
      val (num, b) = held.head
      held.remove(num)
      maxReleased = math.max(maxReleased, num)
      released += b
    }
    released.toSeq
  }

  /** Chain reorg: drop held blocks with number > lastValidBlock. Throws if
    * the reorg reaches below the buffer (blocks already released —
    * reference hard-errors the same way, sinker.go:142-148). */
  def handleUndo(lastValidBlock: Long): Unit = {
    if (lastValidBlock < maxReleased)
      throw new IllegalStateException(
        s"undo to $lastValidBlock below released horizon $maxReleased — " +
          "blocks already released (increase the buffer size)")
    held.keys.toSeq.filter(_ > lastValidBlock).foreach(held.remove)
  }

  /** Drain everything (graceful shutdown / end of stream). */
  def flush(): Seq[T] = {
    val out = held.values.toSeq
    held.clear()
    out.foreach(b => maxReleased = math.max(maxReleased, blockNumOf(b)))
    out
  }
}
