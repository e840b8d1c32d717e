package graft.ingest

/** Block-range partition math + file naming.
  *
  * Semantics match the reference's partitioner
  * (parquet/sinker/partitioner.go:20-32 for RangeFor — half-open
  * [start + k·size, start + (k+1)·size) clamped to the stop block — and
  * partitioner.go:34-36 for the zero-padded "%0*d-%0*d.parquet" name,
  * default pad 10 per run.go:33).
  *
  * At 100 TB the range is the unit of parallelism AND idempotence: every
  * range maps to exactly one output file, so backfills are embarrassingly
  * parallel and retries are safe (re-writing a range is a no-op rename).
  */
final case class RangePartitioner(
    start: Long, size: Long, stop: Option[Long] = None, pad: Int = 10) {
  require(size > 0, s"partition size must be positive: $size")

  /** Start of the range containing `block`. */
  def rangeStart(block: Long): Long =
    start + ((block - start) / size) * size

  /** Half-open [rangeStart, rangeEnd) for `block`, end clamped to stop. */
  def rangeFor(block: Long): (Long, Long) = {
    val rs = rangeStart(block)
    val re = rs + size
    (rs, stop.fold(re)(e => math.min(re, e)))
  }

  /** Zero-padded file name for a range (partitioner.go:34-36). */
  def fileName(rs: Long, re: Long): String =
    s"%0${pad}d-%0${pad}d.parquet".format(rs, re)

  def fileNameFor(block: Long): String =
    (fileName _).tupled(rangeFor(block))

  /** All range starts in [start, untilBlock] — used for empty backfill
    * (writer.go:246-267). */
  def rangeStartsUpTo(untilBlock: Long): Seq[Long] =
    if (untilBlock < start) Seq.empty
    else (start to untilBlock by size)
}
