package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loop-boundary persistence + partition sizing for the iterative
  * operators (PageRank, LPA, hop/cost frontiers, k-core peeling, the
  * GraphAnn beam) — optimization round 19, guide §5.
  *
  * Two concerns, one home:
  *
  *  1. CHECKPOINT MODE. `localCheckpoint` truncates lineage by
  *     persisting to executor-LOCAL storage with no lineage left to
  *     recompute from — on `local[n]` that is free and safe, but on a
  *     cluster an executor loss mid-loop kills the whole job (the
  *     blocks are gone and nothing can rebuild them). Long iterative
  *     loops at 100 TB want RELIABLE `checkpoint()` (HDFS/object-store
  *     backed) at round boundaries. [[checkpoint]] routes on
  *     `spark.graft.loop.checkpoint` — `local` (default, the bench
  *     shape) or `reliable` (requires `sparkContext.setCheckpointDir`);
  *     every loop goes through it, so the deployment flips ONE conf.
  *
  *  2. SCALE-ADAPTIVE PARTITION COUNTS for loop-static caches. A
  *     loop-static frame cached as `repartition(k, key)` lets every
  *     round's join reuse one exchange — but `repartition(col)` without
  *     an explicit count freezes the SESSION constant into the cache
  *     (cache builds bypass AQE coalescing under the default
  *     `canChangeCachedPlanOutputPartitioning=false`), which on toy
  *     data forces every downstream stage to `spark.sql.shuffle
  *     .partitions` tasks (the measured r18 GraphAnn regression) and on
  *     a cluster may undershoot the corpus. [[adaptiveParts]] derives
  *     the count from the frame's actual size — ceil(rows·bytesPerRow /
  *     advisoryPartitionSizeInBytes), clamped to [1,
  *     spark.sql.shuffle.partitions] — so toy data caches into 1-2
  *     partitions (matching what AQE would pick) while production data
  *     scales until the deployment-set shuffle-partition ceiling.
  */
object LoopState {

  /** Session conf selecting the loop checkpoint mode: `local`
    * (default — `localCheckpoint`, executor-local, no fault tolerance)
    * or `reliable` (`checkpoint()` to `sparkContext.setCheckpointDir`,
    * survives executor loss — the 100 TB setting). */
  val ModeConf = "spark.graft.loop.checkpoint"

  /** Truncate loop lineage per the session's checkpoint mode. Eager in
    * both modes (the loops count on the materialization). */
  def checkpoint(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val mode = spark.conf.get(ModeConf, "local")
    mode match {
      case "reliable" =>
        require(spark.sparkContext.getCheckpointDir.isDefined,
          s"$ModeConf=reliable needs sparkContext.setCheckpointDir " +
            "(a cluster-visible, durable path)")
        df.checkpoint()
      case "local" => df.localCheckpoint()
      case other => throw new IllegalArgumentException(
        s"$ModeConf must be local or reliable, got: $other")
    }
  }

  /** Partition count for a loop-static cached frame: size-derived
    * (≈ advisoryPartitionSizeInBytes per partition — what AQE would
    * coalesce to), clamped to [1, spark.sql.shuffle.partitions] so a
    * deployment's shuffle sizing stays the ceiling. `bytesPerRow` is
    * the caller's estimate (16 B for a 2-long edge row, ~300 B for a
    * 64-dim float embedding row) — an order-of-magnitude knob, not a
    * precise one. */
  def adaptiveParts(spark: SparkSession, rows: Long,
      bytesPerRow: Long): Int = {
    val maxParts = math.max(1,
      spark.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    val advisory = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "64m"))
    val target = math.max(1L, advisory)
    val ideal = (rows * bytesPerRow + target - 1) / target
    // FLOOR AT 2: `repartition(1, key)` plans as SinglePartition, which
    // downstream joins/aggregations do NOT treat as hash-clustered — the
    // cached side re-shuffles every round, defeating the whole point
    // (measured r19: the n=1 cache pays an Exchange above its
    // InMemoryTableScan; n≥2 reuses the cached HashPartitioning).
    math.min(maxParts.toLong, math.max(2L, ideal)).toInt
  }
}
