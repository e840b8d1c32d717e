package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared claim-registry plumbing for the streaming near-dup stages
  * ([[NearDupStage]] — MinHash band claims; [[EmbedNearDupStage]] —
  * IVF-cell embedding claims). The registry is a parquet table
  * partitioned by `epoch` with a monotone `_horizon` watermark file
  * alongside; the rationale for every move lives on [[NearDupStage]]'s
  * scaladoc (epoch-overwrite idempotence, prior-epoch-only reads,
  * promote-before-delete compaction).
  */
private[streaming] object ClaimRegistry {

  def horizonPath(dir: String) = new Path(s"$dir/_horizon")

  def readHorizon(fs: org.apache.hadoop.fs.FileSystem, dir: String): Long =
    if (!fs.exists(horizonPath(dir))) Long.MinValue
    else {
      val in = fs.open(horizonPath(dir))
      try new String(in.readAllBytes()).trim.toLong finally in.close()
    }

  def writeHorizon(fs: org.apache.hadoop.fs.FileSystem, dir: String,
      h: Long): Unit = {
    val out = fs.create(horizonPath(dir), true)
    try out.write(h.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Any epoch partition present? (`_horizon` / dot-dirs don't count.) */
  def exists(fs: org.apache.hadoop.fs.FileSystem, dir: String): Boolean =
    fs.exists(new Path(dir)) && fs.listStatus(new Path(dir))
      .exists(_.getPath.getName.startsWith("epoch="))

  /** Fold every epoch dir EXCEPT the newest into a fresh negative base
    * epoch, dropping sub-horizon claims; `keep` is the stage's claim
    * schema. Promote-before-delete: a crash can only duplicate claims
    * (harmless — claims form a set), never lose them. The newest epoch
    * stays unfolded because it is the only one a streaming replay can
    * rewrite (NearDupStage.compact's original contract). */
  def compact(spark: SparkSession, dir: String, keep: Seq[String]): Unit = {
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(dir))) return
    val horizon = readHorizon(fs, dir)
    val epochs = fs.listStatus(new Path(dir)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("epoch="))
      .map(_.stripPrefix("epoch=").toLong)
    if (epochs.size < 2) return // nothing foldable below the newest
    val newest = epochs.max
    val base = math.min(epochs.min, 0L) - 1L
    val live = spark.read.parquet(dir)
      .filter(col("epoch") < newest &&
        col("ts").cast("long") * 1000L >= horizon)
      .select(keep.map(col): _*)
    val tmp = s"$dir/.compact-tmp"
    live.write.mode("overwrite").parquet(tmp)
    // promote first, delete second: claims may never transit through a
    // state where only the discovery-invisible tmp dir holds them
    if (!fs.rename(new Path(tmp), new Path(s"$dir/epoch=$base")) ||
        !fs.exists(new Path(s"$dir/epoch=$base")))
      throw new java.io.IOException(
        s"compact: failed to promote $tmp to $dir/epoch=$base")
    epochs.filter(_ < newest)
      .foreach(e => fs.delete(new Path(s"$dir/epoch=$e"), true))
    // the shared FileStatusCache still lists the deleted epoch dirs
    spark.catalog.refreshByPath(dir)
  }
}
