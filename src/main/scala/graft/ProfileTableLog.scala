package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Scale sweep for the r16 incremental TableLog: per-commit manifest
  * METADATA must be O(changed files), not O(table files) — the r15
  * replace-all manifest wrote (and the streaming tier's per-batch
  * probe re-read) one line per table file per commit, the one
  * 100×-scale-killer the r15 verdict flagged. The sweep holds the
  * change set fixed (one rewritten file per commit) while the table
  * grows 10× in FILE COUNT and reports, per commit: delta-record
  * bytes (flat ⇒ O(changed)), the actions() batch-id probe wall time
  * (first-line reads — flat in table size, linear only in retained
  * history), and head-resolution wall (one checkpoint + ≤10 deltas).
  * The v0 checkpoint bytes are the expected O(table) reference point.
  *
  * Usage: runMain graft.ProfileTableLog [fileCounts ...]
  */
object ProfileTableLog {

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-tablelog")
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toInt)
      else Seq(64, 640)
    sizes.foreach { files =>
      val root = Files.createTempDirectory("profile-tablelog").toString
      val rowsPerFile = 100L
      val n = files * rowsPerFile
      spark.range(n).select(col("id").as("k"),
          xxhash64(col("id")).as("v"), lit(1L).as("ver"))
        .repartitionByRange(files, col("k"))
        .write.parquet(s"$root/t")
      ingest.TableLog.init(spark, s"$root/t")
      def logBytes(name: String): Long =
        java.nio.file.Files.size(
          java.nio.file.Paths.get(s"$root/t/_graft_log/$name"))
      // r17: checkpoints are parquet
      val cpBytes = logBytes("v0000000000.checkpoint.parquet")

      val commits = 5
      var deltaBytes = Vector.empty[Long]
      var commitSec = Vector.empty[Double]
      var probeFiles = Vector.empty[Int]
      (1 to commits).foreach { i =>
        // one key → one touched file: the fixed change set
        spark.range(1).select((col("id") + n / 2).as("k"),
            lit(-1L).as("v"), lit(1L + i).as("ver"))
          .write.parquet(s"$root/chg$i")
        val t0 = System.nanoTime()
        // the log's key stats bound the probe (r18): a 1-key change
        // on an n-file clustered table probes ~1 file, flat in n
        val probe = ingest.TableLog.statsCandidates(spark, s"$root/t",
          "k", spark.read.parquet(s"$root/chg$i").select("k"))
        probeFiles :+= probe.size
        val (st, untouched) = operators.Upsert.mergeShared(spark,
          ingest.TableLog.snapshotFiles(spark, s"$root/t"),
          s"$root/chg$i", s"$root/stage$i", Seq("k"),
          versionCol = Some("ver"), probeFiles = Some(probe))
        ingest.TableLog.commit(spark, s"$root/t", s"$root/stage$i",
          s"u$i", expectedHead = Some(i - 1), carry = untouched)
        commitSec :+= (System.nanoTime() - t0) / 1e9
        require(st.filesRewritten == 1, s"locality lost: $st")
        deltaBytes :+= logBytes(f"v$i%010d.delta")
      }

      // the streaming tier's per-batch id probe: actions() reads one
      // line per retained record, never a file list
      val p0 = System.nanoTime()
      val acts = ingest.TableLog.actions(spark, s"$root/t")
      val probeMs = (System.nanoTime() - p0) / 1e6
      // head resolution COLD (parquet checkpoint read + delta tail,
      // immutable-record cache dropped) and WARM (cache hit — the
      // steady state of a commit stream, which re-reads the
      // checkpoint zero times until the next one lands)
      ingest.TableLog.dropCheckpointCache()
      val r0 = System.nanoTime()
      val head = ingest.TableLog.snapshotFiles(spark, s"$root/t")
      val resolveColdMs = (System.nanoTime() - r0) / 1e6
      val r1 = System.nanoTime()
      val head2 = ingest.TableLog.snapshotFiles(spark, s"$root/t")
      val resolveWarmMs = (System.nanoTime() - r1) / 1e6
      require(acts.size == commits + 1 && head.size >= files - 1 &&
        head2 == head)
      // r18 file-granular CDF: replaying the whole feed (5 pairwise
      // diffs, change set fixed at one rewritten file per commit)
      // must track the CHANGE SET, not the table — flat across the
      // 10× file sweep (the r17 full-snapshot diff read the entire
      // table per commit pair and scaled with `files`)
      val f0 = System.nanoTime()
      val feedRows = ingest.TableLog.changes(spark, s"$root/t", 0)
        .count()
      val feedSec = (System.nanoTime() - f0) / 1e9
      require(feedRows == 2L * commits,
        s"feed rows: $feedRows (want ${2 * commits})")

      println(f"TABLELOG files=$files%4d: v0 checkpoint $cpBytes%7d B " +
        f"parquet (O(table) reference); per-commit delta " +
        f"${deltaBytes.min}%4d..${deltaBytes.max}%4d B, " +
        f"merge+commit ${commitSec.min}%.2f..${commitSec.max}%.2f s; " +
        f"actions probe $probeMs%.1f ms, head resolve " +
        f"cold $resolveColdMs%.1f / warm $resolveWarmMs%.1f ms; " +
        f"feed replay $feedSec%.2f s / $commits commits; " +
        f"upsert probe ${probeFiles.min}..${probeFiles.max} of " +
        f"$files files (stats-bounded)")
    }
    spark.stop()
  }
}
