package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Scale sweep for the r15 keyed MERGE: a range-clustered table at two
  * sizes × a small change set — the copy-on-write claim measured. The
  * point at 100 TB is that merge cost tracks the TOUCHED-file count
  * (change-key locality), not the table size; the sweep holds the
  * change set fixed while the table grows 10× and reports rewritten vs
  * copied files and wall time.
  *
  * Usage: runMain graft.ProfileUpsert [rows ...]
  */
object ProfileUpsert {

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-upsert")
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(1000000L, 10000000L)
    sizes.foreach { n =>
      val root = Files.createTempDirectory("profile-upsert").toString
      val files = 64
      spark.range(n).select(col("id").as("k"),
          xxhash64(col("id")).as("v"), lit(1L).as("ver"))
        .repartitionByRange(files, col("k"))
        .write.parquet(s"$root/table")
      // 1k keyed changes drawn from ONE narrow key range (locality —
      // the clustered-table case) + 100 inserts past the end
      spark.range(1000).select((col("id") + n / 2).as("k"),
          lit(-1L).as("v"), lit(2L).as("ver"))
        .unionByName(spark.range(100).select((col("id") + n + 10).as("k"),
          lit(-2L).as("v"), lit(2L).as("ver")))
        .write.parquet(s"$root/changes")
      val t0 = System.nanoTime()
      val st = operators.Upsert.merge(spark, s"$root/table",
        s"$root/changes", s"$root/out", Seq("k"), versionCol = Some("ver"))
      val sec = (System.nanoTime() - t0) / 1e9
      val outRows = spark.read.parquet(s"$root/out").count()
      println(f"UPSERT rows=$n files=$files: ${st.filesRewritten} " +
        f"rewritten / ${st.filesCopied} copied, ${st.upserts} upd + " +
        f"${st.inserts} ins in $sec%.2fs; out=$outRows")

      // merge-on-read (r17): the same table, a 1-row delete — a DV
      // sidecar lands, ZERO data files rewrite, and the read applies
      // the tombstone; the copy-on-write path above rewrites O(file)
      // bytes for the identical logical change
      ingest.TableLog.init(spark, s"$root/table")
      val d0 = System.nanoTime()
      val ds = ingest.TableLog.deleteWhere(spark, s"$root/table",
        col("k") === n / 3)
      val dSec = (System.nanoTime() - d0) / 1e9
      val dRows = ingest.TableLog.read(spark, s"$root/table").count()
      require(ds.filesRewritten == 0 && ds.rowsDeleted == 1 &&
        dRows == n - 1, s"$ds rows=$dRows")
      println(f"DELETE-DV rows=$n: 1-row delete rewrote " +
        f"${ds.filesRewritten} files in $dSec%.2fs (dv sidecar only); " +
        f"read=$dRows")
    }

    // SCD2 merge: an n-version dimension over n/10 keys, the change
    // batch a LATER day for 1k clustered keys + 100 new keys — the
    // claim is the same (cost tracks open-version files), but the
    // probe here prunes to key + is_current columns
    sizes.foreach { n =>
      val root = Files.createTempDirectory("profile-scd2").toString
      val files = 64
      val keys = n / 10
      val h1 = spark.range(n).select(
        expr(s"timestamp_micros((id DIV $keys) * 3600000000 + 86400000000)")
          .as("ts"),
        (col("id") % keys).as("user_id"), col("id").as("event_id"),
        lit("e").as("event_type"))
      queries.Streaming.scd2(h1)
        .repartitionByRange(files, col("user_id"))
        .write.parquet(s"$root/table")
      spark.range(1000).select(
          expr("timestamp_micros(864000000000000)").as("ts"),
          (col("id") + keys / 2).as("user_id"),
          (col("id") + n + 10).as("event_id"), lit("e").as("event_type"))
        .unionByName(spark.range(100).select(
          expr("timestamp_micros(864000000000000)").as("ts"),
          (col("id") + keys + 10).as("user_id"),
          (col("id") + n + 5000).as("event_id"), lit("e").as("event_type")))
        .write.parquet(s"$root/changes")
      val t0 = System.nanoTime()
      val st = operators.Upsert.mergeScd2(spark, s"$root/table",
        s"$root/changes", s"$root/out", Seq("user_id", "event_type"))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SCD2 versions=$n keys=$keys files=$files: " +
        f"${st.filesRewritten} rewritten / ${st.filesCopied} copied, " +
        f"${st.versionsClosed} closed + ${st.versionsAppended} appended " +
        f"in $sec%.2fs")
    }

    // incremental rollup: the landed aggregate table absorbs a 10k-row
    // raw delta — merge work is (touched landed rows + delta partials),
    // never history
    sizes.foreach { n =>
      val root = Files.createTempDirectory("profile-rollup").toString
      val files = 64
      val keys = n / 100
      val aggs = Seq[(String, operators.Skew.ReAgg)](
        "cnt" -> operators.Skew.CountRows(),
        "total" -> operators.Skew.SumOf(col("amount")),
        "hi" -> operators.Skew.MaxOf(col("amount")))
      val h1 = spark.range(n).select((col("id") % keys).as("k"),
        (col("id") * 17 % 100000).as("amount"))
      operators.IncrementalAgg.rollup(h1, Seq("k"), aggs)
        .repartitionByRange(files, col("k"))
        .write.parquet(s"$root/table")
      spark.range(10000).select((col("id") % 1000 + keys / 2).as("k"),
          lit(7L).as("amount"))
        .unionByName(spark.range(100).select((col("id") + keys + 10).as("k"),
          lit(3L).as("amount")))
        .write.parquet(s"$root/delta")
      val t0 = System.nanoTime()
      val st = operators.IncrementalAgg.increment(spark, s"$root/table",
        s"$root/delta", s"$root/out", Seq("k"), aggs)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"ROLLUP rows=$n keys=$keys files=$files: " +
        f"${st.filesRewritten} rewritten / ${st.filesCopied} copied, " +
        f"${st.keysMerged} merged + ${st.keysInserted} inserted " +
        f"in $sec%.2fs")
    }
    spark.stop()
  }
}
