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
        s"$root/changes", s"$root/out", "k", versionCol = Some("ver"))
      val sec = (System.nanoTime() - t0) / 1e9
      val outRows = spark.read.parquet(s"$root/out").count()
      println(f"UPSERT rows=$n files=$files: ${st.filesRewritten} " +
        f"rewritten / ${st.filesCopied} copied, ${st.upserts} upd + " +
        f"${st.inserts} ins in $sec%.2fs; out=$outRows")
    }
    spark.stop()
  }
}
