package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

/** Scale sweep for distributed PCA: train (one fixed-point moment
  * pass) and project (map-only kernel) throughput on
  * [[ProfileAnn.vectors]], plus the captured-variance readout. Train
  * cost is dominated by the d² per-row rint/accumulate loop — the
  * price of the repartition-bit-identity pin (PcaSpec); project should
  * track scan speed like the other map-only kernels.
  *
  * Usage: runMain graft.ProfilePca [n ...] (default 200000 1000000)
  */
object ProfilePca {

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-pca")
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(200000L, 1000000L)
    sizes.foreach { n =>
      val emb = ProfileAnn.vectors(spark, n).localCheckpoint()
      val t0 = System.nanoTime()
      val model = Pca.train(emb, kOut = 8)
      val trainSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      Pca.project(emb, model).select(sum(col("pc")(0))).head()
      val projSec = (System.nanoTime() - t1) / 1e9
      println(f"PCA n=$n dim=${model.dim} kOut=${model.kOut} " +
        f"train=$trainSec%.2fs (${n / trainSec / 1000}%.0fk vec/s) " +
        f"project=$projSec%.2fs (${n / projSec / 1000}%.0fk vec/s) " +
        f"varExplained=${model.varianceExplained}%.4f")
    }
    spark.stop()
  }
}
