package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Hive-tree import: partition columns reconstructed from `k=v` path
  * segments, rows bit-identical to the source, landed flat +
  * range-clustered + versioned at v0, maintenance loop live from the
  * first read. */
class TableImportSpec extends SparkSuite {

  import spark.implicits._

  test("two-level hive tree imports flat, clustered, versioned") {
    val root = Files.createTempDirectory("timport").toString
    // a two-level dt=/region= tree, written the way a hive producer
    // would: partitionBy drops the partition columns from the files
    val src = spark.range(200).select(
      col("id").as("k"),
      concat(lit("p"), col("id")).as("payload"),
      (col("id") % 4).cast("int").as("dt"),
      concat(lit("r"), (col("id") % 3)).as("region"))
    src.write.partitionBy("dt", "region").parquet(s"$root/hive")

    val st = TableImport.importHive(spark, s"$root/hive", s"$root/t",
      clusterBy = Seq("k"), numFiles = 4)
    assert(st.rows == 200L && st.version == 0 && st.files == 4, s"$st")
    assert(st.partitionCols == Seq("dt", "region"), s"$st")

    // rows survive exactly, partition values reconstructed as columns
    val got = TableLog.read(spark, s"$root/t")
      .select(col("k"), col("payload"), col("dt").cast("long"),
        col("region"))
      .as[(Long, String, Long, String)].collect().sortBy(_._1).toSeq
    val want = src
      .select(col("k"), col("payload"), col("dt").cast("long"),
        col("region"))
      .as[(Long, String, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == want)

    // flat (no subdirectories beyond the log) and range-clustered:
    // a k-range predicate prunes to one file's span
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val subdirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/t"))
      .filter(_.isDirectory).map(_.getPath.getName).toSeq
    assert(subdirs == Seq("_graft_log"), s"$subdirs")
    val spans = TableLog.read(spark, s"$root/t")
      .groupBy(input_file_name()).agg(min("k").as("lo"), max("k").as("hi"))
      .filter(col("lo") <= 17L && col("hi") >= 17L).count()
    assert(spans == 1L, s"k=17 spans $spans files — not range-clustered")

    // the maintenance loop is live: an upsert commit lands as v1
    Seq((17L, "updated", 99, "r0")).toDF("k", "payload", "dt", "region")
      .write.parquet(s"$root/chg")
    val (up, unt) = graft.operators.Upsert.mergeShared(spark,
      TableLog.snapshotFiles(spark, s"$root/t"), s"$root/chg",
      s"$root/staged", Seq("k"))
    assert(up.filesRewritten == 1, s"$up")
    TableLog.commit(spark, s"$root/t", s"$root/staged", "upsert",
      expectedHead = Some(0), carry = unt)
    assert(TableLog.read(spark, s"$root/t")
      .filter(col("k") === 17L).select("payload").as[String]
      .collect().toSeq == Seq("updated"))
  }

  test("flat source imports as a plain re-cluster; guards fire") {
    val root = Files.createTempDirectory("timport-flat").toString
    spark.range(10).select(col("id").as("k"), lit("x").as("v"))
      .write.parquet(s"$root/flat")
    val st = TableImport.importHive(spark, s"$root/flat", s"$root/t",
      Seq("k"), numFiles = 2)
    assert(st.partitionCols.isEmpty && st.rows == 10L, s"$st")
    // non-empty destination refused
    val ex = intercept[IllegalArgumentException] {
      TableImport.importHive(spark, s"$root/flat", s"$root/t",
        Seq("k"), 2)
    }
    assert(ex.getMessage.contains("non-empty"), ex.getMessage)
    // unknown cluster column named loudly, with the reconstruction
    intercept[IllegalArgumentException] {
      TableImport.importHive(spark, s"$root/flat", s"$root/t2",
        Seq("nope"), 2)
    }
  }

  test("CLI: table import drives the same path") {
    val root = Files.createTempDirectory("timport-cli").toString
    spark.range(40).select(col("id").as("k"),
        (col("id") % 2).cast("int").as("dt"),
        concat(lit("v"), col("id")).as("v"))
      .write.partitionBy("dt").parquet(s"$root/hive")
    graft.CliMain.main(Array("table", s"$root/t", "import",
      s"$root/hive", "--cluster", "k", "--files", "2"))
    val got = TableLog.read(spark, s"$root/t")
    assert(got.count() == 40L && got.columns.contains("dt"))
    assert(TableLog.head(spark, s"$root/t").contains(0))
  }
}
