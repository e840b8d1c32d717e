package graft.operators

import java.nio.file.Files

import graft.SparkSuite

/** Bucketing = the co-located join story (SURVEY.md §7.2 M6): two tables
  * bucketed+sorted on the join key join with ZERO shuffle — at 100 TB the
  * fact⋈fact join this enables is the difference between a network-bound
  * job and a map-side merge. */
class BucketingSpec extends SparkSuite {

  test("bucketed tables join without an exchange") {
    import spark.implicits._
    val dir = Files.createTempDirectory("buckets").toString
    val left = (0L until 10000L).map(i => (i % 500, i)).toDF("k", "v")
    val right = (0L until 500L).map(i => (i, s"name$i")).toDF("k", "name")

    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .option("path", s"$dir/left").saveAsTable("bkt_left")
    right.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .option("path", s"$dir/right").saveAsTable("bkt_right")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_left")
        .join(spark.table("bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"))
      // bucket layout replaces both shuffles: no Exchange anywhere
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() == 10000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
