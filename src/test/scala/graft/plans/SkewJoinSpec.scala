package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** AQE skew-join handling — the JOIN-side hot-key lever (the agg side is
  * graft.operators.Skew): a sort-merge join whose one partition dwarfs
  * the median gets split at RUNTIME into sub-partitions, no salting or
  * manual hints. This is configuration + evidence, not code — the spec
  * exists so a config regression (AQE off, thresholds wrong) is caught.
  */
class SkewJoinSpec extends SparkSuite {

  test("AQE splits the hot key's partition in a skewed sort-merge join") {
    import spark.implicits._
    val confs = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "50KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force SMJ
    val saved = confs.keys.map(k =>
      k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val pad = "x" * 100
      // one hot key with ~20k rows; the rest singletons
      val left = ((1 to 20000).map(i => (0L, s"$pad$i")) ++
        (1L to 500L).map(k => (k, pad))).toDF("k", "v").repartition(8)
      val right = (0L to 500L).map(k => (k, s"r$k")).toDF("k", "w")
        .repartition(8)
      val joined = left.hint("merge").join(right, "k")
      // materialize THIS query execution: AQE finalizes the plan only on
      // its own run (count() would execute a different plan)
      assert(joined.collect().length == 20500)
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n${plan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
