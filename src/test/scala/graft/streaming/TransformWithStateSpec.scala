package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, Trigger}

import graft.SparkSuite

object TransformWithStateSpec {
  case class Ev(user: String, v: Long)
  case class Out(user: String, count: Long, sum: Long)

  /** Running per-key totals on the Spark 4 arbitrary-state API
    * (transformWithState + typed ValueState, RocksDB-backed). */
  class RunningTotals extends StatefulProcessor[String, Ev, Out] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long)](
        "totals", Encoders.product[(Long, Long)], org.apache.spark.sql
          .streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Ev],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[Out] = {
      val (c0, s0) = if (state.exists()) state.get() else (0L, 0L)
      val batch = rows.toSeq
      val next = (c0 + batch.size.toLong, s0 + batch.map(_.v).sum)
      state.update(next)
      Iterator.single(Out(key, next._1, next._2))
    }
  }
}

/** transformWithState — the Spark 4 successor to mapGroupsWithState
  * (SURVEY.md §2.B stateful ops): typed per-key state in RocksDB,
  * evolved across micro-batches. */
class TransformWithStateSpec extends SparkSuite {
  import TransformWithStateSpec._

  test("per-key state persists across micro-batches (RocksDB store)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[Ev]
      val out = stream.toDS()
        .groupByKey(_.user)
        .transformWithState(new RunningTotals,
          TimeMode.None(), OutputMode.Update())

      val query = out.writeStream
        .format("memory").queryName("tws_test")
        .outputMode("update")
        .trigger(Trigger.ProcessingTime(0))
        .start()

      stream.addData(Ev("a", 1), Ev("a", 2), Ev("b", 10))
      query.processAllAvailable()
      stream.addData(Ev("a", 3), Ev("c", 7))
      query.processAllAvailable()
      query.stop()

      val last = spark.table("tws_test").as[Out].collect()
        .groupBy(_.user).map { case (u, rows) => u -> rows.maxBy(_.count) }
      assert(last("a") == Out("a", 3, 6))
      assert(last("b") == Out("b", 1, 10))
      assert(last("c") == Out("c", 1, 7))
    } finally {
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
