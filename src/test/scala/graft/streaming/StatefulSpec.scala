package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}

import graft.SparkSuite

/** Custom stateful streaming (SURVEY.md §2.B stateful ops):
  * mapGroupsWithState as the extension point the reference lacks — state
  * carried across micro-batches per key, the building block the undo
  * buffer / running aggregations compose from. */
object StatefulSpec {
  // top-level (encoders can't capture a suite instance's scope)
  case class Ev(user: String, v: Long)
  case class RunState(count: Long, sum: Long)
  case class Out(user: String, count: Long, sum: Long)
}

class StatefulSpec extends SparkSuite {
  import StatefulSpec._

  test("mapGroupsWithState: running per-key state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val stream = MemoryStream[Ev]
    val out = stream.toDS()
      .groupByKey(_.user)
      .mapGroupsWithState[RunState, Out](GroupStateTimeout.NoTimeout) {
        (user, evs, state: GroupState[RunState]) =>
          val prev = state.getOption.getOrElse(RunState(0L, 0L))
          val batch = evs.toSeq
          val next = RunState(prev.count + batch.size,
            prev.sum + batch.map(_.v).sum)
          state.update(next)
          Out(user, next.count, next.sum)
      }

    val query = out.writeStream
      .format("memory").queryName("mgws_test")
      .outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    stream.addData(Ev("a", 1), Ev("a", 2), Ev("b", 10))
    query.processAllAvailable()
    stream.addData(Ev("a", 3), Ev("b", 5), Ev("c", 100))
    query.processAllAvailable()
    query.stop()

    // last update per key reflects state accumulated across BOTH batches
    val last = spark.table("mgws_test").as[Out].collect()
      .groupBy(_.user).map { case (u, rows) => u -> rows.maxBy(_.count) }
    assert(last("a") == Out("a", 3, 6))
    assert(last("b") == Out("b", 2, 15))
    assert(last("c") == Out("c", 1, 100))
  }
}
