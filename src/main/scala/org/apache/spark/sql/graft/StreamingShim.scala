package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SQLContext}

/** The one `private[sql]` reach this repo makes: a DSv1 streaming
  * [[org.apache.spark.sql.execution.streaming.Source]]'s `getBatch`
  * must return a frame with `isStreaming = true`, and the only
  * constructor for that is `SQLContext.internalCreateDataFrame` —
  * visible to `org.apache.spark.sql.*` subpackages, which is exactly
  * how the public Delta connector's streaming source does it. The
  * batch plan is computed to an `RDD[InternalRow]` and re-wrapped
  * under the streaming flag; nothing else internal is touched. */
object StreamingShim {

  /** Re-wrap a BATCH DataFrame as a streaming-flagged one, for a DSv1
    * Source.getBatch return value. */
  def asStreaming(sqlContext: SQLContext, df: DataFrame): DataFrame = {
    val classic = sqlContext.asInstanceOf[
      org.apache.spark.sql.classic.SQLContext]
    val qe = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution
    classic.internalCreateDataFrame(qe.toRdd, df.schema,
      isStreaming = true)
  }
}
