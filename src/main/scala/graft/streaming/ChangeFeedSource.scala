package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField,
  StructType}

import graft.ingest.TableLog

/** Structured Streaming SOURCE over a [[TableLog]] table's change
  * feed — `spark.readStream.format("graft-changes").option("path",
  * tableDir).load()` yields one streamed row per change
  * (`_change_type` insert/delete, `_commit_version` stamp) as
  * maintenance commits land: the Delta CDF streaming-read analogue,
  * built on the offsets-ARE-versions identity.
  *
  *   - OFFSETS: the stream offset is the table VERSION ([[LongOffset]]).
  *     `getOffset` = the current head; `getBatch((a, b])` =
  *     `TableLog.changes(a, Some(b))` — exclusive/inclusive exactly
  *     matching the engine's contract, so the checkpointed offset IS
  *     the consumer cursor and Structured Streaming's own offset log
  *     provides the crash/replay discipline [[graft.ingest.ChangeFeed]]
  *     hand-rolls for batch consumers. Exactly-once end-to-end
  *     follows with any idempotent/transactional sink (foreachBatch
  *     into a TableLog commit with a batch action id, the
  *     [[UpsertPipeline]] pattern).
  *   - SCHEMA: the head snapshot's recorded schema + `_change_type`
  *     STRING + `_commit_version` INT, fixed at stream start (the
  *     standard source contract — an add-column evolution applies on
  *     restart; pairwise diffs inside a batch already null-fill).
  *   - RETENTION: a stream lagging past [[TableLog.expire]]'s window
  *     fails LOUDLY in getBatch (`not in retained history`) rather
  *     than silently skipping changes — retain at least the stream's
  *     max expected downtime, or re-seed from a full snapshot read.
  *   - `startingVersion` (option, default: the head at stream start):
  *     consume changes AFTER this version; pass 0 to replay the full
  *     retained feed.
  *
  * Scale: per micro-batch this reads the pairwise diffs of the new
  * versions only — truly O(changed files per commit) since r18
  * ([[TableLog.diffCommit]] diffs the delta record's own add/remove
  * file lists; carried files are never read) — the incremental-log
  * discipline carried to the streaming reader; the source itself
  * holds no state beyond the engine's offset log. */
class ChangeFeedSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-changes"

  private def dirOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", sys.error(
      "option 'path' (the TableLog table directory) is required"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), ChangeFeedSource.feedSchema(
      sqlContext.sparkSession, dirOf(parameters)))

  override def createSource(sqlContext: SQLContext,
      metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): Source = {
    val dir = dirOf(parameters)
    val spark = sqlContext.sparkSession
    val start = parameters.get("startingVersion").map(_.toInt)
      .getOrElse(TableLog.head(spark, dir).getOrElse(
        sys.error(s"$dir has no log — run init first")))
    // pairKeys (r18): comma-separated key columns — each commit's
    // delete+insert sharing the key streams as its
    // update_preimage/update_postimage pair (TableLog.changes keys)
    val keys = parameters.get("pairKeys").toSeq
      .flatMap(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    new ChangeFeedSource(spark, dir, start, keys)
  }
}

object ChangeFeedSource {
  /** Head snapshot schema + the change-feed stamp columns. */
  def feedSchema(spark: org.apache.spark.sql.SparkSession,
      dir: String): StructType = {
    val base = TableLog.schemaOf(spark, dir).getOrElse(
      sys.error(s"$dir snapshot records no schema (empty init?)"))
    StructType(base.fields :+
      StructField("_change_type", StringType, nullable = false) :+
      StructField("_commit_version", IntegerType, nullable = false))
  }
}

class ChangeFeedSource(spark: org.apache.spark.sql.SparkSession,
    dir: String, startingVersion: Int, pairKeys: Seq[String] = Nil)
    extends Source {

  private val sqlContext: SQLContext = spark.sqlContext

  private val fixedSchema = ChangeFeedSource.feedSchema(spark, dir)

  override def schema: StructType = fixedSchema

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[Offset] = {
    val h = TableLog.head(spark, dir).getOrElse(
      sys.error(s"$dir lost its log mid-stream"))
    // The CHECKPOINTED offset, not a re-derived head, must govern a
    // restart: when `startingVersion` is omitted, createSource derives
    // it from the head AT (RE)START TIME, so gating on `h <=
    // startingVersion` here stranded a lagging restart (committed
    // offset c < restart-time head h) until some FUTURE commit pushed
    // the head past h — indefinitely on a quiescent table, and long
    // enough for expire to turn the delay into a hard failure. The
    // engine treats an offset equal to the last committed one as
    // no-new-data, so returning the head unconditionally is correct;
    // only a head still BELOW the requested start (explicit future
    // startingVersion) reports no data. */
    if (h < startingVersion) None else Some(LongOffset(h.toLong))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(startingVersion.toLong)
    val to = versionOf(end)
    // select in the declared schema's column order (the engine binds
    // the source's rows positionally), then re-wrap under the
    // isStreaming flag — the DSv1 contract (see StreamingShim)
    org.apache.spark.sql.graft.StreamingShim.asStreaming(sqlContext,
      TableLog.changes(spark, dir, from.toInt, Some(to.toInt), pairKeys)
        .select(fixedSchema.fieldNames.map(col).toSeq: _*))
  }

  override def stop(): Unit = {}
}
