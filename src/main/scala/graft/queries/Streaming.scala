package graft.queries

import graft.{QueryFamily, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingest-analog + event-time family (SURVEY.md §2.C-2, §2.C-9).
  *
  * The reference's only relational operator is one-level explode/UNNEST
  * (reference parquet/sinker/factory.go:207-220, sinker.go:193-224) plus
  * map→entry-list normalization (converter_proto.go:82-87). Both are
  * restated here as oracle-checked batch queries; the streaming forms
  * (session windows, watermark, range-partitioned sink) are exercised in
  * the StreamingSpec/IngestSpec ScalaTest fixtures where DuckDB has no
  * equivalent.
  *
  * Event-time notes: `events.ts` is a microsecond TIMESTAMP_NTZ (parquet
  * timestamp[us], no UTC flag) read natively by both engines; Spark's
  * window() grid and DuckDB's time_bucket() are both epoch-aligned on the
  * same wall-clock values (session TZ pinned UTC, SURVEY §7.5).
  */
object Streaming extends QueryFamily {

  /** events.ts — already a microsecond timestamp in the current testdata. */
  private def tsCol: Column = col("ts")

  private def dec(c: String) = col(c).cast("decimal(12,4)")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_explode_tokens" -> { (s, d) =>
      // One-level UNNEST, the reference's "explode" (scalar-element table).
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("token"))
        .orderBy("doc_id", "pos")
    },
    "q_explode_structs" -> { (s, d) =>
      // Struct-list round trip: per-user struct array (the shape of an
      // exploded-message child table, converter_field.go:28-35) rebuilt
      // then inline()'d back to flattened columns.
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(array_sort(collect_list(struct(col("event_id"), col("value"))))
          .as("evs"))
        .select(col("user_id"), inline(col("evs")))
        .orderBy("user_id", "event_id")
    },
    "q_stream_interval_join" -> { (s, d) =>
      // Stream-stream INTERVAL JOIN semantics, batch-equivalent oracle:
      // per user, purchases within 1 hour AFTER a signup. The streaming
      // form is the watermarked stream-stream join pinned in
      // StreamJoinSpec; this declares the same equi-key + time-bound
      // predicate for the hash-match gate. The join is equi on user_id
      // with the interval as residual — never an unbounded time join.
      val e = Tables.events(s, d)
      val signups = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("s_ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"),
          col("event_id").as("p_id"))
      signups.join(purchases, Seq("user_id"))
        .filter(col("p_ts") >= col("s_ts") &&
          col("p_ts") < col("s_ts") + expr("INTERVAL 1 HOUR"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_joined"),
             min("p_id").as("first_purchase_id"))
        .orderBy("user_id")
    },
    "q_map_entries" -> { (s, d) =>
      // map → sorted entry-list normalization (the reference's map layout,
      // made deterministic — SURVEY.md §2.A#8).
      // map → sorted entries → exploded to (event_id, key, value) rows:
      // the harness compare can't sort/hash list-of-struct cells.
      Tables.events(s, d)
        .select(col("event_id"),
          explode(array_sort(map_entries(
            map(lit("k"), get_json_object(col("props"), "$.k").cast("long"),
                lit("u"), col("user_id"))))).as("e"))
        .select(col("event_id"), col("e.key").as("key"),
                col("e.value").as("value"))
        .orderBy("event_id", "key")
    },
    "q_raw_projection" -> { (s, d) =>
      // The reference's raw fallback converter: (block_number, block_id,
      // payload) pass-through (converter_raw.go:22-26), on events.
      Tables.events(s, d)
        .select(col("event_id").as("block_number"),
          concat(lit("0x"), lpad(hex(col("event_id")), 16, "0"))
            .as("block_id"),
          // hex-encoded: the harness compare can't hash binary cells
          hex(encode(col("props"), "utf-8")).as("payload"))
        .orderBy("block_number")
    },
    "q_stream_tumbling" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(tsCol, "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(dec("value")).cast("double").as("sum_value"))
        .select(col("w.start").as("ws"), col("event_type"), col("n"),
                col("sum_value"))
        .orderBy("ws", "event_type")
    },
    "q_stream_sliding" -> { (s, d) =>
      // 1h windows sliding every 30min: each event lands in 2 windows.
      Tables.events(s, d)
        .groupBy(window(tsCol, "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"),
             sum(dec("value")).cast("double").as("sum_value"))
        .select(col("w.start").as("ws"), col("n"), col("sum_value"))
        .orderBy("ws")
    },
    "q_stream_session" -> { (s, d) =>
      // Batch session_window (30-min gap) — oracled via the classic
      // gaps-and-islands SQL: a new session starts when the gap since the
      // previous event is >= the timeout (session windows are half-open:
      // an event landing exactly at the previous session's end opens a
      // new one).
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(tsCol, "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"), col("n"))
        .orderBy("user_id", "session_start")
    },
    "q_scd2" -> ((s, d) => scd2(Tables.events(s, d))),
    "q_stream_topk" -> { (s, d) =>
      // Windowed top-k (trending event types): per 6-hour tumbling
      // window, the 3 most frequent event types with their rank — the
      // "trending now" dashboard shape. Batch-equivalent declared form;
      // the streaming form (watermarked windowed counts ranked at
      // window seal) is pinned streamed ≡ batch in WindowTopKSpec. The
      // rank window partitions per time-window (bounded |types| frame,
      // never corpus-scaled); ties break on event_type so both engines
      // rank identically.
      val counts = Tables.events(s, d)
        .groupBy(window(tsCol, "6 hours").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("ws"), col("event_type"), col("n"))
      val rw = Window.partitionBy(col("ws"))
        .orderBy(col("n").desc, col("event_type"))
      counts.withColumn("rnk", row_number().over(rw))
        .filter(col("rnk") <= 3)
        .orderBy("ws", "rnk")
    },
    "q_stream_dedup_latest" -> { (s, d) =>
      // Streaming dropDuplicates analog: latest event per (user, type) —
      // the batch shape of `dropDuplicates` + max-ts state (§2.B stateful).
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("n_events"))
        .select(col("user_id"), col("event_type"),
                // NTZ → epoch micros: cast re-interprets the wall time in
                // the session TZ (pinned UTC) — identical to epoch_us(ts)
                unix_micros(col("last_ts").cast("timestamp")).as("last_us"),
                col("n_events"))
        .orderBy("user_id", "event_type")
    }
  )

  /** q_scd2's kernel over any events frame — Type-2 slowly-changing
    * dimension: every (user, type) observation becomes a VALIDITY
    * INTERVAL [ts, next ts) with the open current version flagged. One
    * user_id exchange; the lead window shares it with nothing else;
    * epoch-micro BIGINTs (NULL valid_to = current) so both engines
    * emit identical intervals. At ingest scale this is the merge the
    * RangeSink's landed tables feed — declared over events as the
    * batch-equivalent form; the CONTINUOUS form is
    * [[graft.streaming.Scd2Stats]], whose closed intervals
    * Scd2StatsSpec pins against THIS kernel (factored so the pair
    * cannot drift). */
  private[graft] def scd2(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val us = expr("unix_micros(cast(ts as timestamp))")
    events
      .select(col("user_id"), col("event_type"), col("event_id"),
        us.as("valid_from"),
        lead(us, 1).over(w).as("valid_to"))
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "event_type", "valid_from", "event_id")
  }

  def oracle: Map[String, String] = Map(
    "q_explode_tokens" ->
      """SELECT doc_id,
        |  generate_subscripts(string_split(text, ' '), 1) AS pos,
        |  unnest(string_split(text, ' ')) AS token
        |FROM documents WHERE doc_id < 100
        |ORDER BY doc_id, pos""".stripMargin,
    "q_explode_structs" ->
      """SELECT * FROM (
        |  SELECT user_id, unnest(evs, recursive := true)
        |  FROM (
        |    SELECT user_id,
        |      list(struct_pack(event_id := event_id, value := value)
        |           ORDER BY event_id) AS evs
        |    FROM events GROUP BY user_id))
        |ORDER BY user_id, event_id""".stripMargin,
    "q_stream_interval_join" ->
      """SELECT s.user_id, count(*) AS n_joined,
        |  min(p.event_id) AS first_purchase_id
        |FROM (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
        |JOIN (SELECT user_id, ts, event_id FROM events
        |      WHERE event_type = 'purchase') p
        |  ON s.user_id = p.user_id
        | AND p.ts >= s.ts AND p.ts < s.ts + INTERVAL 1 HOUR
        |GROUP BY s.user_id ORDER BY s.user_id""".stripMargin,
    "q_map_entries" ->
      """SELECT event_id, key, value FROM (
        |  SELECT event_id, 'k' AS key,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS value
        |  FROM events
        |  UNION ALL
        |  SELECT event_id, 'u' AS key, user_id AS value FROM events)
        |ORDER BY event_id, key""".stripMargin,
    "q_raw_projection" ->
      """SELECT event_id AS block_number,
        |  '0x' || lpad(hex(event_id), 16, '0') AS block_id,
        |  hex(encode(props)) AS payload
        |FROM events ORDER BY block_number""".stripMargin,
    "q_stream_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,
    "q_stream_sliding" ->
      """SELECT ws, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws, value FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
        |    AS ws, value FROM events)
        |GROUP BY ws ORDER BY ws""".stripMargin,
    "q_stream_session" ->
      """WITH marks AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |grouped AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marks)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end, count(*) AS n
        |FROM grouped GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q_stream_dedup_latest" ->
      """SELECT user_id, event_type, epoch_us(max(ts)) AS last_us,
        |  count(*) AS n_events
        |FROM events GROUP BY 1, 2 ORDER BY user_id, event_type""".stripMargin,
    "q_scd2" ->
      """SELECT user_id, event_type, event_id,
        |  epoch_us(ts) AS valid_from,
        |  lead(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts, event_id) AS valid_to,
        |  lead(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts, event_id) IS NULL AS is_current
        |FROM events
        |ORDER BY user_id, event_type, valid_from, event_id""".stripMargin,
    "q_stream_topk" ->
      """WITH c AS (
        |  SELECT time_bucket(INTERVAL '6 hours', ts) AS ws, event_type,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT ws, event_type, n,
        |    CAST(row_number() OVER (PARTITION BY ws
        |      ORDER BY n DESC, event_type) AS INTEGER) AS rnk
        |  FROM c)
        |SELECT ws, event_type, n, rnk FROM r
        |WHERE rnk <= 3 ORDER BY ws, rnk""".stripMargin
  )
}
