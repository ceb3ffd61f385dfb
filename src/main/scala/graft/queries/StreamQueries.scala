package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.EventStreams

/** Streaming-analytics operators in batch-parity form (SURVEY.md §2E1–E2):
  * the exact transform that runs under Structured Streaming, executed over
  * the batch events table so the DuckDB oracle can grade it. The streaming
  * execution itself (MemoryStream → watermark → state) is exercised in
  * StreamingSpec.
  */
object StreamQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "events_windowed" -> { (s, d) =>
      EventStreams.windowedStats(Tables.events(s, d), "1 hour")
    },

    "events_sessionize" -> { (s, d) =>
      EventStreams.sessionizeBatch(Tables.events(s, d), gapSec = 21600)
        .select(col("user_id"), col("session_id"), col("session_start"),
          col("session_end"), col("n_events"), col("sum_value"))
    },

    // E19: view→click→purchase conversion funnel — sequential-min steps,
    // users-per-depth with mean entry-to-last-step latency.
    "events_funnel" -> { (s, d) =>
      EventStreams.funnel(Tables.events(s, d))
    },

    // E2 through Spark's native session_window aggregate — same sessions,
    // one declarative groupBy that also runs unchanged under streaming
    // (StreamingSpec proves batch ≡ stream ≡ window-function form)
    "events_sessionize_native" -> { (s, d) =>
      EventStreams.sessionizeSessionWindow(Tables.events(s, d), 21600L)
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), col("sum_value"))
    },

    // E3 batch-parity: the corpus is the table ∪ a 1-hour-late redelivery
    // of every event; first delivery wins.
    "events_dedup" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value")
      val redelivered = ev.unionByName(
        ev.withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR")))
      EventStreams.dedupEvents(redelivered)
        .select(col("event_id"), col("ts"),
          graft.core.Exact.rnd4(col("value")).as("value"))
    },

    // semi-structured props: JSON column → typed extraction (from_json with
    // an explicit schema — vectorized single parse, unlike repeated
    // get_json_object calls) → relational aggregate
    "events_json" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
            .getField("k").as("k"))
        .groupBy("event_type")
        .agg(sum("k").as("sum_k"), count(col("k")).as("n_k"),
          max("k").as("max_k"))
    },

    // E8 batch-parity: stream-stream interval join (click→view
    // attribution within 1 hour); the streaming twin with two watermarked
    // MemoryStreams is parity-tested in StreamingSpec.
    "events_attribution" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value")
      EventStreams.attribute(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "view"))
        .select(col("user_id"), col("click_id"), col("view_id"),
          graft.core.Exact.rnd4(col("value")).as("value"))
    },

    // E4 batch-parity: broadcast enrichment against the customer dim.
    "events_enrich" -> { (s, d) =>
      val dim = Tables.customer(s, d)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      EventStreams.enrich(Tables.events(s, d), dim)
        .select(col("event_id"), col("user_id"), col("c_mktsegment"))
    }
  )

  val oracle: Map[String, String] = Map(

    "events_windowed" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type,
        |  count(*) AS n,
        |  floor((CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // Mirror of events_funnel: the same three conditional-min steps with
    // strict-after joins, depth CASE and decimal-exact latency mean.
    "events_funnel" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |f1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |       WHERE event_type = 'view' GROUP BY 1),
        |f2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |       JOIN f1 ON f1.user_id = e.user_id AND e.ts > f1.t1
        |       WHERE e.event_type = 'click' GROUP BY 1),
        |f3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |       JOIN f2 ON f2.user_id = e.user_id AND e.ts > f2.t2
        |       WHERE e.event_type = 'purchase' GROUP BY 1),
        |pu AS (
        |  SELECT u.user_id,
        |    CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |         WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS depth,
        |    CASE WHEN t3 IS NOT NULL
        |           THEN CAST(epoch_us(t3) - epoch_us(t1) AS DOUBLE) / 1000000.0
        |         WHEN t2 IS NOT NULL
        |           THEN CAST(epoch_us(t2) - epoch_us(t1) AS DOUBLE) / 1000000.0
        |         ELSE 0.0 END AS span_sec
        |  FROM u LEFT JOIN f1 ON u.user_id = f1.user_id
        |  LEFT JOIN f2 ON u.user_id = f2.user_id
        |  LEFT JOIN f3 ON u.user_id = f3.user_id)
        |SELECT depth, count(*) AS n_users,
        |  floor((CAST(sum(CAST(span_sec AS DECIMAL(38,10))) AS DOUBLE)
        |    / count(span_sec)) * 10000 + 0.5) / 10000.0 AS avg_span_sec
        |FROM pu GROUP BY 1""".stripMargin,

    "events_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 21600000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    -- CAST: DuckDB sum(BIGINT) is HUGEINT, which pandas renders as
        |    -- float and the driver's value-hash then mismatches Spark's long
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events,
        |  floor((CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS sum_value
        |FROM s GROUP BY 1, 2""".stripMargin,

    "events_sessionize_native" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 21600000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events,
        |  floor((CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS sum_value
        |FROM s GROUP BY user_id, session_id""".stripMargin,

    "events_dedup" ->
      """WITH r AS (
        |  SELECT event_id, ts, user_id, value FROM events
        |  UNION ALL
        |  SELECT event_id, ts + INTERVAL 1 HOUR, user_id, value FROM events),
        |d AS (
        |  SELECT event_id, ts, value,
        |    row_number() OVER (PARTITION BY event_id
        |      ORDER BY ts, user_id) AS rn
        |  FROM r)
        |SELECT event_id, ts, floor((value) * 10000 + 0.5) / 10000.0 AS value
        |FROM d WHERE rn = 1""".stripMargin,

    "events_enrich" ->
      """SELECT event_id, user_id, c_mktsegment
        |FROM events LEFT JOIN customer ON user_id = c_custkey""".stripMargin,

    "events_attribution" ->
      """SELECT c.user_id, c.event_id AS click_id, v.event_id AS view_id,
        |  floor((v.value) * 10000 + 0.5) / 10000.0 AS value
        |FROM events c JOIN events v
        |  ON v.user_id = c.user_id
        | AND c.event_type = 'click' AND v.event_type = 'view'
        | AND v.ts >= c.ts AND v.ts < c.ts + INTERVAL 3600 SECONDS""".stripMargin,

    "events_json" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS BIGINT) AS sum_k,
        |  count(json_extract_string(props, '$.k')) AS n_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1""".stripMargin
  )
}
