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
    }
  )

  val oracle: Map[String, String] = Map(

    "events_windowed" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type,
        |  count(*) AS n,
        |  floor((CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

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
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM g)
        |SELECT user_id, session_id,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events,
        |  floor((CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS sum_value
        |FROM s GROUP BY 1, 2""".stripMargin
  )
}
