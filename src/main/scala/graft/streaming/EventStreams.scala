package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.Exact

/** One raw event (events.parquet row, minus props). */
case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                 event_type: String, value: Double)

/** A closed user session. */
case class Session(user_id: Long, session_start: Timestamp,
                   session_end: Timestamp, n_events: Long, sum_value: Double)

/** Mutable session accumulator kept in streaming state (µs epoch times). */
case class SessionState(startUs: Long, endUs: Long, n: Long, sum: Double)

/** Streaming analytics over the events stream (SURVEY.md §2E1–E2).
  *
  * Each operator has one transform that works identically on batch and
  * streaming DataFrames (run the parquet table through it for the oracle
  * gate; run a readStream through it in production), plus — for
  * sessionization, where streaming needs explicit state — a
  * flatMapGroupsWithState twin whose output is checked against the batch
  * semantics in ScalaTest.
  *
  * Scale: the windowed aggregation is a standard partial-agg shuffle keyed
  * on (window, type) — bounded state under watermark eviction. Session
  * state is one small record per active user; timeouts evict closed
  * sessions, so state size tracks concurrent users, not history.
  */
object EventStreams extends Serializable {

  /** E1: tumbling-window stats per event type. Works on batch and
    * streaming inputs; on streaming the watermark bounds state and
    * admits `delay` of lateness.
    */
  def windowedStats(events: DataFrame, windowLen: String = "1 hour",
                    delay: String = "1 day"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", delay) else events
    src.groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Exact.rnd4(Exact.esum(col("value"))).as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"),
        col("sum_value"))
  }

  /** E3: exact streaming dedup by key — keep the FIRST occurrence of each
    * `event_id` (at-least-once sources re-deliver; training pipelines must
    * not double-count). One transform for both modes:
    *  - streaming: `dropDuplicatesWithinWatermark` keeps per-key state only
    *    until the watermark passes, so state is bounded by the lateness
    *    horizon, not the stream's history;
    *  - batch: first-occurrence via min(ts, event_id) per key — the same
    *    "first delivery wins" contract, expressible as one groupBy.
    */
  def dedupEvents(events: DataFrame, delay: String = "1 day"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark("event_id")
    else {
      val w = Window.partitionBy("event_id").orderBy(col("ts"), col("user_id"))
      events.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
    }

  /** E4: stream-static enrichment — the streaming fact joins a static
    * dimension table with a broadcast hash join, so each micro-batch is
    * map-side only (the classic star-schema shape at any scale: the stream
    * never shuffles for the join). Identical transform for batch parity.
    */
  def enrich(events: DataFrame, dim: DataFrame,
             key: String = "user_id"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** E8: stream-stream interval join — attribute each view to every click
    * by the same user within `[click_ts, click_ts + horizon)`. The classic
    * two-stream correlation: in streaming BOTH sides carry watermarks and
    * the event-time range condition lets Spark bound the join state (each
    * side's buffered rows are evicted once the other side's watermark
    * passes the interval — state tracks the horizon, not the stream's
    * history). The identical transform runs on batch frames for the
    * oracle gate.
    */
  def attribute(clicks: DataFrame, views: DataFrame,
                horizonSec: Long = 3600,
                delay: String = "1 hour"): DataFrame = {
    def wm(df: DataFrame) =
      if (df.isStreaming) df.withWatermark("ts", delay) else df
    val c = wm(clicks).select(col("user_id"),
      col("event_id").as("click_id"), col("ts").as("click_ts"))
    val v = wm(views).select(col("user_id").as("_vu"),
      col("event_id").as("view_id"), col("ts").as("view_ts"), col("value"))
    c.join(v, col("user_id") === col("_vu") &&
        col("view_ts") >= col("click_ts") &&
        col("view_ts") < col("click_ts") + expr(s"INTERVAL $horizonSec SECONDS"))
      .select(col("user_id"), col("click_id"), col("view_id"),
        col("click_ts"), col("view_ts"), col("value"))
  }

  /** E2 batch form: gap-based sessionization with window functions — a
    * session breaks when the inter-event gap exceeds `gapSec`. Exact µs
    * arithmetic; deterministic (ts, event_id) ordering.
    */
  def sessionizeBatch(events: DataFrame, gapSec: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val prevUs = lag(graft.core.Exact.epochUs(col("ts")), 1).over(w)
    val isNew = when(
      prevUs.isNull || graft.core.Exact.epochUs(col("ts")) - prevUs > gapSec * 1000000L, 1)
      .otherwise(0)
    events
      .withColumn("_new", isNew)
      .withColumn("session_id", sum(col("_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        Exact.rnd4(Exact.esum(col("value"))).as("sum_value"))
  }

  /** E19: multi-step conversion funnel — per user the earliest `view`,
    * the earliest `click` strictly after it, the earliest `purchase`
    * strictly after that (sequential-min semantics, the standard funnel
    * definition), aggregated to users-per-depth with the mean
    * entry-to-last-step latency. Deterministic: every step is a `min`
    * over exact timestamps; the latency mean is a decimal-exact sum over
    * exact microsecond differences.
    *
    * Scale shape: three conditional-min aggregates keyed on user_id —
    * partial aggregation collapses each map-side, the step joins are
    * O(users) on the same key (one hash partitioning reused), and the
    * final depth rollup is O(users) → 4 rows. No windows, no event-order
    * sort: "earliest X after t" is a filtered min, which at lake scale
    * beats a per-user sequence scan.
    */
  def funnel(events: DataFrame,
             steps: Seq[String] = Seq("view", "click", "purchase"))
      : DataFrame = {
    require(steps.size == 3, "funnel: exactly three steps")
    val e = events.select(col("user_id"), col("event_type"), col("ts"))
    val users = e.select(col("user_id")).distinct()
    val t1 = e.filter(col("event_type") === steps(0))
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val t2 = e.filter(col("event_type") === steps(1))
      .join(t1, Seq("user_id"))
      .filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val t3 = e.filter(col("event_type") === steps(2))
      .join(t2, Seq("user_id"))
      .filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    val perUser = users
      .join(t1, Seq("user_id"), "left")
      .join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("t3").isNotNull, 3).when(col("t2").isNotNull, 2)
          .when(col("t1").isNotNull, 1).otherwise(0).as("depth"),
        when(col("t3").isNotNull,
            (Exact.epochUs(col("t3")) - Exact.epochUs(col("t1")))
              .cast("double") / lit(1000000.0))
          .when(col("t2").isNotNull,
            (Exact.epochUs(col("t2")) - Exact.epochUs(col("t1")))
              .cast("double") / lit(1000000.0))
          .otherwise(lit(0.0)).as("span_sec"))
    perUser.groupBy("depth")
      .agg(count(lit(1)).as("n_users"),
        Exact.rnd4(Exact.eavg(col("span_sec"))).as("avg_span_sec"))
  }

  /** E2 via Spark's NATIVE `session_window`: the same gap sessions as one
    * declarative aggregate that runs identically on batch and streaming
    * inputs — no window functions, no hand-written state (Spark's
    * streaming session aggregation manages/merges/evicts the state under
    * the watermark). The +1 µs widens session_window's half-open window
    * end onto the batch form's strictly-greater-than gap test ("a gap
    * STRICTLY exceeding gapSec breaks"), so an event exactly gapSec after
    * its predecessor joins the same session in both forms.
    */
  def sessionizeSessionWindow(events: DataFrame, gapSec: Long,
                              delay: String = "1 day"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", delay)
              else events
    src.groupBy(col("user_id"),
        session_window(col("ts"),
          s"${gapSec * 1000000L + 1} microseconds").as("_sw"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        Exact.rnd4(Exact.esum(col("value"))).as("sum_value"))
      .drop("_sw")
  }

  /** E2 streaming twin: flatMapGroupsWithState with event-time timeout.
    * State per user is the open session; a session closes either inline
    * (a same-batch event arrives past the gap) or via timeout when the
    * watermark passes session_end + gap. Emission is append-mode — each
    * closed session exactly once.
    */
  /** java.sql.Timestamp keeps sub-millisecond precision in its nanos field;
    * events carry microseconds, so state arithmetic must round-trip the
    * full µs value, not just getTime's milliseconds. */
  private def tsToUs(t: Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  private def usToTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000).toInt)
    t
  }

  def sessionizeStream(events: Dataset[Event], gapSec: Long,
                       delay: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSec * 1000000L

    def toSession(uid: Long, s: SessionState): Session =
      Session(uid, usToTs(s.startUs), usToTs(s.endUs), s.n, s.sum)

    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(toSession(uid, _)).toList
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(e => (tsToUs(e.ts), e.event_id))
            var open = state.getOption
            val closed = List.newBuilder[Session]
            sorted.foreach { e =>
              val us = tsToUs(e.ts)
              open match {
                case Some(s) if us - s.endUs <= gapUs =>
                  open = Some(SessionState(s.startUs, math.max(s.endUs, us),
                    s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += toSession(uid, s)
                  open = Some(SessionState(us, us, 1, e.value))
                case None =>
                  open = Some(SessionState(us, us, 1, e.value))
              }
            }
            open match {
              case Some(s) =>
                state.update(s)
                // close when the watermark passes the gap horizon
                state.setTimeoutTimestamp(s.endUs / 1000 + gapSec * 1000)
              case None => state.remove()
            }
            closed.result().iterator
          }
      }
  }
}
