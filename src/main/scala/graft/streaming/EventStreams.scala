package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` table: watermarked
  * windowed aggregation and stateful sessionization — the streaming
  * operators a complete engine offers beyond the reference's batch-only
  * scans (SURVEY.md §1.3/§7).
  *
  * Sources read the parquet directory as a file stream (each file = one
  * micro-batch in tests via availableNow); at scale the same plans run
  * against kafka/chain-stream sources unchanged — the transforms below only
  * assume an `events`-shaped streaming DataFrame.
  */
object EventStreams {

  val eventSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")

  private val eventSchemaNtz = org.apache.spark.sql.types.StructType.fromDDL(
    "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING, value DOUBLE, props STRING")

  /** Streaming read of an events dir (ts normalized to TimestampType).
    * Streams must declare their schema up front, so a footer probe of the
    * same glob picks between the two generator encodings the batch reader
    * ([[graft.Tables.events]]) handles: int64 nanos vs timestamp[us]. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val glob = s"$dir/events.*" // glob: basePath must be the directory
    val nanos = spark.read.parquet(glob).schema("ts").dataType ==
      org.apache.spark.sql.types.LongType
    val raw = spark.readStream
      .schema(if (nanos) eventSchema else eventSchemaNtz)
      .parquet(glob)
    if (nanos) raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw.withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Watermarked tumbling-window counts/sums per event type. */
  def windowedStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"),
              col("total_value"))

  /** Streaming exact dedup — the streaming face of the batch
    * [[graft.operators.Dedup.exact]] stage: dedup on a content digest
    * within the watermark horizon. The digest (not the payload) is the
    * dedup key, so the state store holds ~48 bytes/doc, and
    * `dropDuplicatesWithinWatermark` lets the store EVICT keys older than
    * the watermark — the only way streaming dedup state stays bounded on
    * an unbounded corpus. Exactly-once output with checkpointing. */
  def streamingDedup(docs: DataFrame, tsCol: String = "ts",
      textCol: String = "text", horizon: String = "10 minutes"): DataFrame =
    docs
      .withColumn("text_key",
        md5(trim(regexp_replace(lower(col(textCol)), "[^a-z0-9]+", " "))))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("text_key")

  case class Scd2Input(user_id: Long, event_id: Long, event_type: String,
      tsMs: Long)
  case class Scd2State(attr: String, validFrom: Long, ver: Long, n: Long)
  case class Scd2Out(user_id: Long, ver: Long, attr: String,
      valid_from: Long, valid_to: Long, n_events: Long)

  /** STREAMING SCD2 dimension maintenance — the continuous form of
    * [[graft.operators.Events.scd2History]]: one open version per user in
    * state (O(|users|) rows, each a 4-field struct — bounded forever);
    * an attribute change CLOSES the open version (emitted, Append mode)
    * and opens the next. The drained output is exactly the batch
    * history's closed rows (`valid_to IS NOT NULL`), version ids and all
    * — [[graft.StreamQueriesSpec]] asserts row-for-row equality and the
    * shared oracle pins it cross-engine.
    *
    * Rows within a micro-batch may arrive unsorted ([[sessionize]]'s
    * contract): sort per group by `(tsMs, event_id)`, then fold; across
    * batches the parquet micro-batch order preserves event order, the
    * same assumption every stateful row here documents. */
  def scd2Stream(events: DataFrame): Dataset[Scd2Out] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
              unix_millis(col("ts")).as("tsMs"))
      .as[Scd2Input]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Out](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Scd2Input], state: GroupState[Scd2State]) =>
          val sorted = rows.toVector.sortBy(e => (e.tsMs, e.event_id))
          var cur = state.getOption.orNull
          val closed = Vector.newBuilder[Scd2Out]
          sorted.foreach { e =>
            if (cur == null) {
              cur = Scd2State(e.event_type, e.tsMs, 1L, 1L)
            } else if (cur.attr == e.event_type) {
              cur = cur.copy(n = cur.n + 1L)
            } else {
              closed += Scd2Out(user, cur.ver, cur.attr, cur.validFrom,
                e.tsMs, cur.n)
              cur = Scd2State(e.event_type, e.tsMs, cur.ver + 1L, 1L)
            }
          }
          if (cur != null) state.update(cur)
          closed.result().iterator
      }
  }

  case class SessionInput(user_id: Long, tsMs: Long, value: Double)
  case class SessionState(start: Long, last: Long, n: Int, total: Double)
  case class SessionOut(user_id: Long, session_start: Long, session_end: Long,
      n_events: Int, total_value: Double)

  /** Gap-based sessionization via flatMapGroupsWithState: a session closes
    * after `gapMs` of user inactivity (event-time approximated by max seen
    * ts per user; timeout drives emission). State per user is O(1). */
  def sessionize(events: DataFrame, gapMs: Long = 30 * 60 * 1000L): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), unix_millis(col("ts")).as("tsMs"), col("value"))
      .as[SessionInput]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[SessionInput], state: GroupState[List[SessionState]]) =>
          // events within a micro-batch may arrive unsorted: sort, then fold
          val sorted = rows.toVector.sortBy(_.tsMs)
          var sessions = state.getOption.getOrElse(Nil)
          val closed = Vector.newBuilder[SessionOut]
          sorted.foreach { e =>
            sessions match {
              case cur :: rest if e.tsMs - cur.last <= gapMs =>
                sessions = cur.copy(last = e.tsMs, n = cur.n + 1,
                  total = cur.total + e.value) :: rest
              case cur :: rest =>
                closed += SessionOut(user, cur.start, cur.last, cur.n, cur.total)
                sessions = SessionState(e.tsMs, e.tsMs, 1, e.value) :: rest
              case Nil =>
                sessions = SessionState(e.tsMs, e.tsMs, 1, e.value) :: Nil
            }
          }
          state.update(sessions)
          closed.result().iterator
      }
  }

  /** Stream-stream event-time INTERVAL join — the attribution shape: each
    * `purchase` joined to the same user's `click`s in the preceding
    * `windowMs`. Both sides carry a watermark and the join condition
    * bounds each side's event time by the other's, so the state store
    * evicts a row as soon as the opposite watermark passes its match
    * window — bounded state on unbounded streams, the canonical
    * stream-stream join discipline.
    *
    * Event times are truncated to whole milliseconds BEFORE the join so
    * the boundary comparison is at the same resolution the oracle's
    * `epoch_ms` replay uses.
    *
    * `horizon` trades completeness for state: a drained oracle replay
    * passes a horizon ≥ the replayed span (files are not time-ordered, so
    * any tighter horizon could legally drop cross-batch matches as late);
    * production uses the real lateness bound. */
  def attributionJoin(events: DataFrame, windowMs: Long = 86400000L,
      horizon: String = "35 days"): DataFrame = {
    val ms = timestamp_millis(unix_millis(col("ts")))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), ms.as("p_ts"),
              col("user_id").as("p_user"), col("value").as("p_value"))
      .withWatermark("p_ts", horizon)
    val c = events.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), ms.as("c_ts"),
              col("user_id").as("c_user"))
      .withWatermark("c_ts", horizon)
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowMs MILLISECONDS") &&
        col("c_ts") <= col("p_ts"))
  }
}
