package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Streaming surface (SURVEY.md §2.2 "Streaming"): the reference's
  * embryonic reactive pieces — MutationObserver table discovery (O20),
  * per-row pacing (O14), cancellation (O16), live progress (O15) —
  * generalized to Structured Streaming: file-source discovery, windowed
  * aggregation with watermarks, and a rate-limited sink.
  *
  * The window/sessionize transforms are written against plain
  * DataFrames so the SAME function serves batch (DuckDB-oracle-checked)
  * and streaming (`readStream` + the specs' memory sink): Structured
  * Streaming's unified model makes the batch run the semantic oracle
  * for the streaming run.
  */
object StreamingOps {

  /** Tumbling window aggregate: one shuffle on (window, event_type).
    * In streaming mode add `withWatermark` before calling.
    */
  def tumblingCounts(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding window aggregate (width > slide ⇒ each event lands in
    * width/slide windows).
    */
  def slidingCounts(events: DataFrame, width: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Batch sessionization with a max-gap rule: a session break is a gap
    * > gapMinutes from the previous event of the same user. Two window
    * passes over the same (user_id, ts) partitioning — Catalyst plans a
    * single shuffle, both windows reuse the sort.
    *
    * The streaming twin is `session_window(col("ts"), gap)`; this batch
    * formulation is the oracle-checkable equivalent.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // compare in integral microseconds — second-truncating APIs disagree
    // across engines on sub-second boundary gaps
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_break",
        (col("prev_ts").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > gapMicros)
          .cast("long"))
      .withColumn("session_id",
        sum(col("is_break")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"),
           sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Native `session_window` sessionization — Spark's built-in merging
    * session operator (the one the streaming path uses with state +
    * watermark). Semantics (pinned by StreamingSpec's boundary test):
    * an event extends its session while ts − prev_ts <= gap (an
    * EXACT-gap event still merges; only > gap splits), and
    * session_end = last_ts + gap. The DuckDB oracle re-derives the
    * same islands with a lag() break at `> gap`, so the registry entry
    * is a cross-engine proof that the native operator matches the
    * manual gap-island formulation.
    */
  def nativeSessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           min(col("event_id")).as("first_event_id"),
           sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"),
        col("first_event_id"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** Per-window audience size: tumbling window × exact distinct users —
    * the cardinality shape every streaming dashboard needs. Exact
    * count_distinct shuffles (window, user) once for dedup and once for
    * the count; the approx_count_distinct variant (xtr_approx_distinct)
    * is the one-shuffle sketch path at 100 TB.
    */
  def windowUserCounts(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width))
      .agg(count_distinct(col("user_id")).as("n_users"),
           count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_users"), col("n_events"))
      .orderBy(col("window_start"))

  /** Streaming source over a parquet directory — the O20 analog: new
    * files are discovered per micro-batch. `maxFilesPerTrigger`
    * throttles discovery (the O14 rate-limit at source granularity).
    */
  def fileStream(spark: SparkSession, dir: String,
                 schema: org.apache.spark.sql.types.StructType,
                 maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Watermarked tumbling aggregation for the streaming path: late rows
    * beyond `lateness` are dropped, state is bounded — the 100 TB-stream
    * posture (unbounded state is the scale killer, not throughput).
    */
  def watermarkedCounts(events: DataFrame, width: String, lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** O14/O16/O17 sink: rate-limited, per-row-error-isolated foreachBatch
    * writer. Pacing happens per PARTITION (executor-local sleep), so
    * global throughput = partitions/sec × rowsPerSecPerPartition — the
    * distributed generalization of the reference's serial 400 ms sleep.
    * Row failures are counted, never fatal (OBP.js:475-497 semantics);
    * results surface through the returned accumulators.
    */
  def rateLimitedForeach(df: DataFrame, rowsPerSecPerPartition: Int)(
      commit: Row => Unit): (Long, Long) = {
    val spark = df.sparkSession
    val ok = spark.sparkContext.longAccumulator("rows_committed")
    val err = spark.sparkContext.longAccumulator("rows_failed")
    val intervalNanos =
      if (rowsPerSecPerPartition <= 0) 0L else 1000000000L / rowsPerSecPerPartition
    df.foreachPartition { (rows: Iterator[Row]) =>
      var nextDeadline = System.nanoTime()
      rows.foreach { row =>
        if (intervalNanos > 0) {
          val now = System.nanoTime()
          if (now < nextDeadline) Thread.sleep((nextDeadline - now) / 1000000L)
          nextDeadline = math.max(now, nextDeadline) + intervalNanos
        }
        try { commit(row); ok.add(1) }
        catch { case _: Exception => err.add(1) } // row failure ≠ job failure
      }
    }
    (ok.value, err.value)
  }

  /** Streaming writer with the same pacing, as a foreachBatch sink. */
  def rateLimitedStreamWriter(df: DataFrame, rowsPerSecPerPartition: Int)(
      commit: Row => Unit): DataStreamWriter[Row] =
    df.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
      rateLimitedForeach(batch.toDF(), rowsPerSecPerPartition)(commit)
      ()
    }

  /** Event row for the typed stateful operator. */
  case class UserEvent(user_id: Long, event_id: Long, value: Double)
  /** Running per-user state for `runningUserTotals`. */
  case class UserState(n: Long, total: Double)
  case class UserTotal(user_id: Long, n_events: Long, total: Double)

  /** Custom keyed state via mapGroupsWithState: a running per-user
    * (count, sum) that survives across micro-batches — the arbitrary-
    * state API for semantics window aggregates can't express. State
    * size is O(distinct keys), the streaming scale bound that matters.
    * Works identically on a batch Dataset (state seen once per key).
    */
  def runningUserTotals(events: org.apache.spark.sql.Dataset[UserEvent])
      : org.apache.spark.sql.Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserTotal](GroupStateTimeout.NoTimeout) {
        case (userId, rows, state) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { e => n += 1; total += e.value }
          state.update(UserState(n, total))
          UserTotal(userId, n, total)
      }
  }

  /** Stream-stream INNER join with event-time bounds: each click joins
    * purchases by the same user within [click, click + window]. Both
    * sides carry watermarks, so the join state (buffered unmatched
    * rows) is bounded — the condition's time band plus the watermark is
    * what lets Spark evict state, the requirement for an unbounded
    * 100 TB/day stream pair.
    */
  def clickToPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
                          windowMinutes: Int = 10): DataFrame =
    clicks
      // rename (not project) the key/time columns: payload columns ride
      // through the join — attribution needs them on the other side
      .withColumnRenamed("user_id", "c_user").withColumnRenamed("ts", "c_ts")
      .withWatermark("c_ts", s"$windowMinutes minutes")
      .join(
        purchases
          .withColumnRenamed("user_id", "p_user").withColumnRenamed("ts", "p_ts")
          .withWatermark("p_ts", s"$windowMinutes minutes"),
        expr(s"""c_user = p_user AND
                 p_ts >= c_ts AND
                 p_ts <= c_ts + INTERVAL $windowMinutes MINUTES"""))

  /** Stream-stream LEFT OUTER join in the same time band: a click with
    * no purchase inside its window is HELD AS STATE until the watermark
    * passes the end of its band, then emitted with nulls — outer
    * results can only be produced once "no match can still arrive" is
    * provable, which is exactly what the watermark provides. Same
    * bounded-state posture as the inner variant.
    */
  def clickToPurchaseLeftJoin(clicks: DataFrame, purchases: DataFrame,
                              windowMinutes: Int = 10): DataFrame =
    clicks
      .withColumnRenamed("user_id", "c_user").withColumnRenamed("ts", "c_ts")
      .withWatermark("c_ts", s"$windowMinutes minutes")
      .join(
        purchases
          .withColumnRenamed("user_id", "p_user").withColumnRenamed("ts", "p_ts")
          .withWatermark("p_ts", s"$windowMinutes minutes"),
        expr(s"""c_user = p_user AND
                 p_ts >= c_ts AND
                 p_ts <= c_ts + INTERVAL $windowMinutes MINUTES"""),
        "left_outer")

  /** BATCH analog of [[clickToPurchaseJoin]] over the events table —
    * identical inner-join semantics on complete data (the watermark
    * only bounds state; it never changes which pairs an inner band join
    * emits), so this form gets a DuckDB hash oracle and the spec
    * cross-checks the true streaming operator against it. Planned as an
    * equi-join on user_id with the band as a residual condition: the
    * pair space is per-user, never the whole table.
    */
  def clickAttributionBatch(events: DataFrame, windowMinutes: Int = 10): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
    clicks.join(purchases, Seq("user_id"))
      .filter(col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        expr("(unix_micros(p_ts) - unix_micros(c_ts)) div 60000000")
          .as("mins_to_purchase"),
        col("purchase_value"))
      .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
  }

  /** Streaming exact dedup: drop events whose key was already seen,
    * with state bounded by the watermark (an unbounded seen-set is the
    * streaming scale killer — the watermark ages keys out, trading
    * forever-exactness for bounded memory, the standard pipeline
    * contract). On a batch Dataset the same call degenerates to
    * dropDuplicates.
    */
  def streamingDedup(events: DataFrame, keys: Seq[String],
                     lateness: String): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keys)

  /** Deterministic batch equivalent of [[streamingDedup]]: one row per
    * dedup key — the EARLIEST by (ts, event_id), which is exactly what
    * the streaming path emits when events arrive in event-time order
    * (cross-checked in StreamingSpec). The key here is the standard
    * at-least-once collapse: same user, same action, same minute.
    *
    * Scale shape: the argmin pair is PACKED into one orderable decimal
    * (epoch-µs × 10^10 + event_id — lexicographic order preserved while
    * event_id < 10^10). min(struct(...)) would be semantically
    * identical but structs are not hash-aggregable: Spark plans them as
    * SortAggregate, which sorts every input partition by the group key
    * — n·log n over the full table. The packed scalar keeps the plan a
    * two-phase HashAggregate with map-side combine (plan-audited).
    */
  def firstEventPerKey(events: DataFrame): DataFrame =
    events
      .withColumn("minute", date_trunc("minute", col("ts")))
      .groupBy(col("user_id"), col("event_type"), col("minute"))
      .agg(min(expr(
          // the packing is total only while event_id ∈ [0, 10^10) and ts
          // is post-epoch (decimal % takes the dividend's sign) — guarded
          // in-plan so a violating input fails loudly instead of silently
          // corrupting first_event_id/first_ts
          "CASE WHEN event_id < 0 OR event_id >= 10000000000 OR unix_micros(ts) < 0 " +
          "THEN CAST(raise_error('firstEventPerKey: event_id/ts outside packed-decimal domain') AS DECIMAL(18,0)) " +
          "ELSE CAST(unix_micros(ts) AS DECIMAL(18,0)) * 10000000000 + event_id END"))
          .as("p"),
        count(lit(1)).as("n_dups"))
      .select(col("user_id"), col("event_type"), col("minute"),
        expr("CAST(p % 10000000000 AS BIGINT)").as("first_event_id"),
        timestamp_micros(
          expr("CAST((p - p % 10000000000) / 10000000000 AS BIGINT)"))
          .as("first_ts"),
        col("n_dups"))
      .orderBy(col("user_id"), col("event_type"), col("minute"))

  case class SessionRow(user_id: Long, session_start: Long, session_end: Long,
                        n_events: Long)
  // must be public: the state encoder's generated code instantiates it
  case class SessionState(start: Long, last: Long, n: Long)

  /** flatMapGroupsWithState sessionizer: emits a session row ONLY when
    * the session CLOSES (event-time gap exceeded via processing of a
    * later event, or state timeout) — the push-style counterpart of the
    * lag-based batch sessionize; zero rows while a session is open.
    * State per user is O(1); emitted micro-batch output is append-only.
    */
  def closedSessions(events: org.apache.spark.sql.Dataset[UserStamp],
                     gapMs: Long)
      : org.apache.spark.sql.Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, rows, state) =>
          // rows within a micro-batch arrive unordered: sort locally
          val ts = rows.map(_.ts_ms).toSeq.sorted
          var closed = List.empty[SessionRow]
          var st = state.getOption.getOrElse(
            SessionState(ts.head, ts.head, 0L))
          ts.foreach { t =>
            if (t - st.last > gapMs) {
              closed ::= SessionRow(userId, st.start, st.last, st.n)
              st = SessionState(t, t, 1L)
            } else st = SessionState(st.start, t, st.n + 1L)
          }
          state.update(st)
          closed.reverseIterator
      }
  }

  case class UserStamp(user_id: Long, ts_ms: Long)

  /** O16 — cooperative cancellation: tag a job group, cancel it from
    * another thread; committed work stands (partial results persist,
    * OBP.js:456-458, 502).
    */
  def runCancellable[T](spark: SparkSession, group: String)(body: => T): T = {
    spark.sparkContext.setJobGroup(group, s"graft cancellable job $group",
      interruptOnCancel = true)
    try body finally spark.sparkContext.clearJobGroup()
  }

  def cancel(spark: SparkSession, group: String): Unit =
    spark.sparkContext.cancelJobGroup(group)

  /** Deterministic batch model of WATERMARK late-data accounting.
    * Structured Streaming advances the event-time watermark at
    * micro-batch boundaries: during batch n the watermark is the max
    * event time seen in batches < n minus the allowed delay, and
    * stateful operators drop rows older than it. The fixture's events
    * are perfectly time-ordered, so ARRIVAL is modeled as event time
    * plus a deterministic md5-keyed transport jitter (0–60 min — the
    * portable-hash device of `Text.tokenHash`), and micro-batches are
    * fixed wall-clock arrival windows, exactly like a trigger
    * interval. Every per-event step is a stateless projection; the
    * watermark table has #batches rows (grows with wall-clock, not
    * volume), so the one unpartitioned running-max window runs over
    * BATCH AGGREGATES and rejoins the fact as a broadcast. Output: per
    * event type, total/late/on-time counts and the late share — the
    * accounting a pipeline publishes to decide whether its delay
    * budget is right.
    */
  def lateDataAudit(events: DataFrame, delayMinutes: Int = 30,
                    batchSeconds: Long = 3600L,
                    jitterSeconds: Long = 3600L): DataFrame = {
    // arrival = event time + md5-keyed jitter; batch = arrival hour.
    // `div` (not `/`): double division loses integer µs precision
    val batchExpr =
      s"""(unix_micros(ts) + pmod(cast(conv(substring(md5(
         |  concat('lda:', cast(event_id as string))), 1, 8), 16, 10)
         |  as bigint), $jitterSeconds) * 1000000L)
         |  div ${batchSeconds * 1000000L}L""".stripMargin
    val withBatch = events.select(col("event_type"),
      unix_micros(col("ts")).as("tsu"),
      expr(batchExpr).as("batch_id"))
    val batchMax = withBatch.groupBy(col("batch_id"))
      .agg(max(col("tsu")).as("bmax"))
    // strictly-previous frame: the first batch sees no watermark
    // (NULL → keep), matching a stream's cold start
    val w = Window.orderBy(col("batch_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wm = batchMax.select(col("batch_id"),
      (max(col("bmax")).over(w) - lit(delayMinutes * 60000000L)).as("wmu"))
    withBatch.join(broadcast(wm), Seq("batch_id"))
      .withColumn("late", col("wmu").isNotNull && col("tsu") < col("wmu"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
        sum(when(col("late"), 0L).otherwise(1L)).as("n_on_time"))
      .select(col("event_type"), col("n_events"), col("n_late"),
        col("n_on_time"),
        (col("n_late").cast("double") / col("n_events")).as("late_share"))
      .orderBy(col("event_type"))
  }
}
