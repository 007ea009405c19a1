package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingestion of the progress/event stream. The reference has no
  * streaming operators (SURVEY.md §2: progress counters are Redis
  * increments, `cache/progress.py:34-58`); this module is the Structured
  * Streaming analogue — incremental windowed aggregation of run events
  * with a watermark — so live runs can report rates without re-scanning.
  */
object EventStream {

  /** Gap-based sessionization of the event stream (batch form): events of
    * one user separated by more than `gapSeconds` start a new session.
    * Classic lag-flag-cumsum: flag rows whose predecessor (per user, by
    * ts then event_id for total order under ts ties) is further than the
    * gap, running-sum the flags into a per-user session sequence, then
    * aggregate per session. Output: (user_id, session_seq, n_events,
    * start_s, end_s, duration_s, sum_value).
    *
    * Scale shape: both windows and the final agg are keyed by user_id —
    * ONE hash shuffle total (the two windows share the exact
    * partitioning+ordering, the agg reuses the partitioning); per-task
    * sort is bounded by a user's history, never a global sort. The
    * streaming analogue is `window(session_window(...))`/
    * mapGroupsWithState; this is the backfill form a pipeline runs over
    * historical data. */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withFlag = events
      .select(col("user_id"), col("event_id"), col("value"),
        unix_timestamp(col("ts").cast("timestamp")).as("es"))
      .withColumn("new_sess",
        when(col("es") - lag(col("es"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id")))
          > gapSeconds, 1L).otherwise(lit(0L)))
    val seq = withFlag.withColumn("session_seq",
      sum(col("new_sess")).over(
        Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    seq.groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("es")).as("start_s"), max(col("es")).as("end_s"),
        (max(col("es")) - min(col("es"))).as("duration_s"),
        round(sum(col("value")), 4).as("sum_value"))
  }

  /** Ordered conversion funnel: for each user, the earliest time of
    * stage 1, then the earliest stage-2 event AT OR AFTER it, then the
    * earliest stage-3 event at or after that, etc. Later stages are null
    * once the chain breaks — the per-user row is the standard funnel
    * drop-off report.
    *
    * Scale shape: one conditional-min hash aggregation per stage, all
    * keyed by the user — every groupBy and join reuses the same hash
    * partitioning, so stages after the first shuffle only the per-user
    * accumulator row (events themselves shuffle once). No windows, no
    * per-user sort, no event-list collection. */
  def funnel(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(stages.nonEmpty)
    val base = events.select(col(userCol).as("user_id"),
      col(typeCol).as("et"),
      unix_micros(col(tsCol).cast("timestamp")).as("t"))
    var acc = base.groupBy("user_id")
      .agg(min(when(col("et") === stages.head, col("t"))).as("t1"))
      .where(col("t1").isNotNull)
    for ((st, i) <- stages.tail.zipWithIndex) {
      val prev = s"t${i + 1}"
      val keys = col("user_id") +: (1 to i + 1).map(j => col(s"t$j"))
      acc = base.join(acc, "user_id")
        .groupBy(keys: _*)
        .agg(min(when(col("et") === st && col("t") >= col(prev), col("t")))
          .as(s"t${i + 2}"))
    }
    acc
  }

  /** Cohort retention matrix: users bucketed by their FIRST-active ISO
    * week (the cohort), counted at each later week they were active —
    * the standard activity-retention readout (row = cohort, column =
    * weeks-since-signup, cell = distinct active users).
    *
    * week_offset 0 row of each cohort is its size; cells are exact
    * distinct-user counts via the (user, week) dedup, so no
    * countDistinct pass is needed. Cohort keys are emitted as
    * 'yyyy-MM-dd' strings (cross-engine-stable date text).
    *
    * Scale shape: one (user, week) hash dedup, one per-user min agg,
    * one key join, one count agg — all hash-partitioned by user/cohort
    * keys, no windows. */
  def retentionCohorts(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val ev = events.select(col(userCol).as("user_id"),
        date_trunc("week", col(tsCol)).cast("date").as("w"))
      .distinct()
    val cohorts = ev.groupBy("user_id").agg(min(col("w")).as("cw"))
    ev.join(cohorts, "user_id")
      .select(col("cw"), expr("datediff(w, cw) DIV 7").cast("int")
        .as("week_offset"))
      .groupBy(col("cw").cast("string").as("cohort_week"),
        col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Tumbling-window per-type counts + value sums with a watermark for
    * late data. Works over any source df (batch or streaming) — same plan
    * both ways, which is how the equivalence test pins semantics. */
  def windowedRates(events: DataFrame, window_ : String = "1 day",
      watermark: String = "2 days"): DataFrame = {
    // parquet TIMESTAMP_NTZ -> session-tz TIMESTAMP (watermarks require it)
    val cast = events.withColumn("ts", col("ts").cast("timestamp"))
    val base =
      if (cast.isStreaming) cast.withWatermark("ts", watermark) else cast
    base
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Streaming linkage: match an unbounded stream of encoded+blocked
    * records against a STATIC blocked reference set — the streaming form
    * of the C1 scoring stage (new uploads matched as they arrive instead
    * of per-run batch jobs). The stream-static equi-join on block key is
    * stateless: every micro-batch compiles to the same hash join +
    * codegen dice a batch run plans, so throughput is the batch join's.
    * The trailing streaming dropDuplicates holds one (dp0,rec0,dp1,rec1)
    * key per emitted edge, so a pair that reappears (shared block, late
    * file) is emitted exactly once across the whole stream — the same
    * keyed-state discipline as [[firstSeenKeys]] (unbounded state; bound
    * with dropDuplicatesWithinWatermark when the stream carries event
    * time). Both inputs: (dp, entity_id, clk, popcount, block_key);
    * output = Linker's Edge schema (sim, dp0, rec0, dp1, rec1). */
  def streamingLinkage(stream: DataFrame, staticBlocked: DataFrame,
      threshold: Double): DataFrame = {
    val st = staticBlocked.select(col("dp").as("dp_s"),
      col("entity_id").as("rec_s"), col("clk").as("clk_s"),
      col("popcount").as("pc_s"), col("block_key"))
    val flip = col("dp_s") < col("dp")
    stream.join(st, Seq("block_key"))
      .where(col("dp") =!= col("dp_s"))
      .withColumn("sim", graft.expr.dicePre(col("clk"), col("clk_s"),
        col("popcount") + col("pc_s")))
      .where(col("sim") >= threshold)
      .select(col("sim"),
        when(flip, col("dp_s")).otherwise(col("dp")).as("dp0"),
        when(flip, col("rec_s")).otherwise(col("entity_id")).as("rec0"),
        when(flip, col("dp")).otherwise(col("dp_s")).as("dp1"),
        when(flip, col("entity_id")).otherwise(col("rec_s")).as("rec1"))
      .dropDuplicates("dp0", "rec0", "dp1", "rec1")
  }

  /** Session-window aggregation for the STREAMING engine: merge-gap
    * session windows per user (the streaming counterpart of the batch
    * [[sessionize]]). In append mode a session emits only once the
    * event-time watermark passes its end (= last event + gap) — the
    * exact finalization rule the driver query's oracle replays: sessions
    * still inside the gap horizon at end-of-stream are withheld, which
    * is correct streaming semantics, not data loss.
    * Output: (user_id, start_us, end_us, n_events). */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "0 seconds"): DataFrame =
    events.select(col("user_id"),
        col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"), col("n_events"))

  /** Per-key k-sigma outlier detection in EXACT integer arithmetic — the
    * event-monitoring readout (anomalous purchase amounts, runaway
    * counters) made engine-reproducible: values are fixed-pointed with
    * floor(value·scale) and the z-score test is cleared of both the
    * division and the square root:
    *
    *   |v - s/n| > k·sqrt((n·ss - s²)/n²)  ⇔  (n·v - s)² > k²·(n·ss - s²)
    *
    * so the flag is a pure integer comparison (decimal-widened — ANSI-
    * safe and exact at any magnitude), bit-identical at any partitioning
    * and replayable in SQL (HUGEINT on the DuckDB side).
    *
    * Shape: one map-side-combining hash agg for the per-key moments, one
    * join back on the key — no window, no second pass over values.
    * Output: the outlier rows (key, id, v = fixed-point value). */
  def sigmaOutliers(events: DataFrame, key: String, idCol: String,
      valueCol: String, k: Int = 3, scale: Int = 100): DataFrame = {
    val base = events.select(col(key).as("key"), col(idCol).as("id"),
      floor(col(valueCol) * scale).cast("long").as("v"))
    val stats = base.groupBy("key").agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("v").cast("decimal(28,0)")).cast("decimal(38,0)").as("s"),
      sum((col("v") * col("v")).cast("decimal(28,0)"))
        .cast("decimal(38,0)").as("ss"))
    val vv = col("v").cast("decimal(38,0)")
    val lhs = (col("n") * vv - col("s")) * (col("n") * vv - col("s"))
    val rhs = lit(k.toLong * k).cast("decimal(38,0)") *
      (col("n") * col("ss") - col("s") * col("s"))
    base.join(stats, "key")
      .where(lhs > rhs)
      .select("key", "id", "v")
  }

  /** Watermarked STREAM-STREAM interval join (view→click attribution):
    * each left event pairs with every right event of the same key whose
    * timestamp falls in `[left_ts, left_ts + windowSeconds]`. Both sides
    * carry an event-time watermark plus the time-range join condition —
    * exactly what Structured Streaming needs to bound join state: a
    * buffered left row is dropped once the right watermark passes
    * `left_ts + window`, so state is O(events per watermark horizon), not
    * O(stream). With a watermark wider than the replayed data's span the
    * join is exact (nothing is ever late), which is how the driver query
    * proves stream == batch.
    *
    * Inputs may be streaming or batch (same plan works for backfill).
    * Output: (key, left_id, right_id, lag_us). */
  def intervalJoinStream(left: DataFrame, right: DataFrame, key: String,
      tsCol: String, idCol: String, windowSeconds: Long,
      watermark: String = "1 hour"): DataFrame = {
    // parquet event time is TIMESTAMP_NTZ; watermarks need TIMESTAMP
    val l = left.select(col(key).as("key"),
        col(tsCol).cast("timestamp").as("l_ts"), col(idCol).as("left_id"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col(key).as("r_key"),
        col(tsCol).cast("timestamp").as("r_ts"), col(idCol).as("right_id"))
      .withWatermark("r_ts", watermark)
    l.join(r, col("key") === col("r_key") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $windowSeconds SECOND"))
      .select(col("key"), col("left_id"), col("right_id"),
        (unix_micros(col("r_ts")) - unix_micros(col("l_ts"))).as("lag_us"))
  }

  /** Stateful streaming first-seen dedup: emits each key exactly once
    * across the whole stream (the streaming analogue of
    * Dedup.exactGroups' keeper selection) via flatMapGroupsWithState —
    * per-key boolean state, append mode, no timeout (state size = one
    * boolean per distinct key; for unbounded corpora bound it with a
    * TTL timeout). Works identically over a batch Dataset (state engine
    * runs per-group), which is how the spec pins semantics. */
  def firstSeenKeys(df: DataFrame, keyCol: String): org.apache.spark.sql.Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    df.select(col(keyCol).cast("string")).as[String]
      .groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, _: Iterator[String], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); Iterator.single(key) }
      }
  }

  /** Engine-native bounded-state streaming key dedup — the third member
    * of the dedup family: [[firstSeenKeys]] (custom state, unbounded),
    * [[firstSeenKeysTtl]] (custom state, sliding event-time TTL), and
    * this, Spark's built-in `dropDuplicatesWithinWatermark`: state holds
    * first-seen event time + the watermark delay and is evicted once the
    * watermark passes it (FIXED deadline — duplicates do NOT refresh it,
    * unlike the TTL variant's sliding rule), so a key reappearing after
    * eviction re-emits. Only the KEY is emitted: within a micro-batch
    * the operator keeps the first ROW in partition order, so any payload
    * column would be nondeterministic — projecting it away is what makes
    * the output exact.
    *
    * Same plan batch or streaming is NOT available here (the operator is
    * streaming-only), so the spec gates semantics through staged file
    * batches and the driver oracle runs the no-eviction regime (delay
    * beyond the data span ⇒ output == DISTINCT keys) — the eviction
    * regime is StreamingSpec's re-emission case. */
  def dedupKeysWithinWatermark(df: DataFrame, keyCol: String,
      tsCol: String, delay: String): DataFrame =
    df.select(col(keyCol).as("k"),
        col(tsCol).cast("timestamp").as("__ts"))
      .withWatermark("__ts", delay)
      .dropDuplicatesWithinWatermark("k")
      .select(col("k"))

  /** TTL-bounded variant of [[firstSeenKeys]] — the scale-safe default
    * for unbounded streams: per-key state expires once the WATERMARK
    * passes `last sighting + ttlMs` (sliding TTL — every sighting pushes
    * the deadline, so hot keys stay deduped while cold keys release their
    * state), and a key re-emits if it reappears after expiry. State size
    * is bounded by the distinct keys per TTL window instead of the whole
    * stream history.
    *
    * Event-time (watermark) expiry is deliberate: processing-time
    * timeouts make FlatMapGroupsWithStateExec report "may need another
    * batch" unconditionally, so an AvailableNow/Once drain spins empty
    * micro-batches forever (measured here — hundreds of batches/min);
    * event-time timers fire only when the watermark moves, terminate
    * cleanly, and are reprocessing-deterministic (a replay of the same
    * data expires the same keys). Over a batch Dataset timeouts never
    * fire, so semantics degrade to exactly [[firstSeenKeys]]
    * (spec-pinned). */
  def firstSeenKeysTtl(df: DataFrame, keyCol: String, tsCol: String,
      ttlMs: Long, watermarkDelay: String = "0 seconds"): org.apache.spark.sql.Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val cast = df.select(col(keyCol).cast("string").as("k"),
      col(tsCol).cast("timestamp").as("ts"))
    val base = if (cast.isStreaming) cast.withWatermark("ts", watermarkDelay) else cast
    base.as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[(String, java.sql.Timestamp)],
            state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val deadline = it.map(_._2.getTime).max + ttlMs
            // batch mode has no watermark (timeouts never fire there)
            val wm = try state.getCurrentWatermarkMs() catch { case _: Exception => 0L }
            val alive = deadline > wm
            if (state.exists) {
              if (alive) state.setTimeoutTimestamp(deadline)
              Iterator.empty
            } else {
              // deadline already behind the watermark -> emit but store no
              // state (it would be unexpirable: timers must be > watermark)
              if (alive) { state.update(true); state.setTimeoutTimestamp(deadline) }
              Iterator.single(key)
            }
          }
      }
  }

  /** Drive a parquet-backed stream of the events table through the
    * windowed aggregation into an in-memory table; returns the query
    * (caller calls processAllAvailable + stop). maxFilesPerTrigger forces
    * genuine incremental batches. */
  /** A genuine file-stream source over an existing parquet table
    * (maxFilesPerTrigger forces incremental micro-batches). The source
    * wants a directory; a single-file path streams the parent with a glob
    * filter. */
  def parquetStream(spark: SparkSession, path: String): DataFrame = {
    // short-lived sessions: keep the state-store maintenance thread from
    // firing after the context stops (it would log RpcEndpointNotFound
    // noise against the dead coordinator, one line per store partition)
    spark.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "1h")
    val schema = spark.read.parquet(path).schema
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val reader = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
    if (fs.getFileStatus(p).isFile)
      reader.option("pathGlobFilter", p.getName).parquet(p.getParent.toString)
    else reader.parquet(path)
  }

  def streamFromParquet(spark: SparkSession, path: String,
      queryName: String): StreamingQuery =
    windowedRates(parquetStream(spark, path))
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
}
