package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState, StreamingQuery}
import graft.functions.Ht

/** Structured Streaming versions of the event-time aggregations in
  * `graft.queries.StreamQueries` (SURVEY.md §2.9 — north-star extension;
  * the reference has no streaming).
  *
  * Batch and stream share the same `groupBy(window(...))` declarative core,
  * so correctness is locked by the batch DuckDB oracle while these entry
  * points add watermarking + incremental state. At scale: state store is
  * keyed by (window, group) — watermarks bound state size; late data beyond
  * the watermark is dropped deterministically.
  */
object EventStreams {

  /** The shared tumbling-window aggregation plan (works on batch or
    * streaming input — identical semantics by construction).
    */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Ht.dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("bucket_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming read of an events directory with a 1-hour watermark.
    * `ts` is normalized to TimestampType the same way as the batch loader
    * (`graft.model.Tables.normalizeEventTs` — fixtures have shipped it as
    * epoch-nanos INT64 and as TIMESTAMP(MICROS)).
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    rawEventStream(spark, dir).withWatermark("ts", "1 hour")

  /** The shared reader WITHOUT a watermark — for consumers that project /
    * rename before placing their own watermark (a stream may only define
    * one).
    */
  private def rawEventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // the driver fixture ships events.parquet as a single FILE (stream the
    // parent dir filtered to that name); the production layout is a
    // DIRECTORY of arriving part files (stream the directory itself —
    // with maxFilesPerTrigger=1 each arrival is its own micro-batch, which
    // is what advances the watermark between files)
    val evPath = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val fs = evPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (streamDir, glob) =
      if (fs.getFileStatus(evPath).isDirectory) (evPath.toString, "*.parquet")
      else (dir, "events.parquet") // FileStreamSource requires a directory
    graft.model.Tables.normalizeEventTs(
      spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", glob)
        .parquet(streamDir))
  }

  /** Launch the tumbling aggregation as an incremental streaming query
    * into an in-memory sink (smoke/testing; a production sink would be
    * `.format("parquet")`/Kafka with checkpointing).
    */
  def startTumbling(spark: SparkSession, dir: String, queryName: String): StreamingQuery =
    tumblingAgg(readEventStream(spark, dir))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()

  /** Session clone for a bounded drain: same SparkContext, own SQLConf,
    * with shuffle parallelism sized to the drain's STATE cardinality
    * instead of the cluster default. A stateful streaming stage allocates
    * one state-store instance per shuffle partition, and every instance
    * costs a task plus per-micro-batch checkpoint files — for a window
    * aggregation whose state is (windows × groups) rows, a cluster-wide
    * default (32 here, 200+ on a real cluster) is pure fixed overhead per
    * batch. The clone leaves the caller's session untouched (state
    * partition count is frozen into a checkpoint at first run, so it must
    * be chosen per-drain, not mutated globally). A continuous production
    * job keys millions of users, not dozens of windows — pass a width
    * sized to that key space instead of the default.
    */
  private def drainSession(spark: SparkSession, statePartitions: Int): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong",
      spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false"))
    s.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    s
  }

  /** Read a durable sink back with the AGGREGATION's schema pinned, so a
    * drain that closed ZERO windows (all data still inside the watermark
    * allowance) reads back as an empty frame instead of throwing "unable
    * to infer schema" — the same empty-result contract as
    * `CorpusIngest.survivors`. The explicit schema also skips footer
    * inference on the happy path.
    */
  private def readSinkOrEmpty(spark: SparkSession, outPath: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(outPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(outPath)
    else spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
  }

  /** One-shot genuinely-streaming run of the tumbling aggregation: the
    * events fixture flows through the INCREMENTAL engine (FileStreamSource
    * → stateful window aggregation → memory sink) under
    * `Trigger.AvailableNow`, which drains all available input and stops.
    * Complete output mode so every window emits on the bounded replay —
    * the result is then byte-comparable to the batch tumbling oracle.
    * Returns the sink table (re-runnable: the sink view is dropped first).
    */
  def runTumblingAvailableNow(spark0: SparkSession, dir: String,
      queryName: String = "graft_stream_live",
      statePartitions: Int = 4): DataFrame = {
    val spark = drainSession(spark0, statePartitions)
    spark.catalog.dropTempView(queryName)
    val q = tumblingAgg(readEventStream(spark, dir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** The PRODUCTION output shape: append mode + watermark through
    * `Trigger.AvailableNow` — a window emits exactly once, when the
    * watermark passes its end; late rows inside the allowance still
    * count, late rows beyond it drop deterministically; windows the
    * final watermark never closed stay in state and do NOT emit. The
    * complete-mode drain above stays the bounded oracle twin for the
    * driver gate (StreamingSpec pins this path against a late-data
    * fixture instead).
    */
  def runTumblingAppendAvailableNow(spark0: SparkSession, dir: String,
      queryName: String = "graft_stream_append",
      statePartitions: Int = 4): DataFrame = {
    val spark = drainSession(spark0, statePartitions)
    spark.catalog.dropTempView(queryName)
    val q = tumblingAgg(readEventStream(spark, dir))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** The DURABLE production sink: the same append+watermark drain as
    * `runTumblingAppendAvailableNow`, but writing finalized windows to a
    * parquet directory with a CHECKPOINT — no driver-side funnel (the
    * memory sink collects every emitted row onto the driver; this path
    * keeps the write distributed), and exactly-once across restarts: the
    * checkpoint records which source files each committed batch consumed
    * and the sink's file manifest, so re-running after new files arrive
    * drains ONLY the new data and appends ONLY newly closed windows.
    * Returns the sink contents read back (the manifest-aware read — stray
    * uncommitted files from a crashed batch are invisible to it).
    */
  def runTumblingAppendDurable(spark0: SparkSession, dir: String,
      outPath: String, checkpointPath: String,
      statePartitions: Int = 4): DataFrame = {
    val spark = drainSession(spark0, statePartitions)
    val agg = tumblingAgg(readEventStream(spark, dir))
    val q = agg
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointPath)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    readSinkOrEmpty(spark, outPath, agg.schema)
  }

  /** Streaming exact dedup — the training-data-pipeline shape: keep the
    * first occurrence per key on an unbounded stream.
    * `dropDuplicatesWithinWatermark` keys the state store by the dedup
    * columns and EVICTS entries once the watermark passes them, so state
    * stays bounded on an infinite stream (a plain dropDuplicates would
    * grow state forever — the classic streaming-dedup OOM).
    */
  def dedupStream(events: DataFrame, keys: Seq[String]): DataFrame =
    events.dropDuplicatesWithinWatermark(keys)

  /** Launch the streaming dedup into an in-memory sink (smoke/testing). */
  def startDedup(spark: SparkSession, dir: String, queryName: String,
      keys: Seq[String]): StreamingQuery =
    dedupStream(readEventStream(spark, dir), keys)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()

  /** Per-user running profile maintained with CUSTOM state
    * (`mapGroupsWithState`) — the escape hatch for stateful logic the
    * built-in window/dedup operators can't express (per-key counters,
    * decaying scores, custom session rules). State is one small case class
    * per user in the state store; each trigger folds its new events in and
    * emits the updated profile. TimeoutConf would evict idle users in a
    * production job; the smoke path keeps NoTimeout so the final emit is
    * comparable to the batch aggregate.
    */
  case class UserProfile(userId: Long, nEvents: Long, totalValue: Double)

  def userProfiles(events: DataFrame): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events.select(col("user_id").as[Long], col("value").as[Double])
      .groupByKey(_._1)
      .mapGroupsWithState[UserProfile, UserProfile](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Double)], state: GroupState[UserProfile]) =>
          val prev = state.getOption.getOrElse(UserProfile(userId, 0L, 0d))
          var n = prev.nEvents
          var total = prev.totalValue
          rows.foreach { case (_, v) => n += 1; total += v }
          val next = UserProfile(userId, n, total)
          state.update(next)
          next
      }
  }

  /** Launch the custom-state profile fold into an in-memory sink. */
  def startUserProfiles(spark: SparkSession, dir: String, queryName: String): StreamingQuery =
    userProfiles(readEventStream(spark, dir))
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .start()

  /** Stream-stream interval join — the streaming twin of
    * `operators.RangeJoin`: error events join same-user clicks within
    * ±5 minutes. Both sides carry watermarks and the join condition
    * bounds the time range, so each side's state store retains only
    * rows inside watermark+range — bounded state on unbounded streams
    * (an unbounded-condition stream-stream join would buffer forever).
    */
  def rangeJoinStream(spark: SparkSession, dir: String): DataFrame = {
    // both sides go through the shared reader so the file-vs-directory
    // fixture detection (and the nanos-conf guard) lives in ONE place;
    // each side defines its OWN watermark on its renamed event-time column
    def side(tpe: String, p: String): DataFrame =
      rawEventStream(spark, dir)
        .filter(col("event_type") === tpe)
        .select(col("user_id").as(s"${p}_user"), col("ts").as(s"${p}_ts"),
          col("event_id").as(s"${p}_id"))
        .withWatermark(s"${p}_ts", "1 hour")
    side("error", "l").join(side("click", "r"), expr(
      "l_user = r_user AND r_ts BETWEEN l_ts - INTERVAL 5 MINUTES AND l_ts + INTERVAL 5 MINUTES"))
  }

  /** Launch the interval join into an in-memory sink (smoke/testing). */
  def startRangeJoin(spark: SparkSession, dir: String, queryName: String): StreamingQuery =
    rangeJoinStream(spark, dir)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()

  /** Sessionization on a stream: same `session_window` core as the batch
    * query; state per (user, open session), bounded by the watermark.
    */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Ht.dsum(col("value")).as("sum_value"))
      .select(col("user_id"), col("w.start").as("sess_start"),
        col("n_events"), col("sum_value"))

  /** The PRODUCTION sessionization shape: session windows through the
    * incremental engine in APPEND mode — a (user, session) emits exactly
    * once, when the watermark passes the session's end (last event + gap).
    * Unlike tumbling windows the window boundaries themselves are
    * data-dependent: an event arriving in a later micro-batch MERGES with
    * the open session in the state store (possibly fusing two sessions
    * into one) before the watermark finalizes it — the part of
    * sessionization no batch rewrite reproduces incrementally, and the
    * reason session state is the canonical stateful-streaming workload.
    * Late rows beyond the watermark drop deterministically and can never
    * reopen an emitted session (StreamingSpec pins merge + late-drop on a
    * multi-batch fixture; the driver gate replays the single-file fixture
    * where the relational oracle reproduces the emitted set exactly).
    */
  def runSessionAppendAvailableNow(spark0: SparkSession, dir: String,
      queryName: String = "graft_stream_session_append",
      statePartitions: Int = 4): DataFrame = {
    val spark = drainSession(spark0, statePartitions)
    spark.catalog.dropTempView(queryName)
    val q = sessionAgg(readEventStream(spark, dir))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Durable sessionization: the append-mode session drain writing to a
    * parquet sink with a checkpoint. On top of the tumbling durable sink's
    * guarantees (distributed write, exactly-once across restarts), the
    * checkpoint here persists OPEN sessions: an event arriving after a
    * restart must merge into the restored open session — the state-store
    * round-trip of the session-window format, which a tumbling window
    * never exercises (its boundaries don't depend on state). StreamingSpec
    * pins exactly that: a post-restart event extends a checkpointed open
    * session and the merged session emits once, with both halves.
    */
  def runSessionAppendDurable(spark0: SparkSession, dir: String,
      outPath: String, checkpointPath: String,
      statePartitions: Int = 4): DataFrame = {
    val spark = drainSession(spark0, statePartitions)
    val agg = sessionAgg(readEventStream(spark, dir))
    val q = agg
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointPath)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    readSinkOrEmpty(spark, outPath, agg.schema)
  }
}
