package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming surface over the `events` table (SURVEY.md §2.9 —
  * absent in the reference; declared engine capability): file-source
  * `readStream`, event-time watermark, tumbling window, streaming dedup.
  *
  * The events parquet stores TIMESTAMP(NANOS); the stream reads nanos as
  * raw longs (legacy conf) and exposes a microsecond event-time column,
  * mirroring [[graft.queries.Tables.events]].
  */
object Events {

  val schemaDdl: String = "event_id BIGINT, ts BIGINT, user_id BIGINT, " +
    "event_type STRING, value DOUBLE, props STRING"

  /** Event stream with event-time column `t` and a 10-minute watermark.
    * The file source requires a directory; the single events.parquet file
    * is linked into a scratch dir (in production the dump IS a directory
    * of parts and this indirection disappears).
    */
  def stream(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val scratch = Files.createTempDirectory("graft_events_stream")
    Files.copy(Paths.get(s"$dir/events.parquet"),
      scratch.resolve("events.parquet"))
    s.readStream.schema(schemaDdl).parquet(scratch.toString)
      .withColumn("t", timestamp_micros(expr("ts div 1000")))
      .withWatermark("t", "10 minutes")
  }

  private def runToCompletion(df: DataFrame, sinkName: String,
      mode: String = "complete"): DataFrame = {
    val q = df.writeStream.format("memory").queryName(sinkName)
      .outputMode(mode).start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    df.sparkSession.table(sinkName)
  }

  /** Tumbling-window counts by event type with streaming dedup on
    * event_id — the canonical watermark+window+dropDuplicates smoke. Runs
    * the stream to completion against the (bounded) file source and
    * returns the final result as a batch frame.
    */
  def windowCounts(s: SparkSession, dir: String): DataFrame =
    runToCompletion(
      stream(s, dir)
        .dropDuplicates("event_id")
        .groupBy(window(col("t"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n")),
      "st_window_counts_mem")
      .select(col("window.start").as("wstart"), col("event_type"), col("n"))
      .orderBy("wstart", "event_type")

  /** Custom keyed state via flatMapGroupsWithState (the §2.9 mapping for
    * the ref's incremental-model use cases): a running per-user event
    * count held in explicit GroupState. Each micro-batch folds its events
    * into the state and emits the updated total; on the bounded source
    * (one batch) the final emission per user equals the batch count.
    */
  def statefulUserCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val updated = stream(s, dir)
      .select(col("user_id")).as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, events: Iterator[Long], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + events.size
          state.update(n)
          Iterator.single((uid, n))
      }
      .toDF("user_id", "n")
    runToCompletion(updated, "st_stateful_counts_mem", mode = "update")
      .groupBy("user_id").agg(max("n").as("n")) // last emission per user
      .orderBy("user_id")
  }

  /** Per-user session windows (30-minute inactivity gap): session count
    * and length. Equivalent batch semantics: gap-based sessionization —
    * a new session starts when the previous event is > gap behind.
    */
  def sessionCounts(s: SparkSession, dir: String): DataFrame =
    runToCompletion(
      stream(s, dir)
        .groupBy(session_window(col("t"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n")),
      "st_session_counts_mem")
      .select(col("session_window.start").as("sstart"), col("user_id"),
        col("n"))
      .orderBy("sstart", "user_id")
}
