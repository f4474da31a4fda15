package graft.streaming

import graft.ops.{dsum, events, Q}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` fixture (SURVEY.md §2.9 — the
  * reference is batch-only; this is the north-star streaming extension).
  *
  * The tumbling-window query is a REAL `readStream` pipeline: file source
  * with explicit schema → watermark → windowed aggregate → memory sink,
  * driven to completion synchronously with processAllAvailable (the local
  * smoke pattern from the public Spark docs). Complete output mode means
  * the final in-memory table equals the batch answer, which is what the
  * DuckDB oracle states.
  *
  * Session windows use the built-in `session_window` (same operator Spark
  * uses under streaming); the oracle restates the gap semantics with
  * lag + cumulative-sum.
  *
  * Scale: windowed aggregation state is per (window, key); watermarks
  * bound the state store. At 100 TB/day the file source becomes Kafka and
  * the memory sink a parquet/Delta sink — the plan in the middle is
  * unchanged.
  */
object Streams {

  /** Parquet-on-disk schema of events (ts is TIMESTAMP(NANOS) → long). */
  private val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling 1-hour windows per event_type via an actual streaming query. */
  val tumbling: Q = (s, d) => {
    s.conf.set("spark.sql.ansi.enabled", "false")
    s.conf.set("spark.sql.streaming.schemaInference", "false")
    // the file stream source wants a directory; glob-filter to the one table
    val stream = s.readStream
      .schema(eventsRawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(d)
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"))
    val sinkName = "graft_stream_tumbling"
    val query = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(sinkName)
      .start()
    try query.processAllAvailable()
    finally query.stop()
    s.table(sinkName)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("value_sum"))
      .orderBy("window_start", "event_type")
  }

  /** Session windows (5-minute gap) per user — built-in session_window. */
  val session: Q = (s, d) =>
    events(s, d)
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("value_sum"))
      .select(
        col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"), col("value_sum"))
      .orderBy("user_id", "session_start")

  val queries: Map[String, Q] = Map(
    "ext14_stream_tumbling" -> tumbling,
    "ext15_stream_session" -> session)

  val oracleSql: Map[String, String] = Map(
    "ext14_stream_tumbling" ->
      """SELECT strftime(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)),
        |         '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS value_sum
        |FROM events
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "ext15_stream_session" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |brk AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |                      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM brk)
        |SELECT user_id,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(MAX(ts) + INTERVAL 5 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS value_sum
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin)
}
