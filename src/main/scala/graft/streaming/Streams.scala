package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.engine.{DocOut, Pipeline}

/** Structured Streaming surface of the engine.
  *
  * The reference is batch-only (SURVEY.md §2.G), so these are additive
  * capabilities, built the Spark-native way:
  *  - a streaming ingest path for the extraction pipeline (file-source ->
  *    the same narrow mapPartitions kernel as batch — extraction is
  *    stateless per document, so micro-batches scale exactly like batch
  *    partitions on a real cluster),
  *  - watermarked hourly windowed aggregation over an event stream,
  *  - session windows via flatMapGroupsWithState (event-time sessionization
  *    with an inactivity gap), the KeyValueGroupedDataset custom-state path.
  */
object Streams {

  final case class EventRow(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  /** Per-user session accumulator (public: encoder codegen instantiates it). */
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)

  /** Streaming extraction: file-source over page parquet -> the batch
    * kernel, unchanged. Caller attaches writeStream (parquet/iceberg sink
    * with checkpointLocation for exactly-once file sinks).
    */
  def extractStream(spark: SparkSession, pagesDir: String,
      buckets: Int = Pipeline.DefaultBuckets): Dataset[DocOut] = {
    val schema = spark.read.parquet(pagesDir).schema
    val pages = spark.readStream.schema(schema).parquet(pagesDir)
    Pipeline.extract(pages, buckets)
  }

  /** Watermarked tumbling-window counts per event type. Late events beyond
    * 10 minutes are dropped; state is bounded by (watermark horizon x
    * event types), so it holds at any input rate.
    */
  def hourlyEventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 1000).cast("long")).as("sum_vmilli"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_vmilli"))

  /** Streaming exact dedup over a document stream: first-seen wins within
    * the watermark horizon. `dropDuplicatesWithinWatermark` bounds the
    * dedup state by the watermark (an unbounded-horizon streaming dedup is
    * impossible at 10^12 docs; cross-horizon dedup belongs to the batch
    * `Dedup.exact`/`dedupComponents` pass).
    */
  def dedupStream(docs: DataFrame, eventTimeCol: String = "ts",
      delay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("text_h", md5(col("text")))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("text_h")
      .drop("text_h")

  /** Event-time sessionization with an inactivity gap: emits one row per
    * closed session. State per user is O(1); sessions close via event-time
    * timeout as the watermark passes lastTs + gap.
    */
  def sessionize(events: Dataset[EventRow], gapMinutes: Int = 30): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    def update(userId: Long, rows: Iterator[EventRow],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      val out = Vector.newBuilder[SessionOut]
      if (state.hasTimedOut) {
        val s = state.get
        out += SessionOut(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)
        state.remove()
      } else {
        // event-time order within a micro-batch is not guaranteed
        val sorted = rows.toVector.sortBy(_.ts.getTime)
        var st = state.getOption.getOrElse(
          SessionState(Long.MaxValue, Long.MinValue, 0L, 0.0))
        sorted.foreach { e =>
          val t = e.ts.getTime
          if (st.n > 0 && t - st.last > gapMs) {
            out += SessionOut(userId, new Timestamp(st.start), new Timestamp(st.last), st.n, st.total)
            st = SessionState(t, t, 1L, e.value)
          } else {
            st = SessionState(math.min(st.start, t), math.max(st.last, t),
              st.n + 1, st.total + e.value)
          }
        }
        state.update(st)
        state.setTimeoutTimestamp(st.last + gapMs)
      }
      out.result().iterator
    }

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
