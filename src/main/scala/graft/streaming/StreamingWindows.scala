package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructType}

/** Structured Streaming wrappers for the batch window queries
  * (SURVEY.md §2.8): the same `window($"ts", ...)` expressions run under
  * `readStream` with a watermark, so batch results (what the DuckDB
  * oracle checks) and streaming results agree on closed windows.
  */
object StreamingWindows {

  /** The batch transform shared by both modes: tumbling 1h count+sum per
    * event_type. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("sum_value_cents"))
      .select(unix_timestamp(col("w.start")).as("w_start"),
        col("event_type"), col("n"), col("sum_value_cents"))

  /** Streaming variant: parquet-dir source → watermark → same agg →
    * memory sink. `processAllAvailable` lets a static fixture drive the
    * query synchronously in tests. Output mode is Append — windows are
    * emitted once, when the watermark passes their end, and their state is
    * then EVICTED, so the state store holds only windows newer than
    * (max ts − 2h). (Complete mode would retain every window forever —
    * unbounded state at scale.) */
  def runTumblingStream(spark: SparkSession, dir: String,
                        schema: StructType,
                        queryName: String): StreamingQuery = {
    val events = eventsStream(spark, dir, schema)
    val agg = tumblingAgg(events.withWatermark("ts", "2 hours"))
    agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
  }

  /** Custom per-key state: running per-user event count + last-seen epoch
    * via mapGroupsWithState — the KeyValueGroupedDataset stateful path
    * (SURVEY.md §2.8's "custom state" extension). */
  final case class UserStat(user_id: Long, n_events: Long, last_epoch: Long)

  /** Streaming events source. The fixture stores `ts` as parquet
    * TIMESTAMP(NANOS) (see [[graft.Tables.events]]): pass a schema with
    * `ts: long` and the nanos are rebuilt into a micros timestamp here —
    * same integer-division conversion as the batch loader. */
  private def eventsStream(spark: SparkSession, dir: String,
                           schema: StructType) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    if (schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  def userStatsStream(spark: SparkSession, dir: String, schema: StructType,
                      queryName: String): StreamingQuery = {
    import spark.implicits._
    val events = eventsStream(spark, dir, schema)
      .select(col("user_id").cast("long"),
        unix_timestamp(col("ts")).as("epoch"))
      .as[(Long, Long)]
    val stats = events.groupByKey(_._1)
      .mapGroupsWithState[UserStat, UserStat](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(uid, 0L, 0L))
          val batch = rows.toSeq
          val next = UserStat(uid, prev.n_events + batch.size,
            math.max(prev.last_epoch, batch.map(_._2).max))
          state.update(next)
          next
      }
    stats.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(queryName)
      .start()
  }
}
