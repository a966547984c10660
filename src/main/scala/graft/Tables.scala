package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture table loaders.
  *
  * Mirrors the reference's ingest surface (SURVEY.md §2.1 S1–S4): the
  * reference reads CSV with `inferSchema=True, header=True`
  * (`PySpark Scripts/datacleaning.py:26`, `PySpark Scripts/als.py:21-22`);
  * the engine's primary path is parquet (columnar, footer schema, row-group
  * pruning) because at 100 TB CSV ingest is a one-time conversion, not a
  * query-time format. A CSV variant with both inferred and explicit schema
  * is kept for parity (see [[Sources]]).
  *
  * All loaders are plain `spark.read.parquet` so Catalyst keeps full
  * pushdown freedom: column pruning and predicate pushdown reach the scan
  * (verify with `.explain("formatted")` → `PushedFilters`, `ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** Schema-adaptive events loader. Older fixture generations store `ts`
    * as parquet TIMESTAMP(NANOS), which Spark 4 refuses to read as a
    * timestamp (PARQUET_TYPE_ILLEGAL); newer generations store naive
    * TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Branching on the observed
    * footer type keeps one loader working across both generations — the
    * shared rebuild lives in [[normalizeEventsTs]], which
    * `StreamingWindows.eventsStream` reuses verbatim. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(table(s, d, "events"))
  }

  /** The raw footer schema of `$dir/events.parquet` as Spark observes it
    * under the `nanosAsLong` legacy conf — what a streaming reader must
    * be handed (file stream sources require an explicit schema), derived
    * from the SAME directory that will be streamed so the two can never
    * disagree across fixture generations. */
  private[graft] def eventsRawSchema(s: SparkSession,
                                     d: String): org.apache.spark.sql.types.StructType = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events").schema
  }

  /** Normalize the observed `ts` shape to a plain TimestampType of the
    * same instants, shared by the batch loader ([[events]]) and the
    * streaming source (`StreamingWindows.eventsStream`):
    *
    *   - `LongType` (TIMESTAMP(NANOS) footer read under `nanosAsLong`):
    *     rebuild a micros timestamp with integer division — `ts div 1000`
    *     stays in long arithmetic, so no double-mantissa precision loss
    *     at ~1e18 nanos.
    *   - `TimestampNTZType` (naive TIMESTAMP(MICROS) footer): the wall
    *     clock IS the UTC instant. Rebuilt via field extraction +
    *     `make_timestamp(..., 'UTC')` — every extraction is tz-free on
    *     NTZ and the zone is explicit, so the result is independent of
    *     `spark.sql.session.timeZone` (a bare `cast("timestamp")` is
    *     value-identical only under the engine's UTC session pin and
    *     would silently shift instants by the host offset in an entry
    *     point that forgot it). `date_part('SECOND', ts)` is
    *     DECIMAL(8,6): the micros fraction survives exactly.
    */
  private[graft] def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", expr(
          "make_timestamp(year(ts), month(ts), day(ts), hour(ts), " +
            "minute(ts), date_part('SECOND', ts), 'UTC')"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** The reference's fact table is `(BGGId, Rating, Username)`
    * (`user_ratings.csv`, reference `PySpark Scripts/als.py:21`). The
    * fixtures have no ratings table, so the ML layer derives an
    * interactions table from the star schema: customer × part with the
    * line quantity as implicit rating. Deterministic, scales with sf.
    */
  def ratings(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val li = lineitem(s, d).select("l_orderkey", "l_partkey", "l_quantity")
    val o  = orders(s, d).select("o_orderkey", "o_custkey")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_custkey").as("user_id"), col("l_partkey").as("item_id"))
      .agg(round(avg(col("l_quantity")) / 5.0, 1).as("rating"))
  }
}
