package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{ArrayType, DataType, DateType, DoubleType,
  FloatType, LongType, StringType, TimestampNTZType, TimestampType}

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
  *
  * Fixture-drift posture (the round-14 breakage class: the driver
  * regenerates `/root/testdata` between rounds and column TYPES can
  * change generation to generation): every timestamp-bearing column is
  * normalized by branching on the OBSERVED footer type
  * ([[normalizeEventsTs]], [[normalizeDateish]]); structurally-consumed
  * columns (`embedding`, `text`) are guarded by loud asserts; plain
  * key/measure columns (integral/floating/string) are width-tolerant by
  * construction because every query casts at the output boundary.
  * BASELINE.md "Fixture type assumptions" enumerates the per-table
  * contract.
  */
object Tables {

  /** Parquet read that turns on `spark.sql.legacy.parquet.nanosAsLong`
    * ONLY when this file's footer actually requires it: schema resolution
    * on a TIMESTAMP(NANOS) column fails with `PARQUET_TYPE_ILLEGAL`
    * unless the conf is set, so the failed probe IS the footer test.
    * On every other generation the load leaves session state untouched
    * (the pre-r16 loaders set the conf unconditionally — a session-state
    * mutation on every load for a library caller). When the probe does
    * trip, the conf must STAY set for the session: the parquet→Spark
    * schema conversion is re-consulted at scan execution time, so
    * restoring the conf after load would fail the first action. */
  private def readParquet(spark: SparkSession, path: String): DataFrame =
    try {
      val df = spark.read.parquet(path)
      df.schema // force resolution; NANOS footers fail here without the conf
      df
    } catch {
      case e: Throwable if isIllegalNanos(e) =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(path)
    }

  @annotation.tailrec
  private def isIllegalNanos(e: Throwable): Boolean =
    if (e == null) false
    else {
      val m = Option(e.getMessage).getOrElse("")
      if (m.contains("PARQUET_TYPE_ILLEGAL") ||
        m.contains("Illegal Parquet type")) true
      else isIllegalNanos(e.getCause)
    }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    readParquet(spark, s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame =
    normalizeDateish(table(s, d, "orders"), "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame =
    normalizeDateish(table(s, d, "lineitem"), "l_shipdate")

  /** Schema-adaptive events loader. Older fixture generations store `ts`
    * as parquet TIMESTAMP(NANOS), which Spark 4 refuses to read as a
    * timestamp (PARQUET_TYPE_ILLEGAL); newer generations store naive
    * TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Branching on the observed
    * footer type keeps one loader working across both generations — the
    * shared rebuild lives in [[normalizeEventsTs]], which
    * `StreamingWindows.eventsStream` reuses verbatim. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventsTs(table(s, d, "events"))

  /** The raw footer schema of `$dir/events.parquet` as Spark observes it
    * (under the `nanosAsLong` legacy conf iff the footer needs it — see
    * [[readParquet]]) — what a streaming reader must be handed (file
    * stream sources require an explicit schema), derived from the SAME
    * directory that will be streamed so the two can never disagree
    * across fixture generations. */
  private[graft] def eventsRawSchema(s: SparkSession,
                                     d: String): org.apache.spark.sql.types.StructType =
    table(s, d, "events").schema

  /** Normalize the observed `ts` shape to a plain TimestampType of the
    * same instants, shared by the batch loader ([[events]]) and the
    * streaming source (`StreamingWindows.eventsStream`):
    *
    *   - `LongType` (TIMESTAMP(NANOS) footer read under `nanosAsLong`):
    *     rebuild a micros timestamp with FLOOR division in long
    *     arithmetic ([[floorDivMicros]]) — no double-mantissa precision
    *     loss at ~1e18 nanos, and pre-1970 instants (negative nanos)
    *     floor toward the earlier microsecond as truncation-to-micros
    *     semantics require (`div` alone truncates toward zero, which
    *     would shift −1500ns to −1µs instead of −2µs).
    *   - `TimestampNTZType` (naive TIMESTAMP(MICROS) footer): the wall
    *     clock IS the UTC instant. Rebuilt via field extraction +
    *     `make_timestamp(..., 'UTC')` — every extraction is tz-free on
    *     NTZ and the zone is explicit, so the result is independent of
    *     `spark.sql.session.timeZone` (a bare `cast("timestamp")` is
    *     value-identical only under the engine's UTC session pin and
    *     would silently shift instants by the host offset in an entry
    *     point that forgot it). `date_part('SECOND', ts)` is
    *     DECIMAL(8,6): the micros fraction survives exactly.
    *   - `TimestampType` (a UTC-adjusted future generation): already the
    *     instant — untouched.
    *   - anything else fails LOUDLY naming the column and the observed
    *     type, instead of letting 12 downstream queries error one by one
    *     (the round-14 failure mode).
    */
  private[graft] def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(floorDivMicros("ts")))
      case TimestampNTZType =>
        df.withColumn("ts", expr(
          "make_timestamp(year(ts), month(ts), day(ts), hour(ts), " +
            "minute(ts), date_part('SECOND', ts), 'UTC')"))
      case TimestampType => df
      case other => failDrift("events", "ts", other,
        "TIMESTAMP(NANOS) [as long], TIMESTAMP_NTZ, TIMESTAMP")
    }
  }

  /** Normalize a date-ish fact column (`o_orderdate`, `l_shipdate`)
    * across fixture generations. Unlike `events.ts` (whose consumers —
    * windows, watermarks — require a true TimestampType instant), the
    * date columns are consumed only through tz-free field extraction
    * (`year`/`quarter`/`date_format`) and epoch conversion under the
    * engine's UTC session pin, and the DuckDB oracle reads the SAME
    * parquet — so the observed type passes through untouched whenever
    * both engines can read it, and only the footer shape Spark cannot
    * read natively (TIMESTAMP(NANOS) as long) is rebuilt:
    *
    *   - `LongType` (NANOS footer under `nanosAsLong`, see
    *     [[readParquet]]): rebuilt to a micros TimestampType in long
    *     arithmetic — DuckDB reads the same footer natively as
    *     timestamp_ns, so both sides see identical instants.
    *   - `DateType` / `TimestampNTZType` / `TimestampType`: untouched.
    *   - anything else fails loudly. */
  private[graft] def normalizeDateish(df: DataFrame, c: String): DataFrame = {
    import org.apache.spark.sql.functions._
    df.schema(c).dataType match {
      case LongType =>
        df.withColumn(c, timestamp_micros(floorDivMicros(c)))
      case DateType | TimestampNTZType | TimestampType => df
      case other => failDrift("orders/lineitem", c, other,
        "TIMESTAMP(NANOS) [as long], DATE, TIMESTAMP_NTZ, TIMESTAMP")
    }
  }

  /** epoch-nanos long column → epoch micros by FLOOR division (Spark's
    * `div` truncates toward zero; flooring keeps negative — pre-1970 —
    * instants on the correct microsecond). All in long arithmetic. */
  private def floorDivMicros(c: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.expr
    expr(s"`$c` div 1000 - (case when `$c` % 1000 < 0 then 1 else 0 end)")
  }

  /** Underparallelized-scan remedy (optimization guide §2.5, "input
    * skew: one huge unsplittable file … repartition immediately after
    * the read"): the committed fixtures are single-row-group parquet
    * files, so every scan plans ONE task and the expensive row-local
    * compute above it (shingling, minhash banding, HOF text analysis —
    * profiled at ~2s single-threaded for the sf0.1 corpus) runs on one
    * core. When the scan plans fewer partitions than the session's
    * default parallelism, spread it round-robin; at real corpus scale a
    * parquet scan plans thousands of splits and this is a structural
    * NO-OP (the guard never fires), so nothing here is tuned to
    * local[32]. Round-robin repartition is retry-deterministic
    * (sort-before-repartition is on by default — SPARK-23207).
    *
    * Applied ONLY where the per-row compute above the scan is heavy
    * enough to be worth parallelizing (the 24-hash row-local minhash
    * banding — see [[graft.ext.Dedup.minhashBucketsRowLocal]]): a
    * blanket spread of the documents loader was measured to TAX every
    * light consumer instead (+0.3–0.7s each on ~15 small text queries —
    * 32 cache partitions mean 32 tasks for every downstream stage over
    * tiny data) while only the banding-heavy queries won. The numeric
    * tables (lineitem/orders/events/embeddings) are never spread: their
    * float aggregates (avg/corr/stddev) change partial-merge ORDER
    * under repartition, and the driver's hash gate is bit-exact — a
    * 1-ulp reorder is not worth the risk for scans whose per-row
    * compute is light. */
  private[graft] def spreadSmallScan(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  def documents(s: SparkSession, d: String): DataFrame =
    requireKind(table(s, d, "documents"), "documents", "text",
      "STRING") { case StringType => true; case _ => false }

  def embeddings(s: SparkSession, d: String): DataFrame =
    requireKind(table(s, d, "embeddings"), "embeddings", "embedding",
      "ARRAY<FLOAT|DOUBLE>") {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }

  /** Loud fixture-drift guard for columns that are consumed structurally
    * (not through a widening cast): a regenerated fixture whose type
    * falls outside what the downstream operators understand fails at
    * LOAD, naming the table/column/type, instead of failing analysis
    * query by query. */
  private def requireKind(df: DataFrame, table: String, c: String,
                          expected: String)(ok: DataType => Boolean): DataFrame = {
    val t = df.schema(c).dataType
    if (!ok(t)) failDrift(table, c, t, expected)
    df
  }

  private def failDrift(table: String, c: String, observed: DataType,
                        expected: String): Nothing =
    throw new IllegalStateException(
      s"fixture drift: $table.$c has parquet-observed type $observed; the " +
        s"loaders support $expected. The driver regenerated the fixtures " +
        "with a new type — extend the matching normalize/guard in " +
        "graft.Tables (see BASELINE.md \"Fixture type assumptions\").")

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
