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
    * timestamp (PARQUET_TYPE_ILLEGAL): read the nanos as a plain long
    * (`nanosAsLong` legacy conf — runtime session conf, safe to set here)
    * and rebuild a micros timestamp with integer division — `ts div 1000`
    * stays in long arithmetic, so no double-mantissa precision loss at
    * ~1e18 nanos. Newer generations store `ts` as TIMESTAMP(MICROS)
    * without timezone, which Spark reads natively as TIMESTAMP_NTZ —
    * cast it to the session-timezone TIMESTAMP the rest of the engine
    * (and the r1–r13 oracle history) expects: every entry point pins
    * `spark.sql.session.timeZone=UTC`, so the cast is a deterministic
    * relabel, and downstream numeric casts (e.g. the as-of hot-key
    * splitter's percentile over the time column) stay legal. Branching
    * on the observed footer type keeps one loader working across both
    * generations (same adaptivity as `StreamingWindows.eventsStream`). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
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
