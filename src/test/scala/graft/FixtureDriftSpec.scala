package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift posture tests (the round-14 breakage class: the driver
  * regenerates `/root/testdata` between rounds and column types can
  * change). Three contracts:
  *
  *  1. loaders are SESSION-STATE-CLEAN on fixtures that don't need the
  *     `nanosAsLong` legacy conf (the probe sets it only when the footer
  *     demands it);
  *  2. the date-ish fact columns (`o_orderdate`) adapt across the
  *     plausible generations (NANOS footer, DATE, NTZ) with identical
  *     wall-clock values;
  *  3. a generation outside the supported envelope fails LOUDLY at load,
  *     naming table/column/type — not one analysis error per query.
  */
class FixtureDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** Wall-clock formatter that reads identically on DATE (midnight),
    * TIMESTAMP_NTZ (naive wall clock) and TIMESTAMP (session-tz = UTC
    * under the test pin) — the cross-generation value witness. */
  private def wallClock(c: String) =
    date_format(col(c), "yyyy-MM-dd HH:mm:ss.SSSSSS")

  test("loaders leave nanosAsLong untouched on a non-NANOS generation") {
    assume(new java.io.File(sf).isDirectory, s"$sf fixture not present")
    // own session: other suites set the conf in their setup, and
    // newSession gives this test an isolated SQLConf on the shared context
    val s = spark.newSession()
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val before = s.conf.getOption(NanosConf)
    assert(!before.contains("true"), s"probe precondition: conf=$before")
    Tables.events(s, sf).limit(3).collect()
    Tables.orders(s, sf).limit(3).collect()
    Tables.lineitem(s, sf).limit(3).collect()
    assert(s.conf.getOption(NanosConf) == before,
      "loading a non-NANOS generation mutated the legacy conf")
  }

  test("footer probe sets nanosAsLong iff the footer demands it") {
    val dir = TestSpark.tempDir("probe_nanos_").toString
    NanosEventsWriter.write(s"$dir/events.parquet", Seq(
      NanosEventsWriter.Row(1L, 981173106123456789L, 7L, "click", 1.5, "{}"),
      NanosEventsWriter.Row(2L, 981173107000000000L, 8L, "view", 2.5, "{}")))
    val s = spark.newSession()
    s.conf.set("spark.sql.session.timeZone", "UTC")
    assert(!s.conf.getOption(NanosConf).contains("true"))
    val ev = Tables.events(s, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    val micros = ev.orderBy("event_id").select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSeq
    assert(micros == Seq(981173106123456L, 981173107000000L),
      s"nanos rebuild produced $micros")
    // the conf was flipped BY the probe, and only because the footer
    // needed it — and it must stay set: scan execution re-consults it
    assert(s.conf.getOption(NanosConf).contains("true"))
    // a non-NANOS table in the same session is unaffected by the flip
    assert(Tables.orders(s, sf).limit(1).count() == 1L)
  }

  test("o_orderdate adapts across DATE and NANOS generations with identical wall clocks") {
    assume(new java.io.File(sf).isDirectory, s"$sf fixture not present")
    val native = Tables.orders(spark, sf)
    assert(Set[Any](TimestampNTZType, TimestampType, DateType)
      .contains(native.schema("o_orderdate").dataType))
    val nativeRows = native.orderBy("o_orderkey").limit(50)
      .select(col("o_orderkey"), wallClock("o_orderdate"))
      .as[(Long, String)](org.apache.spark.sql.Encoders.product[(Long, String)])
      .collect().toSeq

    // DATE generation: same rows, o_orderdate narrowed to DATE
    val dateDir = TestSpark.tempDir("orders_date_").toString
    native.withColumn("o_orderdate", col("o_orderdate").cast("date"))
      .write.parquet(s"$dateDir/orders.parquet")
    val fromDate = Tables.orders(spark, dateDir)
    assert(fromDate.schema("o_orderdate").dataType == DateType)
    val dateRows = fromDate.orderBy("o_orderkey").limit(50)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .as[(Long, String)](org.apache.spark.sql.Encoders.product[(Long, String)])
      .collect().toSeq
    assert(dateRows == nativeRows.map { case (k, s) => (k, s.take(10)) },
      "DATE-generation calendar days diverge from native")

    // NANOS generation: REAL TIMESTAMP(NANOS) footer via parquet-mr
    val nanosDir = TestSpark.tempDir("orders_nanos_").toString
    val src = native.orderBy("o_orderkey").limit(50)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        expr("unix_micros(make_timestamp(year(o_orderdate), " +
          "month(o_orderdate), day(o_orderdate), hour(o_orderdate), " +
          "minute(o_orderdate), date_part('SECOND', o_orderdate), " +
          "'UTC')) * 1000").as("ns"),
        col("o_orderpriority"))
      .collect().map { r =>
        NanosEventsWriter.OrderRow(r.getLong(0), r.getLong(1),
          r.getString(2), r.getDouble(3), r.getLong(4), r.getString(5))
      }
    NanosEventsWriter.writeOrders(s"$nanosDir/orders.parquet",
      src.toIndexedSeq)
    val fromNanos = Tables.orders(spark, nanosDir)
    assert(fromNanos.schema("o_orderdate").dataType == TimestampType,
      s"NANOS generation must rebuild TimestampType, got " +
        s"${fromNanos.schema("o_orderdate").dataType}")
    val nanosRows = fromNanos.orderBy("o_orderkey")
      .select(col("o_orderkey"), wallClock("o_orderdate"))
      .as[(Long, String)](org.apache.spark.sql.Encoders.product[(Long, String)])
      .collect().toSeq
    assert(nanosRows == nativeRows,
      "NANOS-generation wall clocks diverge from native")
  }

  test("NANOS rebuild floors sub-microsecond remainders, including pre-1970 instants") {
    // truncation-to-micros means FLOOR: -1500ns is 1969-12-31
    // 23:59:59.9999985, whose micros value is -2 (23:59:59.999998) —
    // `div` alone truncates toward zero and would give -1. Positive
    // instants floor and truncate identically.
    val dir = TestSpark.tempDir("nanos_floor_").toString
    NanosEventsWriter.write(s"$dir/events.parquet", Seq(
      NanosEventsWriter.Row(1L, -1500L, 1L, "a", 0.0, "{}"),
      NanosEventsWriter.Row(2L, -1000L, 1L, "a", 0.0, "{}"),
      NanosEventsWriter.Row(3L, -999L, 1L, "a", 0.0, "{}"),
      NanosEventsWriter.Row(4L, 0L, 1L, "a", 0.0, "{}"),
      NanosEventsWriter.Row(5L, 999L, 1L, "a", 0.0, "{}"),
      NanosEventsWriter.Row(6L, 1500L, 1L, "a", 0.0, "{}")))
    val got = Tables.events(spark, dir).orderBy("event_id")
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(-2L, -1L, -1L, 0L, 0L, 1L),
      s"floored micros expected Seq(-2,-1,-1,0,0,1), got $got")
  }

  test("a generation outside the supported envelope fails loudly at load") {
    import spark.implicits._
    // events.ts as STRING — no adaptation possible, must name the column
    val evDir = TestSpark.tempDir("events_string_").toString
    Seq((1L, "2001-02-03 04:05:06", 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$evDir/events.parquet")
    val e1 = intercept[IllegalStateException](Tables.events(spark, evDir))
    assert(e1.getMessage.contains("events.ts") &&
      e1.getMessage.contains("fixture drift"), e1.getMessage)

    // documents.text as a number — the structural guard fires
    val docDir = TestSpark.tempDir("docs_drift_").toString
    Seq((1L, 42L, "en", "web", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$docDir/documents.parquet")
    val e2 = intercept[IllegalStateException](Tables.documents(spark, docDir))
    assert(e2.getMessage.contains("documents.text"), e2.getMessage)
  }

  test("embeddings accepts float and double element generations") {
    import spark.implicits._
    val dir = TestSpark.tempDir("emb_double_").toString
    Seq((1L, Array(0.1, 0.2), 0), (2L, Array(0.3, 0.4), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    // double-element generation loads; the similarity layer casts to
    // array<double> at every consumption site, so values flow through
    val d = Tables.embeddings(spark, dir)
    assert(d.count() == 2L)
    assert(graft.ext.Similarity
      .cosineTopK(d.filter(col("vec_id") === 1L), d, "vec_id", "embedding",
        k = 1).count() >= 1L)
  }

  test("q93 degrades to uniform weights when sources are not named srcN") {
    // The mixing weight is parsed from the srcN naming convention; a
    // regenerated corpus with different source names must fall back to
    // weight 1 for every source (uniform mix) — not throw on
    // cast('' as long), which Spark 4's ANSI mode would.
    import spark.implicits._
    assume(new java.io.File(sf).isDirectory, s"$sf fixture not present")
    val staged = TestSpark.tempDir("docs_srcdrift_")
    Tables.documents(spark, sf)
      .withColumn("source", regexp_replace(col("source"), "^src", "web"))
      .write.mode("overwrite").parquet(s"$staged/documents.parquet")
    val out = QueryRegistry.byName("q93_source_mixing")
      .fn(spark, staged.toString)
      .select("source", "weight", "within_tol")
      .as[(String, Long, Boolean)].collect()
    // drift test: don't hard-code the fixture's exact source count
    // (20 today), but do pin output cardinality to the staged corpus
    // itself — a regression that silently drops source groups must not
    // hide behind nonEmpty
    val nSources = spark.read.parquet(s"$staged/documents.parquet")
      .select("source").distinct().count()
    assert(out.nonEmpty, "expected at least one source row")
    assert(out.length.toLong == nSources,
      s"expected one row per staged source ($nSources), got ${out.length}")
    assert(out.forall(_._2 == 1L),
      s"drifted naming must yield uniform weight 1: ${out.filter(_._2 != 1L).take(3).toSeq}")
    assert(out.forall(_._3), "realized counts left the tolerance band")
  }
}
