package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the semantics q106 (streaming-in-the-oracle-gate) depends on:
  * the bounded AvailableNow tumbling run emits EXACTLY the windows
  * whose end the final watermark passed — boundary INCLUSIVE (a window
  * whose end equals the watermark is emitted), watermark = max event
  * time (ms, floored) − 2h. The q106 oracle encodes the same
  * inequality; this spec is the crafted-tie fixture that proved it. */
class StreamParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("availableNow tumbling run: boundary tie emits (end == watermark)" +
    ", open tail held back") {
    val dir = TestSpark.tempDir("graft_parity_")
    try {
      // window [00:00, 01:00); max ts exactly 03:00:00
      // -> final watermark 01:00:00.000 == the window's end
      Seq(
        (1706745600L + 1800L, 1L, 1L, "a", 1.0),  // 00:30 -> tie window
        (1706745600L + 9000L, 2L, 1L, "a", 1.0),  // 02:30 -> open tail
        (1706745600L + 10800L, 3L, 1L, "a", 1.0)) // 03:00 (max, open)
        .toDF("epoch", "event_id", "user_id", "event_type", "value")
        .select(timestamp_seconds(col("epoch")).as("ts"), col("event_id"),
          col("user_id"), col("event_type"), col("value"))
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/events.parquet")
      val q = graft.streaming.StreamingWindows
        .runTumblingAvailableNow(spark, dir.toString, "parity_tie_sink")
      q.awaitTermination()
      val emitted = spark.table("parity_tie_sink")
        .select("w_start").as[Long].collect().toSeq
      // ONLY the tie window: emitted-iff (w_start+3600)*1000 <= wm_ms,
      // with equality INCLUDED — the exact inequality q106's oracle uses
      assert(emitted == Seq(1706745600L),
        s"expected only the tie window, got $emitted")
    } finally {
      spark.catalog.dropTempView("parity_tie_sink")
      Staging.deleteRecursively(dir)
    }
  }
}
