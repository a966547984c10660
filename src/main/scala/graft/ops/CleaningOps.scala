package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's pandas cleaning tier (SURVEY.md §2.2 P13–P20,
  * `PySpark Scripts/datacleaning.py` + `bgrfunctions.py:79-140`),
  * re-expressed natively so the whole ETL is one Spark lineage — no
  * process-boundary CSV handoffs (S7), no driver-side pandas.
  */
object CleaningOps {

  /** P13 — null-count audit: one row, one bigint per column
    * (reference `datacleaning.py:16-47` prints `isna().sum()`). Single
    * scan, partial aggregation map-side. */
  def nullAudit(df: DataFrame): DataFrame = {
    val aggs = df.columns.toSeq.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** P18 — sentinel → null rewrite (reference `datacleaning.py:77-78`:
    * `'[]'`→NaN, `0`→NaN). */
  def sentinelToNull(df: DataFrame, c: String, sentinel: Column): DataFrame =
    df.withColumn(c, when(col(c) === sentinel, lit(null)).otherwise(col(c)))

  /** P16 — fill nulls with the column mean (reference
    * `bgrfunctions.py:110-111`). Mean stays in-plan (broadcast 1-row agg),
    * no driver round-trip. */
  def fillWithMean(df: DataFrame, c: String): DataFrame = {
    val m = df.agg(avg(col(c)).as("__mean"))
    df.crossJoin(broadcast(m))
      .withColumn(c, coalesce(col(c), col("__mean")))
      .drop("__mean")
  }

  /** P17 — fill nulls with the mode (reference `bgrfunctions.py:114-124`);
    * deterministic tie-break by value. */
  def fillWithMode(df: DataFrame, c: String): DataFrame = {
    val m = df.filter(col(c).isNotNull)
      .groupBy(col(c)).count()
      .orderBy(col("count").desc, col(c).asc).limit(1)
      .select(col(c).as("__mode"))
    df.crossJoin(broadcast(m))
      .withColumn(c, coalesce(col(c), col("__mode")))
      .drop("__mode")
  }

  /** P19 — zero-variance column audit (reference `bgrfunctions.py:133-138`
    * drops numeric columns with std ≤ 1e-10). Returns the 1-row stddev
    * vector; `prune` applies the drop. One scan for all columns. */
  def stddevAudit(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c => stddev_samp(col(c)).as(s"${c}_std"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  def zeroVariancePrune(df: DataFrame, cols: Seq[String],
                        eps: Double = 1e-10): DataFrame = {
    val stds = stddevAudit(df, cols).head()
    val dead = cols.zipWithIndex.collect {
      case (c, i) if stds.getDouble(i) <= eps => c
    }
    df.drop(dead: _*)
  }

  /** P20 — wide binary flags → one comma-joined categorical string
    * (reference `bgrfunctions.py:35-40,56-76` `binary_to_categorical`).
    * Pure row-local expression — no unpivot shuffle: each flag contributes
    * its name when set, `concat_ws` skips the nulls. */
  def binaryToCategorical(df: DataFrame, flags: Seq[(String, Column)],
                          out: String): DataFrame =
    df.withColumn(out,
      concat_ws(", ", flags.map { case (n, p) =>
        when(p, lit(n)).otherwise(lit(null))
      }: _*))

  /** P12 — column-name sanitization (reference `functions.py:22-28`
    * strips `.` from names for Spark compatibility). */
  def sanitizeNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.toIndexedSeq.map(_.replace(".", "")): _*)
}
