package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV ingest/egress — the reference's native format (SURVEY.md §2.1
  * S1/S2: every reference entry point starts with
  * `spark.read.csv(inferSchema=True, header=True)`,
  * `PySpark Scripts/datacleaning.py:26,30`, `als.py:21-22`,
  * `fmreg.py:16-17`; the sink is
  * `coalesce(1).write.option('header',True).mode('overwrite').csv`).
  *
  * Scale notes: `inferSchema` runs one extra full pass over the file —
  * the explicit-schema variant ([[csvWithSchema]]) is the production path
  * (single pass, no sampling surprise, stable types). The single-file
  * sink serializes the last stage through one task — kept ONLY as the
  * reference-parity output format; [[writeCsvDistributed]] is the scale
  * path (one file per partition).
  */
object Sources {

  /** S1 — CSV scan with schema inference (reference parity path). */
  def csv(spark: SparkSession, path: String, header: Boolean = true,
          inferSchema: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.options(Map(
      "header" -> header.toString,
      "inferSchema" -> inferSchema.toString,
      "delimiter" -> delimiter)).csv(path)

  /** S1 — CSV scan with an explicit schema (production path: one pass,
    * no inference job). */
  def csvWithSchema(spark: SparkSession, path: String, schema: StructType,
                    header: Boolean = true,
                    delimiter: String = ","): DataFrame =
    spark.read.schema(schema).options(Map(
      "header" -> header.toString,
      "delimiter" -> delimiter)).csv(path)

  /** S1 tolerant ingest — PERMISSIVE parse with a corrupt-record column
    * (the production form of the reference's real-world CSV reality,
    * `PySpark Scripts/datacleaning.py:26`: its pandas/inferSchema ingest
    * silently coerces dirt; at 100 TB a single malformed line must
    * neither kill the job nor vanish silently). Rows that fail the
    * schema land verbatim in `corruptCol` with the typed fields null,
    * so dirt is countable, quarantinable, and re-parsable downstream.
    * Note Spark refuses plans that reference ONLY the corrupt column —
    * always keep at least one data column in the projection. */
  def csvPermissive(spark: SparkSession, path: String, schema: StructType,
                    corruptCol: String = "_corrupt_record",
                    header: Boolean = false,
                    delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema.add(corruptCol,
        org.apache.spark.sql.types.StringType, nullable = true))
      .options(Map(
        "header" -> header.toString,
        "delimiter" -> delimiter,
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> corruptCol)).csv(path)

  /** S1 tolerant ingest, row-drop variant: malformed rows are silently
    * discarded at the parser (DROPMALFORMED). Same scan shape as
    * [[csvWithSchema]]; use [[csvPermissive]] when the dirt itself must
    * be audited. */
  def csvDropMalformed(spark: SparkSession, path: String,
                       schema: StructType, header: Boolean = false,
                       delimiter: String = ","): DataFrame =
    spark.read.schema(schema).options(Map(
      "header" -> header.toString,
      "delimiter" -> delimiter,
      "mode" -> "DROPMALFORMED")).csv(path)

  /** S2 — single-file CSV sink with header, overwrite (reference parity:
    * `datacleaning.py:30,98`). `coalesce(1)` is the reference's own
    * anti-optimization — one task writes the file. */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.coalesce(1).write.option("header", header.toString)
      .mode("overwrite").csv(path)

  /** S2 at scale — one file per partition, no single-task funnel. */
  def writeCsvDistributed(df: DataFrame, path: String,
                          header: Boolean = true): Unit =
    df.write.option("header", header.toString).mode("overwrite").csv(path)

  /** Bucketed parquet table (external, explicit path — no dependence on
    * the session warehouse dir): pre-shuffles the data into `numBuckets`
    * hash buckets on `bucketCol` and sorts within buckets, so any later
    * equi join or aggregation on that key runs WITHOUT an exchange —
    * the canonical co-located-join layout for repeated 100 TB joins
    * (pay the shuffle once at write time, never at read time). */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .option("path", path).mode("overwrite").format("parquet")
      .saveAsTable(table)
  }
}
