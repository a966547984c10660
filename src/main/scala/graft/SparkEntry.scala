package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in [[QueryRegistry]] (core relational + cleaning +
  * windows + dedup + similarity + text + ML).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the reference's signature relational op, J1 "trim
    * low-importance elements" (SURVEY.md §7.1). */
  def entry(spark: SparkSession): DataFrame =
    QueryRegistry.queries("q01_trim_semijoin")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryRegistry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Total over the registry since r20 — every
    * query (ML included) is oracle-checked. */
  def oracleSql: Map[String, String] = QueryRegistry.oracleSql
}
