package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, driver-verifiable query.
  *
  * @param name   key in `SparkEntry.queries`
  * @param fn     `(spark, sfDir) => DataFrame`; must end in a deterministic
  *               total ORDER BY over non-null keys (the driver hash-compares
  *               rows in order)
  * @param oracle equivalent ANSI SQL for DuckDB over the same parquet
  *               tables; None → driver records a weaker rows-only check
  *               (used for ML / vector-typed outputs only)
  *
  * Oracle-parity rules used throughout (see SURVEY.md §7.4):
  *  - monetary sums → integer cents (`cast(round(x*100) as bigint)`):
  *    bit-exact in both engines, immune to float summation order;
  *  - avg/stddev/corr/percentile → `round(..., 4..6)` doubles;
  *  - timestamps → epoch seconds as bigint (never raw timestamp columns);
  *  - counts → bigint in both (DuckDB `sum(int)` would widen to hugeint,
  *    so integer sums are always wrapped in `CAST(... AS BIGINT)`);
  *  - sort keys are non-null (Spark default is NULLS FIRST, DuckDB NULLS
  *    LAST — never sort on a nullable column without COALESCE).
  */
final case class GQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QueryRegistry {
  lazy val all: Seq[GQuery] =
    CoreQueries.all ++ CleaningQueries.all ++ WindowQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ TextQueries.all ++
      MiscQueries.all ++ MetricsQueries.all ++ MlQueries.all

  lazy val byName: Map[String, GQuery] = {
    val m = all.map(q => q.name -> q).toMap
    require(m.size == all.size, "duplicate query name in registry")
    m
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
