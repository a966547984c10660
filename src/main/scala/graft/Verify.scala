package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_ONLY=q17,q32 — builder-side targeted re-verification;
    // the driver never sets it (full dump). Resolved BEFORE the
    // SparkSession: a typo'd or degenerate filter (which would
    // otherwise make the manifest-driven verify_local flow report
    // green for a query that never ran, or run zero queries and exit
    // 0) fails in milliseconds, not after Spark startup.
    val only = OnlyFilter.resolve("verify", SparkEntry.queries.keySet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // micros (not INT96) so the driver's pyarrow/duckdb read the dumps
      // with the same timestamp semantics as the oracle
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A failed query leaves no parquet dir; errors.json names every
    // failure so a missing dump is never silently "unmeasured".
    // The run's scope, computed ONCE: the loop below executes exactly
    // this list and the attempted.json manifest declares exactly it, so
    // the two can never drift.
    val attempted = SparkEntry.queries.keys.toSeq.sorted
      .filter(name => only.forall(_.contains(name)))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + JsonEscape.str(s) + "\""
    // Both scope-describing files are written BEFORE the query loop, and
    // any stale errors.json from a previous run in a reused outDir is
    // removed: an interrupted run then reads as missing-dump FAILs under
    // the fresh full-scope manifest, never as a previous run's (smaller
    // or different) green scope.
    // oracle_sql.json is always the FULL registry, even under
    // SPARK_GRAFT_ONLY — the full map lets scripts/oracle_type_sweep.py
    // type-check every registered oracle from any Verify run's output;
    // attempted.json declares which queries THIS run executed (errored
    // ones included — their dumps are absent, and a scope-aware compare
    // must still flag them, never skip them).
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/attempted.json"),
      attempted.map(q).mkString("[", ",", "]"))
    Files.deleteIfExists(Paths.get(s"$outDir/errors.json"))
    // Also remove each attempted query's STALE dump dir up front: in a
    // reused outDir, an interrupted run must read as missing-dump FAILs
    // — a previous run's dumps surviving under this run's fresh
    // manifest would certify queries this run never executed. (Dumps
    // of queries OUTSIDE the scope are kept: the manifest excludes
    // them from the compare.)
    // Strict variant deliberately: a swallowed delete failure here
    // would silently re-admit stale dumps into the compare.
    attempted.foreach { name =>
      Staging.deleteRecursivelyStrict(Paths.get(s"$outDir/$name"))
    }
    val errors = attempted.map(name => name -> SparkEntry.queries(name))
      .flatMap {
      case (name, fn) =>
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          None
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name FAILED: $e")
          Some(name -> e.toString.take(500))
        } finally {
          // multi-pass ops leave their (bounded) output frames and
          // dictionary RDDs persisted for their consumers; release them
          // between queries so cache residency never accumulates
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
        }
    }
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: " +
        errors.map(_._1).mkString(", "))
    spark.stop()
  }
}
