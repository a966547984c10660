package graft

import org.apache.spark.sql.SparkSession

/** ONE definition of the bench-family session knobs and the between-runs
  * cache release, shared by [[Bench]] and [[PlanStamp]] (review r20 #3):
  * the plan-shape gate's validity rests on PlanStamp describing exactly
  * the plans Bench (and a cluster deploy) would get, so the conf block
  * must be physically shared — a future Bench conf tune (broadcast
  * threshold, shuffle partitions) that PlanStamp missed would make the
  * gate compare apples to oranges with no error. */
object BenchSession {

  /** local[cpus] with cpus-sized shuffle partitioning, AQE + partition
    * coalescing, the graft SQL extensions, UTC, UI off. */
  def build(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // (r21: KryoSerializer for the RDD-path shuffles was measured —
      // qml50 8.5s vs 8.1s, qml58 10.9s vs 10.7s, i.e. no win at these
      // block sizes — and deliberately NOT adopted.)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Release frames/RDDs the multi-pass ops leave persisted for their
    * consumers, so no run (or stamp) inherits another's cache pressure. */
  def releaseCaches(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
