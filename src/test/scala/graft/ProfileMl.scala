package graft

import org.apache.spark.sql.functions._

/** Dev-only stage profiler for qml50's ALS lineage (guide §1: measure
  * first). Not registered, not a test — run with
  * `sbt "Test/runMain graft.ProfileMl [sfDir]"`. */
object ProfileMl {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = BenchSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(100).count()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    var ratings: org.apache.spark.sql.DataFrame = null
    t("ratings materialize") {
      ratings = graft.ops.RelationalOps.materialized(
        Tables.ratings(spark, sfDir))
    }
    var fit: graft.ml.Recsys.FitResult = null
    t("fitAls (incl. rmse/r2 eval)") {
      fit = graft.ml.Recsys.fitAls(ratings, "user_id", "item_id", "rating",
        rank = 8, regParam = 0.1, maxIter = 5)
    }
    var recs: org.apache.spark.sql.DataFrame = null
    t("recommendTopK noop") {
      recs = graft.ml.Recsys.recommendTopK(fit.model, 5)
      recs.write.format("noop").mode("overwrite").save()
    }
    t("recommendTopK noop (2nd)") {
      recs.write.format("noop").mode("overwrite").save()
    }
    ratings.unpersist()
    spark.stop()
  }
}
