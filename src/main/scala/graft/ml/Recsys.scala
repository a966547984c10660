package graft.ml

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** ALS collaborative filtering — the reference's flagship pipeline
  * (SURVEY.md §2.9 M7–M8, reference `PySpark Scripts/als.py` +
  * `bgrfunctions.py:179-201`). Parameters mirror the reference
  * (`coldStartStrategy='drop', maxIter, seed=1`); unlike the reference,
  * every random split is seeded (its `randomSplit` was unseeded — SURVEY
  * §2.9 M19) and the training input is persisted before the iterative fit
  * so the lineage is not recomputed per iteration sweep.
  */
object Recsys {

  final case class FitResult(model: ALSModel, rmse: Double, r2: Double)

  /** Train ALS with held-out metrics (reference `als_prediction`,
    * `bgrfunctions.py:179-201`, grid collapsed to one point for bench
    * sanity — the TVS grid harness lives in [[Classifiers.tvsGrid]]). */
  def fitAls(ratings: DataFrame, userCol: String, itemCol: String,
             ratingCol: String, rank: Int = 8, regParam: Double = 0.1,
             maxIter: Int = 5, seed: Long = 1L): FitResult = {
    // borrow, don't own: a caller that persisted `ratings` for its own
    // downstream consumers (qml50's known-users dim and totals agg) must
    // not lose its cache when this fit returns — persist state lives on
    // the shared plan, so an unconditional persist/unpersist pair here
    // would silently drop it (the borrowMaterialized contract, q97)
    val (persisted, release) =
      graft.ops.RelationalOps.borrowMaterialized(ratings)
    val Array(train, test) = persisted.randomSplit(Array(0.8, 0.2), seed = 42L)
    val als = new ALS()
      .setUserCol(userCol).setItemCol(itemCol).setRatingCol(ratingCol)
      .setColdStartStrategy("drop")
      .setRank(rank).setRegParam(regParam).setMaxIter(maxIter).setSeed(seed)
    val model = als.fit(train)
    val pred = model.transform(test)
    def eval(metric: String): Double = new RegressionEvaluator()
      .setMetricName(metric).setLabelCol(ratingCol)
      .setPredictionCol("prediction").evaluate(pred)
    val res = FitResult(model, eval("rmse"), eval("r2"))
    release()
    res
  }

  final case class GridResult(bestRank: Int, bestRegParam: Double,
                              rmse: Double, r2: Double)

  /** The reference's actual ALS tuning loop (`bgrfunctions.py:179-201`):
    * TrainValidationSplit over rank × regParam with trainRatio 0.8,
    * RMSE-selected. Input persisted once — the TVS harness fits
    * |ranks|·|regParams| + 1 models over the same frame. The flagship
    * qml50 stays a single point (bench sanity); this is the grid. */
  def fitAlsGrid(ratings: DataFrame, userCol: String, itemCol: String,
                 ratingCol: String, ranks: Seq[Int], regParams: Seq[Double],
                 maxIter: Int = 5, seed: Long = 1L): GridResult = {
    import org.apache.spark.ml.tuning.ParamGridBuilder
    // ALS truncates its factor lineage every checkpointInterval (10)
    // iterations ONLY when the context has a checkpoint dir; without one
    // a deep fit (maxIter > ~10) at scale builds an object graph whose
    // task deserialization overflows the executor thread stack
    // (surfaced by the sf0.1 verbatim-grid run). Respect a caller-set
    // dir; otherwise anchor a temp one for the fit's duration — and undo
    // the mutation afterwards: the checkpoint dir is session-global
    // state, so a leftover setting would silently redirect every later
    // checkpoint user, and the temp dir itself (holding checkpointed
    // factor RDD blocks) would accumulate on a real cluster's DFS.
    val sc = ratings.sparkSession.sparkContext
    val anchoredCp: Option[java.nio.file.Path] =
      if (sc.getCheckpointDir.isEmpty && maxIter > 10) {
        // pid in the prefix: lets the leak-check spec scope its tmpdir
        // scan to THIS JVM's dirs, so a concurrent graft process
        // anchoring its own ALS checkpoint can't trip the assertion
        val d = java.nio.file.Files.createTempDirectory(
          s"graft_als_cp_${ProcessHandle.current().pid()}_")
        sc.setCheckpointDir(d.toString)
        Some(d)
      } else None
    // borrow, don't own (see fitAls): qml58 persists the bounded sample
    // for its own count and must keep it until its release
    val (persisted, release) =
      graft.ops.RelationalOps.borrowMaterialized(ratings)
    try {
      val Array(train, test) = persisted.randomSplit(Array(0.8, 0.2), seed = 42L)
      val als = new ALS()
        .setUserCol(userCol).setItemCol(itemCol).setRatingCol(ratingCol)
        .setColdStartStrategy("drop") // unseen users/items must not NaN the metric
        .setMaxIter(maxIter).setSeed(seed)
      val grid = new ParamGridBuilder()
        .addGrid(als.rank, ranks.toArray)
        .addGrid(als.regParam, regParams.toArray).build()
      val ev = new RegressionEvaluator().setMetricName("rmse")
        .setLabelCol(ratingCol).setPredictionCol("prediction")
      // parallelism 1: each ALS fit is already a wide, cache- and
      // shuffle-heavy parallel job — concurrent ALS fits contend for
      // executor memory/cores instead of back-filling (measured 18.1s
      // at parallelism 4 vs 10.4s sequential on the bench grid)
      val best = Classifiers.tvsGrid(als, grid, ev, train, parallelism = 1)
      val pred = best.transform(test)
      // both evaluate() calls are actions: by the time GridResult exists
      // the metrics are plain scalars and nothing downstream can ever
      // re-read the checkpointed factor blocks — safe to delete the dir
      GridResult(best.rank,
        best.parent.asInstanceOf[ALS].getRegParam,
        ev.evaluate(pred),
        new RegressionEvaluator().setMetricName("r2").setLabelCol(ratingCol)
          .setPredictionCol("prediction").evaluate(pred))
    } finally {
      release()
      anchoredCp.foreach { d =>
        sc.setCheckpointDir(null) // restore the no-checkpoint-dir state
        graft.Staging.deleteRecursively(d)
      }
    }
  }

  /** Top-k recommendations per user, exploded and rounded — the
    * reference's presentation shape (`als.py:44-50`: recommendForAllUsers
    * → explode → select rec.* → round). */
  def recommendTopK(model: ALSModel, k: Int): DataFrame =
    model.recommendForAllUsers(k)
      .select(col("user_id"), posexplode(col("recommendations"))
        .as(Seq("rank0", "rec")))
      .select(col("user_id"), (col("rank0") + 1).as("rank"),
        col("rec.item_id").as("item_id"),
        round(col("rec.rating"), 4).as("score"))
}
