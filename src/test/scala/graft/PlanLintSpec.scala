package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical plan-quality gate over the whole registry: the 100 TB
  * claims ("no all-pairs joins", "broadcasts only for bounded frames")
  * enforced as a test, so a future query or operator change that
  * regresses a plan into a cartesian product fails CI instead of
  * surviving until a bench run.
  *
  * ML (`qml*`) queries are excluded: building their frames fits models
  * eagerly, and their plan quality is covered by the input-persist
  * pattern asserted in their own code paths.
  */
class PlanLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  /** Queries whose BroadcastNestedLoopJoin is a BOUNDED-side broadcast —
    * 1-row aggregate frames (fences / means / modes / counts / metrics),
    * small constant range tables, or explicitly bounded query sets.
    * These stay O(n) at any corpus size because the broadcast side does
    * not grow with the data. */
  private val BoundedBroadcastOk = Set(
    "q14_percentile_iqr",         // 1-row IQR fence agg
    "q16_minmax_scale",           // 1-row min/max agg
    "q21_impute_mean",            // 1-row mean agg
    "q22_fill_const_mode",        // 1-row mode agg
    "q26_iqr_outliers",           // 1-row fence agg
    "q57_clean_pipeline",         // composes the fence/mean/mode aggs above
    "q33_dedup_simhash",          // 16-row constant bit-index range table
    "q48_tfidf",                  // 1-row corpus doc-count agg
    "q66_approx_agg",             // two 1-row agg frames crossJoined
    "q51_regression_metrics",     // 1-row metric aggs
    "q52_classification_metrics", // 1-row metric aggs
    "q34_knn_bruteforce",         // bounded (20-vector) query side
    "q77_quantized_recall")       // bounded query side, exact + quantized

  test("no CartesianProduct anywhere; BNLJ only with bounded broadcast sides") {
    val offenders = scala.collection.mutable.ListBuffer[String]()
    QueryRegistry.all.filterNot(_.name.startsWith("qml")).foreach { q =>
      val plan = q.fn(spark, Sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct"))
        offenders += s"${q.name}: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") &&
          !BoundedBroadcastOk(q.name))
        offenders += s"${q.name}: BroadcastNestedLoopJoin outside the " +
          "bounded-broadcast whitelist"
    }
    assert(offenders.isEmpty,
      s"plan-quality regressions:\n${offenders.mkString("\n")}")
  }
}
