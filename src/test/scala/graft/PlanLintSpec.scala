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
    "q48_tfidf",                  // 1-row corpus doc-count agg
    "q102_bigram_lm",             // 1-row corpus vocab-count agg
    "q104_jsonl_scan",            // 1-row line-count × 1-row valid-count glue
    "q66_approx_agg",             // two 1-row agg frames crossJoined
    "q51_regression_metrics",     // 1-row metric aggs
    "q52_classification_metrics", // 1-row metric aggs
    "q34_knn_bruteforce",         // bounded (20-vector) query side
    "q77_quantized_recall",       // bounded query side, exact + quantized
    "q86_csv_permissive",         // two 1-row count aggs crossJoined
    "q88_ivf_recall",             // bounded query side + 16-centroid table
    "q93_source_mixing",          // 1-row totals agg crossJoined onto the
                                  // 20-row per-source mix table
    "q94_leakage_split")          // 1-row straddle-count agg crossJoined
                                  // onto the 2-row side summary

  /** Scan-quality gate for the queries whose whole point is what reaches
    * the parquet scan: filters must push down (`PushedFilters`), unused
    * columns must be pruned (`ReadSchema`), and a partition-column filter
    * must prune directories at planning time (`PartitionFilters`). At
    * 100 TB these are the difference between scanning terabytes and
    * scanning gigabytes — asserting them here means a future refactor
    * that breaks pushdown (a UDF wrapper, a cast on the filter column)
    * fails CI instead of silently scanning everything. */
  test("scan quality: pushdown, pruning and partition filters reach the scans") {
    import org.apache.spark.sql.execution.ExplainMode
    def planOf(name: String): String =
      QueryRegistry.byName(name).fn(spark, Sf)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
    def lines(plan: String, key: String): Seq[String] =
      plan.linesIterator.filter(_.trim.startsWith(key)).toSeq
    def assertSome(plan: String, key: String, name: String,
                   needles: String*): Unit = {
      val ls = lines(plan, key)
      assert(ls.nonEmpty, s"$name: no $key in plan:\n$plan")
      needles.foreach { n =>
        assert(ls.exists(_.contains(n)),
          s"$name: $key lines ${ls.mkString(" | ")} miss '$n'")
      }
    }
    def assertNone(plan: String, key: String, name: String,
                   needles: String*): Unit =
      needles.foreach { n =>
        assert(!lines(plan, key).exists(_.contains(n)),
          s"$name: $key unexpectedly mentions '$n'")
      }

    // q03: both range predicates push into the lineitem scan; only the 4
    // projected columns are read (16-column table)
    val q03 = planOf("q03_filter_project")
    assertSome(q03, "PushedFilters", "q03", "l_quantity", "l_discount")
    assertSome(q03, "ReadSchema", "q03", "l_orderkey")
    assertNone(q03, "ReadSchema", "q03", "l_comment", "l_partkey",
      "l_extendedprice")

    // q19: equality predicate pushed, 2-of-9 columns read
    val q19 = planOf("q19_project_prune")
    assertSome(q19, "PushedFilters", "q19", "EqualTo(p_brand,Brand#1)")
    assertSome(q19, "ReadSchema", "q19", "p_partkey")
    assertNone(q19, "ReadSchema", "q19", "p_name", "p_retailprice")

    // q63: the event_type predicate lands in PartitionFilters (directory
    // pruning at planning time), NOT in the data filters
    val q63 = planOf("q63_partition_pruning")
    assertSome(q63, "PartitionFilters", "q63", "event_type", "purchase")

    // q70: the shipdate range filter pushes into the range-clustered scan,
    // where the per-file min/max footer stats make it skip whole files
    val q70 = planOf("q70_range_cluster")
    assertSome(q70, "PushedFilters", "q70", "l_shipdate")

    // q105: the price filter must reach the ORC scan — the query's one
    // claim beyond q62's sink/scan shape is columnar-tier pushdown, so
    // it is gated here, not just observed once (review r20 pass-3 #3)
    val q105 = planOf("q105_orc_roundtrip")
    assertSome(q105, "PushedFilters", "q105",
      "GreaterThan(o_totalprice,1000.0)")
  }

  test("no CartesianProduct anywhere; BNLJ only with bounded broadcast " +
      "sides; no empty-partition window anywhere") {
    val offenders = scala.collection.mutable.ListBuffer[String]()
    QueryRegistry.all.filterNot(_.name.startsWith("qml")).foreach { q =>
      val exec = q.fn(spark, Sf).queryExecution.executedPlan
      val plan = exec.toString
      if (plan.contains("CartesianProduct"))
        offenders += s"${q.name}: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") &&
          !BoundedBroadcastOk(q.name))
        offenders += s"${q.name}: BroadcastNestedLoopJoin outside the " +
          "bounded-broadcast whitelist"
      // the single-task-window gate: a Window with no partition spec
      // funnels the entire input through ONE task — no query may plan
      // one, with NO whitelist (zipWithRank exists precisely so ranked
      // dictionaries never need a global window)
      val gw = PlanLint.emptyPartitionWindows(exec)
      if (gw.nonEmpty)
        offenders += s"${q.name}: empty-partition window ${gw.mkString(", ")}"
    }
    assert(offenders.isEmpty,
      s"plan-quality regressions:\n${offenders.mkString("\n")}")
  }

  test("decontamination joins the corpus against a BROADCAST probe side") {
    // q90's scale claim: the benchmark probe set is tiny next to the
    // corpus, so the match must plan as a broadcast hash join (corpus
    // shingles filtered map-side, zero corpus shuffle before the
    // match) — a sort-merge join here would shuffle the full corpus
    // shingle stream by shingle string at 100 TB.
    val p90 = QueryRegistry.byName("q90_decontamination").fn(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(p90.contains("BroadcastHashJoin"),
      "probe match must be a broadcast hash join")
    assert(!p90.contains("SortMergeJoin"),
      "corpus shingles must not be shuffle-sorted for the probe match")
  }

  test("empty-partition window detector flags a planted Window.orderBy") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val planted = spark.range(10)
      .withColumn("rn", row_number().over(Window.orderBy("id")))
    val hits = PlanLint.emptyPartitionWindows(
      planted.queryExecution.executedPlan)
    assert(hits.nonEmpty,
      "detector missed a deliberately planted no-partition window")
    // and a partitioned window must NOT trip it
    val fine = spark.range(10)
      .withColumn("rn", row_number().over(
        Window.partitionBy(expr("id % 2")).orderBy("id")))
    assert(PlanLint.emptyPartitionWindows(
      fine.queryExecution.executedPlan).isEmpty,
      "detector false-positived on a partitioned window")
  }
}
