package graft

import org.apache.spark.sql.functions._
import graft.ops.RelationalOps

/** Relational analogs of the ML evaluators (SURVEY.md §2.9 M16–M18) with
  * full DuckDB oracles — the reference's metric surface, checkable
  * without vector columns. The ROC-AUC uses the rank-sum (Mann–Whitney)
  * formulation with average ranks for ties, computed DISTRIBUTED: row
  * ranks come from a range-partitioned sort + zipWithIndex
  * ([[RelationalOps.zipWithRank]]), never a no-partition window, and the
  * tie-averaging makes the result independent of the tiebreak order.
  */
object MetricsQueries {

  val all: Seq[GQuery] = Seq(

    // ---- M16 RegressionEvaluator analog: rmse + r2 ----------------------
    GQuery("q51_regression_metrics",
      (s, d) => {
        val li = Tables.lineitem(s, d).select("l_partkey", "l_quantity")
        // deterministic "model": predict a line's quantity by its part's
        // mean quantity (train = test; the metric math is what's under
        // oracle check, mirroring RegressionEvaluator semantics)
        val pred = li.groupBy("l_partkey")
          .agg(avg(col("l_quantity")).as("pred"))
        val j = li.join(pred, Seq("l_partkey"))
          .select(col("l_quantity").cast("double").as("y"), col("pred"))
        val ybar = j.agg(avg(col("y")).as("ybar"))
        j.crossJoin(broadcast(ybar))
          .agg(
            round(sqrt(avg(pow(col("y") - col("pred"), 2))), 4).as("rmse"),
            round(lit(1.0) - sum(pow(col("y") - col("pred"), 2)) /
              sum(pow(col("y") - col("ybar"), 2)), 4).as("r2"))
      },
      Some("""WITH p AS (SELECT l_partkey, avg(l_quantity) AS pred
             |          FROM lineitem GROUP BY 1),
             |j AS (SELECT CAST(l_quantity AS DOUBLE) AS y, pred
             |      FROM lineitem JOIN p USING (l_partkey)),
             |m AS (SELECT avg(y) AS ybar FROM j)
             |SELECT round(sqrt(avg(pow(y - pred, 2))), 4) AS rmse,
             |  round(1.0 - sum(pow(y - pred, 2)) / sum(pow(y - ybar, 2)), 4) AS r2
             |FROM j, m""".stripMargin),
      doc = "M16 RegressionEvaluator analog (reference bgrfunctions.py:183-184): rmse + r2 in one aggregation, 1-row mean broadcast"),

    // ---- M17/M18 analog: confusion matrix, accuracy, rank-sum ROC-AUC ---
    GQuery("q52_classification_metrics",
      (s, d) => {
        // (r21: spreading this scan was measured — 3.9/4.6s spread vs
        // 3.0/3.8s unspread over two matched pairs, consistently worse:
        // the repartition costs more than the parallel partials gain at
        // this row weight — and NOT adopted.)
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice").cast("double").as("score"),
            when(col("l_quantity") >= 25, 1.0).otherwise(0.0).as("y"))
        // threshold rule: predict positive above the exact median score
        val med = li.agg(percentile(col("score"), lit(0.5)).as("med"))
        val scored = li.crossJoin(broadcast(med))
          .withColumn("pred", when(col("score") > col("med"), 1.0).otherwise(0.0))
        val confusion = scored.agg(
          sum(when(col("y") === 1.0 && col("pred") === 1.0, 1L).otherwise(0L)).as("tp"),
          sum(when(col("y") === 0.0 && col("pred") === 1.0, 1L).otherwise(0L)).as("fp"),
          sum(when(col("y") === 0.0 && col("pred") === 0.0, 1L).otherwise(0L)).as("tn"),
          sum(when(col("y") === 1.0 && col("pred") === 0.0, 1L).otherwise(0L)).as("fn"),
          round(avg((col("y") === col("pred")).cast("double")), 4).as("accuracy"))
        // Mann–Whitney AUC with average ranks: rank every row by score
        // (distributed sort + zipWithIndex), average ranks within tied
        // scores (makes the tiebreak irrelevant), sum over positives.
        // r21 shape: ONE group-level aggregation instead of re-joining
        // the per-row rank frame onto its own score groups — the old
        // shape consumed `ranked` twice (zipWithRank re-runs its
        // reduce-side sort per consumer) and shuffled every row through
        // a score join. Exactly equal by construction: Σ_{rows,y=1}
        // arank = Σ_groups npos_g·arank_g, and every term is EXACT in
        // double — arank is the mean of consecutive integer ranks (an
        // integer or half-integer, exactly representable), npos_g an
        // integer, and all sums stay far below 2^53 — so the bit-exact
        // oracle hash is unchanged, not merely close.
        val ranked = RelationalOps.zipWithRank(li,
          Seq(col("score"), col("l_orderkey"), col("l_linenumber")), "rn")
        val auc = ranked.groupBy("score")
          .agg(avg(col("rn")).as("arank"),
            sum(col("y")).as("npos_g"),
            count(lit(1)).as("n_g"))
          .agg(
            sum(col("npos_g") * col("arank")).as("rpos"),
            sum(col("npos_g")).as("npos"),
            sum(col("n_g") - col("npos_g")).as("nneg"))
          .select(round(
            (col("rpos") - col("npos") * (col("npos") + 1) / 2) /
              (col("npos") * col("nneg")), 6).as("roc_auc"))
        confusion.crossJoin(auc)
      },
      Some("""WITH li AS (SELECT l_orderkey, l_linenumber,
             |    CAST(l_extendedprice AS DOUBLE) AS score,
             |    CASE WHEN l_quantity >= 25 THEN 1.0 ELSE 0.0 END AS y
             |  FROM lineitem),
             |m AS (SELECT quantile_cont(score, 0.5) AS med FROM li),
             |s AS (SELECT y, score,
             |        CASE WHEN score > med THEN 1.0 ELSE 0.0 END AS pred
             |      FROM li, m),
             |conf AS (SELECT
             |    CAST(sum(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             |    CAST(sum(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             |    CAST(sum(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
             |    CAST(sum(CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             |    round(avg(CASE WHEN y = pred THEN 1.0 ELSE 0.0 END), 4) AS accuracy
             |  FROM s),
             |r AS (SELECT y, score,
             |        row_number() OVER (ORDER BY score, l_orderkey, l_linenumber) AS rn
             |      FROM li),
             |ar AS (SELECT score, avg(rn) AS arank FROM r GROUP BY 1),
             |a AS (SELECT round(
             |        (sum(CASE WHEN y = 1 THEN arank ELSE 0 END)
             |          - sum(y) * (sum(y) + 1) / 2) /
             |        (sum(y) * sum(1 - y)), 6) AS roc_auc
             |      FROM r JOIN ar USING (score))
             |SELECT tp, fp, tn, fn, accuracy, roc_auc FROM conf, a""".stripMargin),
      doc = "M17/M18 analog (reference bgrfunctions.py:249-250): confusion counts + accuracy + rank-sum ROC-AUC; ranks distributed via zipWithRank, tie-averaged")
  )
}
