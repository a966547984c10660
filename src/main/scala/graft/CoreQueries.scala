package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.RelationalOps

/** Relational core of the engine (SURVEY.md §2.2–§2.7), each operator as a
  * named driver-verifiable query over the TPC-H-ish fixtures, with an ANSI
  * SQL oracle for DuckDB. Every query ends in a deterministic total ORDER
  * BY; float outputs follow the parity rules in [[GQuery]].
  */
object CoreQueries {

  /** cents(x) — exact integer money, bit-identical across engines. */
  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100, 0).cast("long")

  val all: Seq[GQuery] = Seq(

    // ---- J1 flagship: trim low-importance elements ---------------------
    GQuery("q01_trim_semijoin",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        RelationalOps.trimLowImportance(li, "l_partkey", 30, "l_suppkey", 600)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_quantity")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
             |FROM lineitem
             |WHERE l_partkey IN (SELECT l_partkey FROM lineitem
             |                    GROUP BY 1 HAVING count(*) > 30)
             |  AND l_suppkey IN (SELECT l_suppkey FROM lineitem
             |                    GROUP BY 1 HAVING count(*) > 600)
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      doc = "reference bgrfunctions.py:43-53 (games>1000 ratings ∧ users>10)"),

    // ---- A1/A3 pricing summary (TPC-H Q1 shape) ------------------------
    GQuery("q02_pricing_summary",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("sum_disc_cents"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(CAST(sum(l_quantity) AS DOUBLE) AS BIGINT) AS sum_qty,
             |  CAST(sum(CAST(round(l_extendedprice*100, 0) AS BIGINT)) AS BIGINT) AS sum_base_cents,
             |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100, 0) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
             |  round(avg(l_quantity), 6) AS avg_qty,
             |  count(*) AS count_order
             |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      doc = "A1 hash agg with map-side partials; whole-stage codegen"),

    // ---- P4 comparison-predicate filter + projection -------------------
    GQuery("q03_filter_project",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 10 && col("l_quantity") <= 20 &&
          col("l_discount") > 0.05)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount
             |FROM lineitem
             |WHERE l_quantity >= 10 AND l_quantity <= 20 AND l_discount > 0.05
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      doc = "reference bgrfunctions.py:98-104; filters push to parquet scan"),

    // ---- P8 CASE WHEN discretization ------------------------------------
    GQuery("q04_case_when",
      (s, d) => RelationalOps
        .discretize(Tables.lineitem(s, d), "l_quantity", 25.0, "buckets")
        .groupBy("buckets")
        .agg(count(lit(1)).as("n"),
          round(avg(col("l_quantity")), 6).as("avg_qty"))
        .orderBy("buckets"),
      Some("""SELECT CAST(CASE WHEN l_quantity < 25 THEN 0.0 ELSE 1.0 END
             |    AS DOUBLE) AS buckets,
             |  count(*) AS n, round(avg(l_quantity), 6) AS avg_qty
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "reference bgrfunctions.py:22-24 discretize_ratings"),

    // ---- P9/P10 derived column, rounding, casts ------------------------
    GQuery("q05_round_cast",
      (s, d) => Tables.lineitem(s, d)
        .withColumn("price_r", round(col("l_extendedprice"), 1))
        .withColumn("qty_int", col("l_quantity").cast("int"))
        .withColumn("ship_epoch", unix_timestamp(col("l_shipdate")))
        .select("l_orderkey", "l_linenumber", "price_r", "qty_int",
          "ship_epoch")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  round(l_extendedprice, 1) AS price_r,
             |  CAST(l_quantity AS INTEGER) AS qty_int,
             |  CAST(floor(epoch(l_shipdate)) AS BIGINT) AS ship_epoch
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),
      doc = "reference als.py:29 round(Rating,1); bgrfunctions.py:145-148 casts"),

    // ---- P5 HAVING over aggregate --------------------------------------
    GQuery("q06_having",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 30)
        .orderBy("l_partkey"),
      Some("""SELECT l_partkey, count(*) AS cnt FROM lineitem
             |GROUP BY 1 HAVING count(*) > 30 ORDER BY 1""".stripMargin),
      doc = "reference bgrfunctions.py:46 df1.filter(count > numrec)"),

    // ---- J2 fact ⋈ dim ⋈ dim inner joins --------------------------------
    GQuery("q07_join_inner",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o  = Tables.orders(s, d).select("o_orderkey", "o_custkey")
        val c  = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
        // no broadcast hint on customer: it scales with SF (unlike the
        // fixed-size nation/region dims of q09) — AQE broadcasts from
        // runtime stats while it fits and degrades to shuffle, not a
        // driver OOM, when it doesn't
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(
            sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
              .as("revenue_cents"),
            count(lit(1)).as("n_lines"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment,
             |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents,
             |  count(*) AS n_lines
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "reference fmreg.py:27 complete.join(ratings,'BGGId'); AQE picks the dim-side strategy"),

    // ---- J4 right outer join -------------------------------------------
    GQuery("q08_join_right",
      (s, d) => {
        val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
        val c = Tables.customer(s, d).select("c_custkey")
        o.join(c, o("o_custkey") === c("c_custkey"), "right")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("n_orders"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
             |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "reference data_cleaning.py:110 right outer join"),

    // ---- J5 star left-join chain ---------------------------------------
    GQuery("q09_join_star",
      (s, d) => {
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
          .groupBy("r_name", "n_name")
          .agg(count(lit(1)).as("n_cust"),
            round(avg(col("c_acctbal")), 4).as("avg_bal"))
          .orderBy("r_name", "n_name")
      },
      Some("""SELECT r_name, n_name, count(*) AS n_cust,
             |  round(avg(c_acctbal), 4) AS avg_bal
             |FROM customer
             |LEFT JOIN nation ON c_nationkey = n_nationkey
             |LEFT JOIN region ON n_regionkey = r_regionkey
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      doc = "reference read_db.py:27-33 7-way star join; dims broadcast"),

    // ---- W4 grouped top-k ----------------------------------------------
    GQuery("q10_topk_group",
      (s, d) => RelationalOps.topKPerGroup(
          Tables.orders(s, d).select("o_custkey", "o_orderkey", "o_totalprice"),
          part = Seq(col("o_custkey")),
          order = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
          k = 3)
        .withColumn("o_totalprice", round(col("o_totalprice"), 2))
        .orderBy("o_custkey", "rn"),
      Some("""SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
             |  CAST(rn AS INTEGER) AS rn
             |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             |        row_number() OVER (PARTITION BY o_custkey
             |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |      FROM orders) t
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin),
      doc = "reference als.py:44-47 recommendForAllUsers(10) relational analog; WindowGroupLimit pushes k"),

    // ---- W1/W3 global sort + limit -------------------------------------
    GQuery("q11_sort_limit",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20),
      Some("""SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
             |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin),
      doc = "reference read_db.py:34 sort_values desc; TakeOrderedAndProject, no full sort"),

    // ---- A2 distinct count ---------------------------------------------
    GQuery("q12_distinct_count",
      (s, d) => Tables.orders(s, d)
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders")),
      Some("""SELECT count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
             |FROM orders""".stripMargin),
      doc = "reference als.py:52 select('UserId').distinct().count()"),

    // ---- A7 mode with deterministic tie-break ---------------------------
    GQuery("q13_mode",
      (s, d) => RelationalOps.modeOf(Tables.orders(s, d), "o_orderpriority")
        .withColumnRenamed("count", "cnt"),
      Some("""SELECT o_orderpriority, count(*) AS cnt FROM orders
             |GROUP BY 1 ORDER BY cnt DESC, o_orderpriority LIMIT 1""".stripMargin),
      doc = "reference bgrfunctions.py:27-32 find_most_frequent_value"),

    // ---- A6 exact percentiles + IQR fences ------------------------------
    GQuery("q14_percentile_iqr",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val q = li.agg(
          percentile(col("l_quantity"), lit(0.25)).as("q1"),
          percentile(col("l_quantity"), lit(0.75)).as("q3"))
        val kept = li.crossJoin(broadcast(q))
          .filter(col("l_quantity") > col("q1") - (col("q3") - col("q1")) &&
                  col("l_quantity") < col("q3") + (col("q3") - col("q1")))
          .agg(count(lit(1)).as("n_kept"))
        q.crossJoin(kept)
          .select(round(col("q1"), 4).as("q1"), round(col("q3"), 4).as("q3"),
            round(col("q3") - col("q1"), 4).as("iqr"), col("n_kept"))
      },
      Some("""WITH q AS (SELECT quantile_cont(l_quantity, 0.25) AS q1,
             |                  quantile_cont(l_quantity, 0.75) AS q3
             |           FROM lineitem),
             |k AS (SELECT count(*) AS n_kept FROM lineitem, q
             |      WHERE l_quantity > q1 - (q3 - q1)
             |        AND l_quantity < q3 + (q3 - q1))
             |SELECT round(q1, 4) AS q1, round(q3, 4) AS q3,
             |       round(q3 - q1, 4) AS iqr, n_kept
             |FROM q, k""".stripMargin),
      doc = "reference bgrfunctions.py:369-393 remove_outliers; exact percentile, fences stay in-plan"),

    // ---- A9 pairwise Pearson correlation --------------------------------
    GQuery("q15_corr",
      (s, d) => Tables.lineitem(s, d).agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(corr(col("l_extendedprice"), col("l_discount")), 4).as("corr_price_disc"),
        round(stddev_samp(col("l_quantity")), 4).as("std_qty")),
      Some("""SELECT round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
             |  round(corr(l_extendedprice, l_discount), 4) AS corr_price_disc,
             |  round(stddev_samp(l_quantity), 4) AS std_qty
             |FROM lineitem""".stripMargin),
      doc = "reference functions.py:153-171 Correlation.corr; A4 stddev"),

    // ---- A11 min-max scaling -------------------------------------------
    GQuery("q16_minmax_scale",
      (s, d) => RelationalOps.minMaxScale(
          Tables.customer(s, d).select("c_custkey", "c_acctbal"),
          "c_acctbal", "bal_scaled")
        .select(col("c_custkey"), round(col("bal_scaled"), 6).as("bal_scaled"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |  round(CASE WHEN max(c_acctbal) OVER () = min(c_acctbal) OVER ()
             |             THEN CAST(0.5 AS DOUBLE)
             |             ELSE (c_acctbal - min(c_acctbal) OVER ()) /
             |                  (max(c_acctbal) OVER () - min(c_acctbal) OVER ())
             |        END, 6) AS bal_scaled
             |FROM customer ORDER BY c_custkey""".stripMargin),
      doc = "reference fmreg.py:35-37 MinMaxScaler relational analog"),

    // ---- M1 analog: frequency-ranked dictionary -------------------------
    GQuery("q17_string_indexer",
      (s, d) => RelationalOps.frequencyIndex(
          Tables.customer(s, d), "c_mktsegment")
        .orderBy("idx"),
      Some("""SELECT c_mktsegment, count(*) AS cnt,
             |  row_number() OVER (ORDER BY count(*) DESC, c_mktsegment) - 1 AS idx
             |FROM customer GROUP BY 1 ORDER BY idx""".stripMargin),
      doc = "reference bgrfunctions.py:151-160 StringIndexer freq-desc dictionary"),

    // ---- set op: union --------------------------------------------------
    GQuery("q18_union",
      (s, d) => Tables.nation(s, d).select(col("n_name").as("name"))
        .union(Tables.region(s, d).select(col("r_name").as("name")))
        .distinct()
        .orderBy("name"),
      Some("""SELECT n_name AS name FROM nation
             |UNION SELECT r_name FROM region ORDER BY 1""".stripMargin),
      doc = "SURVEY §2.6: free from Spark; one union query for coverage"),

    // ---- P2/P12 projection-pushdown shape (narrow read of wide table) ---
    GQuery("q19_project_prune",
      (s, d) => Tables.part(s, d)
        .select("p_partkey", "p_brand")
        .filter(col("p_brand") === "Brand#1")
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_brand FROM part
             |WHERE p_brand = 'Brand#1' ORDER BY p_partkey""".stripMargin),
      doc = "column pruning + predicate pushdown must reach the scan (ReadSchema/PushedFilters)")
  )
}
