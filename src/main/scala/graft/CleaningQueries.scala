package graft

import org.apache.spark.sql.functions._
import graft.ops.CleaningOps

/** The reference's pandas cleaning tier as driver-verifiable queries
  * (SURVEY.md §2.2 P13–P20). Fixtures are null-free, so null-producing
  * steps first rewrite a sentinel to null (exactly the reference's own
  * `'[]'`→NaN / `0`→NaN pattern, `datacleaning.py:77-78`).
  */
object CleaningQueries {

  val all: Seq[GQuery] = Seq(

    // ---- P13 null audit -------------------------------------------------
    GQuery("q20_null_audit",
      (s, d) => CleaningOps.nullAudit(
        Tables.customer(s, d).select("c_custkey", "c_name", "c_acctbal")),
      Some("""SELECT
             |  CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_custkey_nulls,
             |  CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_name_nulls,
             |  CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_acctbal_nulls
             |FROM customer""".stripMargin),
      doc = "reference datacleaning.py:16-47 isna().sum() audit"),

    // ---- P18 + P16: sentinel → null → mean imputation -------------------
    GQuery("q21_impute_mean",
      (s, d) => {
        val c = Tables.customer(s, d).select("c_custkey", "c_acctbal")
        // sentinel: negative balances are treated as missing (P18 shape)
        val nulled = c.withColumn("c_acctbal",
          when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
        CleaningOps.fillWithMean(nulled, "c_acctbal")
          .select(col("c_custkey"), round(col("c_acctbal"), 4).as("bal_filled"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
             |  round(coalesce(
             |    CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END,
             |    (SELECT avg(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END)
             |     FROM customer)), 4) AS bal_filled
             |FROM customer ORDER BY c_custkey""".stripMargin),
      doc = "reference bgrfunctions.py:110-111 mean fill; datacleaning.py:77-78 sentinel"),

    // ---- P15 + P17: constant fill & mode fill ---------------------------
    GQuery("q22_fill_const_mode",
      (s, d) => {
        val o = Tables.orders(s, d).select("o_orderkey", "o_orderstatus",
          "o_orderpriority")
        // sentinel: status 'P' treated as missing → constant; priority of
        // '3-MEDIUM' treated as missing → mode of the rest
        val nulled = o
          .withColumn("o_orderstatus",
            when(col("o_orderstatus") === "P", lit(null))
              .otherwise(col("o_orderstatus")))
          .withColumn("o_orderpriority",
            when(col("o_orderpriority") === "3-MEDIUM", lit(null))
              .otherwise(col("o_orderpriority")))
        val constFilled = nulled.na.fill(Map("o_orderstatus" -> "NO_STATUS"))
        CleaningOps.fillWithMode(constFilled, "o_orderpriority")
          .orderBy("o_orderkey")
      },
      Some("""WITH nulled AS (
             |  SELECT o_orderkey,
             |    CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS o_orderstatus,
             |    CASE WHEN o_orderpriority = '3-MEDIUM' THEN NULL ELSE o_orderpriority END AS o_orderpriority
             |  FROM orders),
             |m AS (SELECT o_orderpriority AS mode_val FROM nulled
             |      WHERE o_orderpriority IS NOT NULL
             |      GROUP BY 1 ORDER BY count(*) DESC, o_orderpriority LIMIT 1)
             |SELECT o_orderkey,
             |  coalesce(o_orderstatus, 'NO_STATUS') AS o_orderstatus,
             |  coalesce(o_orderpriority, (SELECT mode_val FROM m)) AS o_orderpriority
             |FROM nulled ORDER BY o_orderkey""".stripMargin),
      doc = "reference bgrfunctions.py:107 'No family' const fill; :114-124 mode fill"),

    // ---- P14 drop rows with nulls ---------------------------------------
    GQuery("q23_dropna",
      (s, d) => {
        val e = Tables.events(s, d)
          .withColumn("value",
            when(col("value") > 400, lit(null)).otherwise(col("value")))
        e.na.drop(Seq("value"))
          .agg(count(lit(1)).as("n_rows"),
            sum(round(col("value") * 100, 0).cast("long")).as("sum_value_cents"))
      },
      Some("""SELECT count(*) AS n_rows,
             |  CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS sum_value_cents
             |FROM (SELECT CASE WHEN value > 400 THEN NULL ELSE value END AS value
             |      FROM events) WHERE value IS NOT NULL""".stripMargin),
      doc = "reference datacleaning.py:17 dropna()"),

    // ---- P19 zero-variance / stddev audit -------------------------------
    GQuery("q24_stddev_audit",
      (s, d) => {
        val audit = CleaningOps.stddevAudit(Tables.part(s, d),
          Seq("p_size", "p_retailprice"))
        audit.select(
          round(col("p_size_std"), 4).as("p_size_std"),
          round(col("p_retailprice_std"), 4).as("p_retailprice_std"))
      },
      Some("""SELECT round(stddev_samp(p_size), 4) AS p_size_std,
             |  round(stddev_samp(p_retailprice), 4) AS p_retailprice_std
             |FROM part""".stripMargin),
      doc = "reference bgrfunctions.py:133-138 zero-variance prune (std per column, one scan)"),

    // ---- P20 wide binary flags → categorical string ---------------------
    GQuery("q25_binary_to_categorical",
      (s, d) => CleaningOps.binaryToCategorical(
          Tables.part(s, d),
          Seq(
            "large"  -> (col("p_size") > 25),
            "pricey" -> (col("p_retailprice") > 950),
            "steel"  -> col("p_type").contains("STEEL")),
          "tags")
        .select("p_partkey", "tags")
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, concat_ws(', ',
             |  CASE WHEN p_size > 25 THEN 'large' END,
             |  CASE WHEN p_retailprice > 950 THEN 'pricey' END,
             |  CASE WHEN p_type LIKE '%STEEL%' THEN 'steel' END) AS tags
             |FROM part ORDER BY p_partkey""".stripMargin),
      doc = "reference bgrfunctions.py:35-40 binary_to_categorical — row-local concat_ws, no unpivot shuffle"),

    // ---- A6+P7 IQR outlier removal end-to-end ---------------------------
    GQuery("q26_iqr_outliers",
      (s, d) => graft.ops.RelationalOps.removeOutliersIqr(
          Tables.customer(s, d).select("c_custkey", "c_acctbal"),
          Seq("c_acctbal"))
        .select(col("c_custkey"), round(col("c_acctbal"), 2).as("c_acctbal"))
        .orderBy("c_custkey"),
      Some("""WITH q AS (SELECT quantile_cont(c_acctbal, 0.25) AS q1,
             |                  quantile_cont(c_acctbal, 0.75) AS q3
             |           FROM customer)
             |SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal
             |FROM customer, q
             |WHERE CASE WHEN q3 = q1
             |  THEN c_acctbal >= q1 - (q3 - q1) AND c_acctbal <= q3 + (q3 - q1)
             |  ELSE c_acctbal > q1 - (q3 - q1) AND c_acctbal < q3 + (q3 - q1) END
             |ORDER BY c_custkey""".stripMargin),
      doc = "reference bgrfunctions.py:369-393 remove_outliers on a real column"),

    // ---- the whole cleaning tier as ONE lineage -------------------------
    GQuery("q57_clean_pipeline",
      (s, d) => {
        // the reference runs this as four processes with CSV handoffs
        // (SURVEY §3.2 phases A–D, datacleaning.py); here it is one
        // declarative lineage: sentinel→null ×2, mode fill, mean fill,
        // positive-value filter, IQR outlier fences, discretize, flags→
        // categorical — Catalyst sees every step and the table streams
        // once per aggregate it feeds
        val p0 = Tables.part(s, d)
          .select("p_partkey", "p_size", "p_retailprice", "p_brand", "p_type")
        val p1 = CleaningOps.sentinelToNull(p0, "p_brand", lit("Brand#4"))
        val p2 = CleaningOps.fillWithMode(p1, "p_brand")
        val p3 = p2.withColumn("p_size",
          when(col("p_size") > 45, lit(null)).otherwise(col("p_size")))
        val p4 = CleaningOps.fillWithMean(p3, "p_size")
        val p5 = p4.filter(col("p_retailprice") > 0)
        val p6 = graft.ops.RelationalOps.removeOutliersIqr(p5,
          Seq("p_retailprice"))
        val p7 = graft.ops.RelationalOps.discretize(p6, "p_retailprice",
          1000.0, "pricey_bucket")
        CleaningOps.binaryToCategorical(p7,
          Seq("big" -> (col("p_size") >= 30),
            "steel" -> col("p_type").contains("STEEL")), "tags")
          .select(col("p_partkey"), round(col("p_size"), 4).as("p_size_f"),
            round(col("p_retailprice"), 2).as("price"),
            col("p_brand"), col("pricey_bucket"), col("tags"))
          .orderBy("p_partkey")
      },
      Some("""WITH p1 AS (
             |  SELECT p_partkey, p_size, p_retailprice, p_type,
             |    CASE WHEN part.p_brand = 'Brand#4' THEN NULL
             |         ELSE part.p_brand END AS p_brand
             |  FROM part),
             |md AS (SELECT p_brand AS mode_val FROM p1
             |       WHERE p_brand IS NOT NULL
             |       GROUP BY 1 ORDER BY count(*) DESC, p_brand LIMIT 1),
             |p2 AS (SELECT p_partkey,
             |         CASE WHEN p1.p_size > 45 THEN NULL ELSE p1.p_size END AS p_size,
             |         p_retailprice, p_type,
             |         coalesce(p1.p_brand, (SELECT mode_val FROM md)) AS p_brand
             |       FROM p1),
             |mn AS (SELECT avg(p_size) AS mean_size FROM p2),
             |p4 AS (SELECT p_partkey,
             |         coalesce(CAST(p2.p_size AS DOUBLE), (SELECT mean_size FROM mn)) AS p_size,
             |         p_retailprice, p_type, p_brand
             |       FROM p2),
             |p5 AS (SELECT * FROM p4 WHERE p_retailprice > 0),
             |q AS (SELECT quantile_cont(p_retailprice, 0.25) AS q1,
             |             quantile_cont(p_retailprice, 0.75) AS q3 FROM p5),
             |p6 AS (SELECT p5.* FROM p5, q
             |       WHERE CASE WHEN q3 = q1
             |         THEN p_retailprice >= q1 - (q3 - q1) AND p_retailprice <= q3 + (q3 - q1)
             |         ELSE p_retailprice > q1 - (q3 - q1) AND p_retailprice < q3 + (q3 - q1) END)
             |SELECT p_partkey, round(p_size, 4) AS p_size_f,
             |  round(p_retailprice, 2) AS price, p_brand,
             |  CAST(CASE WHEN p_retailprice < 1000 THEN 0.0 ELSE 1.0 END
             |    AS DOUBLE) AS pricey_bucket,
             |  concat_ws(', ',
             |    CASE WHEN p_size >= 30 THEN 'big' END,
             |    CASE WHEN p_type LIKE '%STEEL%' THEN 'steel' END) AS tags
             |FROM p6 ORDER BY p_partkey""".stripMargin),
      doc = "the reference's clean_complete_database pipeline (bgrfunctions.py:79-140, four processes + CSV handoffs) as ONE declarative lineage")
  )
}
