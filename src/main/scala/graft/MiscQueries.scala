package graft

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.{Matrix => MlMatrix}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.CleaningOps
import graft.sources.Sources

/** Inventory-closing queries: CSV roundtrip (S1/S2), seeded random row
  * pick (W5), Pearson correlation matrix (A9 matrix form), column-name
  * sanitization (P12).
  */
object MiscQueries {

  /** Explicit schema for the CSV roundtrip read-back (production S1 path:
    * one pass, no inference job). */
  private val RoundtripSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_mktsegment", StringType),
    StructField("c_acctbal", DoubleType)))

  val all: Seq[GQuery] = Seq(

    // ---- S1+S2 CSV sink → scan roundtrip --------------------------------
    GQuery("q42_csv_roundtrip",
      (s, d) => {
        val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_csv_" +
          d.replaceAll("[^A-Za-z0-9.]", "_")
        Sources.writeCsv(
          Tables.customer(s, d).select("c_custkey", "c_mktsegment",
            "c_acctbal"),
          tmp)
        Sources.csvWithSchema(s, tmp, RoundtripSchema)
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            sum(round(col("c_acctbal") * 100, 0).cast("long")).as("bal_cents"))
          .orderBy("c_mktsegment")
      },
      // the roundtrip is lossless (Double.toString shortest-roundtrip ↔
      // Spark CSV parse), so the oracle reads the parquet table directly
      Some("""SELECT c_mktsegment, count(*) AS n,
             |  CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS bal_cents
             |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "S2 coalesce(1) header CSV sink + S1 explicit-schema scan, lossless double roundtrip (reference datacleaning.py:26,30)"),

    // ---- W5 seeded random row pick --------------------------------------
    GQuery("q43_seeded_pick",
      (s, d) => Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"))
        .orderBy(expr("md5(concat(cast(c_custkey as string), 'seed42'))"),
          col("c_custkey"))
        .limit(1),
      Some("""SELECT c_custkey, c_name FROM customer
             |ORDER BY md5(concat(CAST(c_custkey AS VARCHAR), 'seed42')),
             |  c_custkey LIMIT 1""".stripMargin),
      doc = "W5 random-row pick (reference als.py:52) made reproducible: hash-ordered first row — a seeded shuffle both engines replay exactly"),

    // ---- A9 Pearson correlation matrix ----------------------------------
    GQuery("q44_corr_matrix",
      (s, d) => {
        val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val vecs = new VectorAssembler().setInputCols(cs.toArray)
          .setOutputCol("features")
          .transform(Tables.lineitem(s, d).select(cs.map(col): _*))
        // ml.stat.Correlation (reference functions.py:159): one distributed
        // Gramian pass; the 4×4 result is bounded driver data
        val m = org.apache.spark.ml.stat.Correlation.corr(vecs, "features")
          .head.getAs[MlMatrix](0)
        val rows = for { i <- cs.indices; j <- cs.indices } yield
          (cs(i), cs(j),
            BigDecimal(m(i, j)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
              .toDouble)
        s.createDataFrame(rows).toDF("col_a", "col_b", "corr_v")
          .orderBy("col_a", "col_b")
      },
      Some {
        val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        (for { a <- cs; b <- cs } yield
          s"SELECT '$a' AS col_a, '$b' AS col_b, round(corr($a, $b), 4) AS corr_v FROM lineitem")
          .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY col_a, col_b")
      },
      doc = "A9 matrix form via ml.stat.Correlation over an assembled vector; oracle = 16 pairwise corr() aggregates"),

    // ---- P12 column-name sanitization -----------------------------------
    GQuery("q45_sanitize_names",
      (s, d) => CleaningOps.sanitizeNames(
          Tables.customer(s, d)
            .select(col("c_custkey").as("c.custkey"),
              col("c_acctbal").as("c.acct.bal")))
        .select(col("ccustkey"), round(col("cacctbal"), 2).as("cacctbal"))
        .orderBy("ccustkey"),
      Some("""SELECT c_custkey AS ccustkey, round(c_acctbal, 2) AS cacctbal
             |FROM customer ORDER BY 1""".stripMargin),
      doc = "P12 name sanitize (reference functions.py:22-28 strips '.' for Spark compatibility)")
  )
}
