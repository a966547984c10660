package graft

import org.apache.spark.sql.functions._
import graft.ml.{Classifiers, FeaturePipeline, Recsys}

/** ML-layer queries (SURVEY.md §2.9). Vector-typed / model outputs are not
  * SQL-expressible, so these carry no oracle (the contract's rows-only
  * check, `SparkEntry.scala:10-11`); exact-metric coverage lives in the
  * ScalaTest suite. Inputs are derived deterministically from the
  * fixtures; all seeds pinned.
  */
object MlQueries {

  /** Labeled frame for the classifier family: predict whether a line ships
    * a large quantity from price-ish numerics — the reference's
    * "discretize then classify" shape (`bgrfunctions.py:22-24` + fmclas).
    * Bounded sample so the bench measures the engine, not grid-search
    * hours (the reference's own runs took 1–5 h per model, BASELINE.md). */
  private def labeled(s: org.apache.spark.sql.SparkSession, d: String) = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"))
    val p = Tables.part(s, d).select(col("p_partkey"), col("p_retailprice"),
      col("p_size"))
    // part scales with SF — leave the join strategy to AQE stats
    val df = li.join(p, li("l_partkey") === p("p_partkey"))
      .withColumn("buckets", when(col("l_quantity") < 25, 0.0).otherwise(1.0))
    // (l_orderkey, l_linenumber) is a unique key → the sample under the
    // limit is fully deterministic (TakeOrderedAndProject, no tie
    // ambiguity), unlike an orderBy over non-unique columns
    val bounded = df.orderBy("l_orderkey", "l_linenumber").limit(50000)
    FeaturePipeline.assembleAndScale(bounded,
      Seq("l_extendedprice", "l_discount", "l_tax", "p_retailprice", "p_size"))
  }

  val all: Seq[GQuery] = Seq(

    // ---- M7+M8: ALS + top-k recommendations (flagship) ------------------
    GQuery("qml50_als_topk",
      (s, d) => {
        val fit = Recsys.fitAls(Tables.ratings(s, d), "user_id", "item_id",
          "rating", rank = 8, regParam = 0.1, maxIter = 5)
        // J3 presentation join (reference als.py:48-49: attach the game
        // Name to each recommendation): item dim broadcast
        val names = Tables.part(s, d)
          .select(col("p_partkey").as("item_id"), col("p_name").as("item_name"))
        Recsys.recommendTopK(fit.model, k = 5)
          .join(broadcast(names), Seq("item_id"), "left")
          .select("user_id", "rank", "item_id", "item_name", "score")
          .orderBy("user_id", "rank")
      },
      None,
      doc = "reference als.py end-to-end: ALS fit + recommendForAllUsers + explode/round + J3 name-dim join (als.py:48-49)"),

    // ---- M1–M6 feature pipeline -----------------------------------------
    GQuery("qml51_feature_pipeline",
      (s, d) => {
        val c = Tables.customer(s, d)
        val indexed = FeaturePipeline.indexAndOneHot(c, Seq("c_mktsegment"))
        val scaled = FeaturePipeline.assembleAndScale(indexed,
          Seq("c_acctbal", "c_nationkey"))
        scaled.select(col("c_custkey"), col("c_mktsegment_idx"),
            col("c_mktsegment_vec").cast("string").as("onehot"),
            col("scaled_features").cast("string").as("scaled"))
          .orderBy("c_custkey")
      },
      None,
      doc = "StringIndexer→OneHotEncoder→VectorAssembler→MinMaxScaler (reference fmreg.py:20-37)"),

    // ---- M5 PCA over embeddings -----------------------------------------
    GQuery("qml52_pca",
      (s, d) => {
        val e = Tables.embeddings(s, d).withColumn("features",
          org.apache.spark.ml.functions.array_to_vector(
            col("embedding").cast("array<double>")))
        FeaturePipeline.pca(e, "features", "pca_features", k = 8)
          .select(col("vec_id"), col("pca_features").cast("string").as("pca"))
          .orderBy("vec_id")
      },
      None,
      doc = "PCA k=8 over the embedding column (reference bgrfunctions.py:172-177, k=15)"),

    // ---- M5 PCA explained variance (k-selection diagnostic) -------------
    GQuery("qml57_pca_variance",
      (s, d) => {
        val spark = s
        import spark.implicits._
        // the reference picks k from the cumulative explained-variance
        // curve (data_cleaning.py:122 prints the cumsum; PDF §2.2.3:
        // "15 PCs retain >90% variance")
        val e = Tables.embeddings(s, d).withColumn("features",
          org.apache.spark.ml.functions.array_to_vector(
            col("embedding").cast("array<double>")))
        val model = new org.apache.spark.ml.feature.PCA()
          .setInputCol("features").setOutputCol("pca").setK(16).fit(e)
        val ev = model.explainedVariance.toArray
        ev.zipWithIndex.map { case (v, i) =>
          (i + 1, math.rint(v * 1e6) / 1e6,
            math.rint(ev.take(i + 1).sum * 1e6) / 1e6)
        }.toSeq.toDF("component", "explained_var", "cum_var")
          .orderBy("component")
      },
      None, // eigen-decomposition is not SQL-expressible → rows-only
      doc = "M5 diagnostic: per-component explained variance + cumsum, the k-selection curve (reference data_cleaning.py:122, PDF §2.2.3)"),

    // ---- M9–M13 classifier family metrics -------------------------------
    GQuery("qml53_classifiers",
      (s, d) => {
        val spark = s
        import spark.implicits._
        // persist once: four TVS grid harnesses otherwise re-run the
        // join + assemble + scaler-fit lineage for every grid point
        // (the reference's own missing-cache problem, SURVEY §4.1)
        val df = labeled(s, d)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // the harnesses evaluate eagerly (metrics are driver values), so
        // the input can unpersist as soon as the Seq is built
        val out = Seq(
          Classifiers.logistic(df, "scaled_features", "buckets"),
          Classifiers.decisionTree(df, "scaled_features", "buckets"),
          Classifiers.randomForest(df, "scaled_features", "buckets", numTrees = 10),
          Classifiers.fmClassification(df, "scaled_features", "buckets",
            maxIter = 10)
        ).toDF().orderBy("model")
        df.unpersist()
        out
      },
      None,
      doc = "LR / DT / RF / FMClassifier through the TrainValidationSplit grid harness (reference bgrfunctions.py:238-366)"),

    // ---- M9 FM regression -----------------------------------------------
    GQuery("qml54_fmreg",
      (s, d) => {
        val spark = s
        import spark.implicits._
        val df = labeled(s, d)
        Seq(Classifiers.fmRegression(df, "scaled_features", "l_quantity",
          maxIter = 10)).toDF()
      },
      None,
      doc = "FMRegressor through TVS grid (reference bgrfunctions.py:204-236)"),

    // ---- M7+M14: ALS through the TrainValidationSplit grid --------------
    GQuery("qml58_als_grid",
      (s, d) => {
        val spark = s
        import spark.implicits._
        // the reference's flagship tuning loop (bgrfunctions.py:179-201):
        // rank × regParam through TVS, trainRatio 0.8, RMSE-selected.
        // qml50 stays single-point. Bounded sample (same deterministic
        // unique-key orderBy+limit as the classifier harness): the grid
        // fits 5 ALS models — the bench measures the harness, not 5×
        // full-corpus factorizations.
        val bounded = Tables.ratings(s, d)
          .orderBy("user_id", "item_id").limit(100000)
        val r = Recsys.fitAlsGrid(bounded, "user_id", "item_id",
          "rating", ranks = Seq(8, 12), regParams = Seq(0.1, 0.01),
          maxIter = 5)
        Seq((r.bestRank, r.bestRegParam,
          math.rint(r.rmse * 1e4) / 1e4, math.rint(r.r2 * 1e4) / 1e4))
          .toDF("best_rank", "best_reg_param", "rmse", "r2")
      },
      None,
      doc = "ALS tuned via TrainValidationSplit over rank × regParam (reference bgrfunctions.py:179-201); returns the winning params + held-out RMSE/R²"),

    // ---- M1+M2 at design-matrix cardinality ------------------------------
    GQuery("qml59_high_card_onehot",
      (s, d) => {
        val spark = s
        import spark.implicits._
        // the reference's defining design matrix one-hots the two ID
        // columns themselves (fmreg.py:21-24 — 411k users + 349k items =
        // width 760,549 at full scale, risultati.txt:42). Same shape here:
        // index+encode the derived user/item ids (thousands of categories
        // at sf0.1), verify width == category count two independent ways —
        // sparse metadata (head vector) and a full-data max-index scan.
        val ids = Tables.ratings(s, d)
          .select(col("user_id").cast("string").as("user_id"),
            col("item_id").cast("string").as("item_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val enc = FeaturePipeline.indexAndOneHot(ids,
          Seq("user_id", "item_id"), dropLast = false)
        val stats = enc.agg(
          countDistinct("user_id").as("u_n"),
          countDistinct("item_id").as("i_n"),
          (max("user_id_idx") + 1).as("u_max"),
          (max("item_id_idx") + 1).as("i_max"))
          .as[(Long, Long, Double, Double)].head()
        val h = enc.select("user_id_vec", "item_id_vec").head()
        val widths = (
          h.getAs[org.apache.spark.ml.linalg.Vector](0).size.toLong,
          h.getAs[org.apache.spark.ml.linalg.Vector](1).size.toLong)
        ids.unpersist()
        Seq(
          ("user_id", stats._1, stats._3.toLong, widths._1,
            stats._1 == widths._1 && stats._3.toLong == widths._1),
          ("item_id", stats._2, stats._4.toLong, widths._2,
            stats._2 == widths._2 && stats._4.toLong == widths._2))
          .toDF("id_col", "n_categories", "max_index_plus_1", "onehot_width",
            "width_matches")
          .orderBy("id_col")
      },
      None,
      doc = "high-cardinality OneHotEncoder over the raw user/item ids — the reference's sparse design-matrix shape (fmreg.py:21-24, width 760,549 at full scale); onehot width must equal the distinct-id count"),

    // ---- M5 PCA loadings matrix ------------------------------------------
    GQuery("qml60_pca_loadings",
      (s, d) => {
        val spark = s
        import spark.implicits._
        // the reference prints the component loadings themselves
        // (functions.py:209-215, model.pc): emit the full k × dims matrix
        val e = Tables.embeddings(s, d).withColumn("features",
          org.apache.spark.ml.functions.array_to_vector(
            col("embedding").cast("array<double>")))
        val model = new org.apache.spark.ml.feature.PCA()
          .setInputCol("features").setOutputCol("pca").setK(8).fit(e)
        val pc = model.pc // dims × k, column-major
        (for (j <- 0 until pc.numCols; i <- 0 until pc.numRows) yield
          (j + 1, i, math.rint(pc(i, j) * 1e6) / 1e6))
          .toDF("component", "dim", "loading")
          .orderBy("component", "dim")
      },
      None, // eigen-decomposition is not SQL-expressible → rows-only
      doc = "M5: the PCA loadings matrix as (component, dim, loading) rows (reference functions.py:209-215 prints model.pc); rows = k × dims"),

    // ---- IVF ANN (centroid-partitioned scale path) ----------------------
    GQuery("qml56_knn_ivf",
      (s, d) => graft.ext.Similarity.ivfTopK(Tables.embeddings(s, d),
          "vec_id", "embedding", queryPred = col("vec_id") < 20,
          nLists = 16, nProbe = 4, k = 5)
        .select("query_id", "neighbor_id", "score", "rank")
        .orderBy("query_id", "rank"),
      None, // KMeans quantizer is not SQL-expressible → rows-only
      doc = "IVF ANN: seeded KMeans coarse quantizer, nProbe nearest cells per query, exact cosine inside cells"),

    // ---- S5 model persistence: save → load → identical predictions ------
    GQuery("qml55_model_io",
      (s, d) => {
        val spark = s
        import spark.implicits._
        val df = labeled(s, d).persist()
        val (fitted, reloaded) = Classifiers.saveLoadRoundtrip(df,
          "scaled_features", "buckets",
          Staging.dir("model", d))
        // prediction parity between the in-memory and reloaded model:
        // every row must agree (n_diff = 0)
        val a = fitted.transform(df)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("prediction").as("p1"))
        val b = reloaded.transform(df)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("prediction").as("p2"))
        val joined = a.join(b, Seq("l_orderkey", "l_linenumber"))
        // materialize the 1-row comparison BEFORE unpersisting: the agg is
        // lazy, and Bench/Verify execute it only after this fn returns —
        // unpersisting first would recompute the whole labeled() lineage
        // once per transform branch
        val (nRows, nDiff) = joined.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("p1") =!= col("p2"), 1L).otherwise(0L)).as("n_diff"))
          .as[(Long, Long)].head()
        df.unpersist()
        Seq((nRows, nDiff)).toDF("n_rows", "n_diff")
      },
      None,
      doc = "S5 MLWritable save + load roundtrip (reference bgrfunctions.py:228,262,298,328,360); loaded model must predict identically")
  )
}
