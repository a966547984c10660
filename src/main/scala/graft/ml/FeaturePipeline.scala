package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{MinMaxScaler, OneHotEncoder, PCA,
  StringIndexer, VectorAssembler}
import org.apache.spark.sql.DataFrame

/** The reference's feature pipeline (SURVEY.md §2.9 M1–M6), composed from
  * `org.apache.spark.ml`: StringIndexer (frequency-desc dictionary) →
  * OneHotEncoder (sparse) → VectorAssembler → MinMaxScaler → PCA.
  * Mirrors reference `PySpark Scripts/fmreg.py:20-39` /
  * `bgrfunctions.py:143-177`; all stages deterministic given fixed input.
  */
object FeaturePipeline {

  /** M1: index a string column by descending frequency (index 0 = most
    * frequent, reference PDF §3). */
  def indexString(df: DataFrame, in: String, out: String): DataFrame =
    new StringIndexer().setInputCol(in).setOutputCol(out)
      .setStringOrderType("frequencyDesc").setHandleInvalid("skip")
      .fit(df).transform(df)

  /** M1+M2: index + one-hot encode id columns to sparse vectors
    * (reference `fmreg.py:20-24`). `dropLast = false` keeps the encoded
    * width equal to the category count (the reference's design matrix is
    * exactly Σ distinct-id widths, `risultati.txt:42`); the default drops
    * the last category, the collinearity-safe regression convention. */
  def indexAndOneHot(df: DataFrame, cols: Seq[String],
                     dropLast: Boolean = true): DataFrame = {
    // ONE multi-column StringIndexer, not one indexer per column: the
    // fit is a single counting pass over the input covering every
    // column, where chained per-column stages each ran their own
    // full-data aggregation (Pipeline fits stages sequentially — k
    // columns cost k passes). Dictionaries are identical: frequencyDesc
    // ranks each column independently either way, and with no invalid
    // rows the fit data is the same frame. (With invalids, multi-col is
    // the more correct shape too — a chained indexer's skip would
    // silently shrink the NEXT column's fit data.)
    val indexer = new StringIndexer()
      .setInputCols(cols.toArray)
      .setOutputCols(cols.map(c => s"${c}_idx").toArray)
      .setStringOrderType("frequencyDesc").setHandleInvalid("skip")
    val ohe = new OneHotEncoder()
      .setInputCols(cols.map(c => s"${c}_idx").toArray)
      .setOutputCols(cols.map(c => s"${c}_vec").toArray)
      .setDropLast(dropLast)
    new Pipeline().setStages(Array(indexer, ohe)).fit(df).transform(df)
  }

  /** M3+M4: assemble numeric columns and scale to [0,1]
    * (reference `fmreg.py:32-37`). */
  def assembleAndScale(df: DataFrame, inputCols: Seq[String],
                       out: String = "scaled_features"): DataFrame = {
    val assembler = new VectorAssembler()
      .setInputCols(inputCols.toArray).setOutputCol("features_raw")
    val scaler = new MinMaxScaler()
      .setInputCol("features_raw").setOutputCol(out)
    new Pipeline().setStages(Array(assembler, scaler)).fit(df).transform(df)
  }

  /** M5: fitted PCA model (reference `bgrfunctions.py:172-177`, k=15 in
    * v2). Returned as the MODEL, not the projection, because every
    * oracle-checked consumer needs the fitted artifacts too: qml52 folds
    * `model.pc` into its in-plan reconstruction claim, qml57 reads
    * `explainedVariance`, qml60 emits the loadings' Gram matrix. */
  def pcaModel(df: DataFrame, in: String, out: String,
               k: Int): org.apache.spark.ml.feature.PCAModel =
    new PCA().setInputCol(in).setOutputCol(out).setK(k).fit(df)

  /** M5: PCA projection — [[pcaModel]] applied. */
  def pca(df: DataFrame, in: String, out: String, k: Int): DataFrame =
    pcaModel(df, in, out, k).transform(df)
}
