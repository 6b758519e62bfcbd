package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained quality classification — the fastText-style model-based
  * selector the big open pre-training pipelines pair with rule-based
  * filters (GPT-3's LR-against-WebText filter, CCNet's fastText
  * perplexity buckets, LLaMA's Wikipedia-reference classifier):
  * hashed bag-of-tokens features into logistic regression, scores in
  * [0,1], keep-above-threshold.
  *
  * Spark-first shape, and why it holds at 100 TB:
  *  - featurization is `RegexTokenizer` + `HashingTF` — stateless,
  *    map-side, O(tokens) per doc, no vocabulary to build or ship;
  *  - training is spark.ml `LogisticRegression` (L-BFGS): each
  *    iteration is one map-side gradient pass + treeAggregate of a
  *    `numFeatures`-sized dense vector — the only thing ever
  *    driver-sized is the coefficient vector itself;
  *  - scoring is a broadcast of those coefficients and one map-side
  *    pass — the same shape as every other scoring operator here.
  *
  * The [[TextOps.gopherQuality]] rules and this model are
  * complementary: rules catch structural garbage with zero training
  * and full explainability; the model generalizes to the long tail
  * the rules miss, at the cost of needing labels.
  */
object QualityModelOps {

  /** Train a quality model on `(textCol, labelCol)` rows (label 1.0 =
    * keep-worthy, 0.0 = junk). Word unigrams + bigrams, hashed to
    * `numFeatures` buckets.
    */
  def trainQualityModel(labeled: DataFrame, textCol: String,
      labelCol: String, numFeatures: Int = 1 << 15,
      maxIter: Int = 30): org.apache.spark.ml.PipelineModel = {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.{HashingTF, NGram, RegexTokenizer,
      VectorAssembler}
    val tok = new RegexTokenizer().setInputCol(textCol)
      .setOutputCol("__words").setPattern("\\s+").setToLowercase(false)
    val uni = new HashingTF().setInputCol("__words")
      .setOutputCol("__f1").setNumFeatures(numFeatures)
    val big = new NGram().setN(2).setInputCol("__words")
      .setOutputCol("__bigrams")
    val bitf = new HashingTF().setInputCol("__bigrams")
      .setOutputCol("__f2").setNumFeatures(numFeatures)
    val asm = new VectorAssembler().setInputCols(Array("__f1", "__f2"))
      .setOutputCol("__features")
    val lr = new LogisticRegression().setFeaturesCol("__features")
      .setLabelCol(labelCol).setMaxIter(maxIter).setRegParam(1e-4)
      .setStandardization(false)
    new Pipeline().setStages(Array(tok, uni, big, bitf, asm, lr))
      .fit(labeled)
  }

  /** Score `df` with a trained model: adds `quality_score` in [0,1]
    * (probability of the keep class). Broadcast coefficients, one
    * map-side pass; the helper columns the pipeline adds are dropped.
    */
  def scoreQuality(df: DataFrame,
      model: org.apache.spark.ml.PipelineModel): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    model.transform(df)
      .withColumn("quality_score",
        round(element_at(vector_to_array(col("probability")), 2), 6))
      .drop("__words", "__bigrams", "__f1", "__f2", "__features",
        "rawPrediction", "probability", "prediction")
  }

  /** Train-and-filter in one call: keep rows scoring >= `threshold`. */
  def filterByQuality(corpus: DataFrame, labeled: DataFrame,
      textCol: String, labelCol: String,
      threshold: Double = 0.5): DataFrame = {
    val model = trainQualityModel(labeled, textCol, labelCol)
    scoreQuality(corpus, model).filter(col("quality_score") >= threshold)
  }
}
