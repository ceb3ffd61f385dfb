package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The openEO ML process surface (SURVEY.md §2A), named like the reference's
  * process implementations so a process graph targeting the reference maps
  * 1:1 onto this object.
  */
object MlProcesses {

  /** mlm_class_random_forest (reference: init_models.py:17). */
  def mlmClassRandomForest(numTrees: Int = 100, maxVariables: String = "sqrt",
                           seed: Long = 42L, maxDepth: Int = 10): RfUntrained =
    RfClassModel.untrained(numTrees, maxVariables, seed, maxDepth = maxDepth)

  /** ml_fit (reference: ml_fit.py:8). */
  def mlFit(model: RfUntrained, training: DataFrame,
            featuresCol: String = "embedding",
            labelCol: String = "label"): RfClassModel =
    model.fit(training, featuresCol, labelCol)

  /** ml_predict (reference: ml_predict.py:7). */
  def mlPredict(model: RfClassModel, data: DataFrame,
                featuresCol: String = "embedding"): DataFrame =
    model.predict(data, featuresCol)

  /** ml_predict over a datacube — the reference's main predict surface
    * (cube → batches → cube, data_model.py:438,666). */
  def mlPredictCube(model: RfClassModel,
                    cube: graft.cube.DataCube): graft.cube.DataCube =
    model.predictCube(cube)

  /** save_ml_model (reference: save_ml_model.py:6). */
  def saveMlModel(model: RfClassModel, path: String): Unit = model.save(path)

  /** load_ml_model (reference: load_model.py:21). */
  def loadMlModel(spark: SparkSession, path: String): RfClassModel =
    RfClassModel.load(spark, path)

  /** load_stac_ml (reference: load_model.py:21-98): validate a STAC-MLM
    * item JSON, select mlm:input/mlm:output by index, and build the
    * batched external-execution model (non-MLlib frameworks). */
  def loadStacMl(uri: String, modelAsset: Option[String] = None,
                 inputIndex: Int = 0, outputIndex: Int = 0): ExternalModel =
    StacMlm.load(uri, modelAsset, inputIndex, outputIndex)
}
