package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spark analog of the reference's ml_datacube_bridge output-preprocessing
  * functions (ml_datacube_bridge/output_preprocessing_functions/
  * torch_vit_encoder_tools.py): reorder ViT patch embeddings back into their
  * spatial raster layout so they can re-enter a datacube.
  *
  * The reference works on dense tensors `(batch, num_patches, dim)` and
  * reshapes to `(batch, side, side, dim)`. In long format a "tensor" is a
  * table with one row per (sample, patch) carrying an `array<float>`
  * embedding, and the reshape is pure column arithmetic:
  * `py = patch div side`, `px = patch mod side` — map-side only, no shuffle
  * beyond the one validation window.
  *
  * Like the reference (torch_vit_encoder_tools.py:12-24) the patch count
  * must form a square raster; the check happens at execution time via
  * `raise_error`, the Spark analog of the reference's exception.
  */
object VitBridge {

  private def sideOrFail(patchCount: org.apache.spark.sql.Column) = {
    val side = sqrt(patchCount.cast("double"))
    when(side =!= floor(side), raise_error(concat(
      lit("VitBridge: cannot arrange "), patchCount.cast("string"),
      lit(" patches into an n*n raster; if the output includes a CLS " +
        "token, use featuremapWithCls instead"))))
      .otherwise(side).cast("int")
  }

  /** get_featuremap_without_cls (torch_vit_encoder_tools.py:36): patch i of
    * each sample becomes raster cell (py = i div side, px = i mod side). */
  def featuremapWithoutCls(df: DataFrame, sampleCols: Seq[String],
                           patchCol: String = "patch",
                           embCol: String = "embedding"): DataFrame = {
    val w = Window.partitionBy(sampleCols.map(col): _*)
    val side = sideOrFail(count(lit(1)).over(w))
    df.select((sampleCols.map(col)
      :+ (col(patchCol) / side).cast("int").as("py")
      :+ pmod(col(patchCol), side).cast("int").as("px")
      :+ col(embCol)): _*)
  }

  /** get_featuremap_with_cls (torch_vit_encoder_tools.py:45): drop the CLS
    * token at patch 0, then reindex the remaining patches into the raster. */
  def featuremapWithCls(df: DataFrame, sampleCols: Seq[String],
                        patchCol: String = "patch",
                        embCol: String = "embedding"): DataFrame =
    featuremapWithoutCls(
      df.filter(col(patchCol) > 0)
        .withColumn(patchCol, col(patchCol) - 1),
      sampleCols, patchCol, embCol)

  /** get_image_cls_embedding_prepended (torch_vit_encoder_tools.py:79): the
    * CLS embedding is the patch at index 0 — one embedding per sample. */
  def clsEmbedding(df: DataFrame, sampleCols: Seq[String],
                   patchCol: String = "patch",
                   embCol: String = "embedding"): DataFrame =
    df.filter(col(patchCol) === 0)
      .select((sampleCols.map(col) :+ col(embCol)): _*)

  /** get_featuremap_without_cls_multilevel (torch_vit_encoder_tools.py:56):
    * a stack of per-layer featuremaps — the layer column is just one more
    * sample key in long format. */
  def featuremapMultilevel(df: DataFrame, sampleCols: Seq[String],
                           layerCol: String = "layer",
                           patchCol: String = "patch",
                           embCol: String = "embedding"): DataFrame =
    featuremapWithoutCls(df, sampleCols :+ layerCol, patchCol, embCol)
}
