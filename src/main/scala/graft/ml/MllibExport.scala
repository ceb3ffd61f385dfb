package graft.ml

import org.apache.spark.ml.classification.RandomForestClassificationModel
import org.apache.spark.sql.SparkSession

/** Export an MLlib [[RandomForestClassificationModel]] to the
  * `graft-sk-forest` JSON format (the A29 interop format), closing the
  * reference's save→score seam for MLlib-fitted forests: the reference's
  * terminal predict path is a pickled sklearn forest scored per chunk
  * (data_model/scikit_learn_model.py:53), and the exported JSON scores the
  * SAME way on any engine — [[SkForest]]'s zero-shuffle literal CASE chain
  * on the JVM, its generated SQL mirror in the oracle. This is what makes
  * MLlib SCORING gate-verifiable even though MLlib FITTING is not
  * SQL-replayable (SURVEY §6): fit once, export at save time, pin the
  * artifact, hash-gate every score against it (`ml_rf_score_pinned`).
  *
  * The tree walk uses MLlib's OWN persisted representation — `model.write
  * .save` then the `data/` parquet (treeID, nodeData{id, impurityStats,
  * leftChild, rightChild, split}) — not the in-memory `Node` graph, whose
  * `impurityStats` member is `private[ml]`. The on-disk node tables are
  * the stable public format every MLlib version can reload, and node ids
  * are contiguous preorder per tree, so they map 1:1 onto the JSON's
  * index-addressed node arrays.
  *
  * Semantics parity with MLlib `transform`:
  *  - split: `features(f) <= threshold` → left child — MLlib's
  *    `ContinuousSplit.shouldGoLeft` and sklearn/SkForest agree exactly;
  *  - leaf probabilities: `stats(c) / stats.sum` — the identical per-tree
  *    normalization `predictRaw` applies at score time, done ONCE here so
  *    the JSON doubles are the scoring literals (the A29 convention);
  *  - prediction: first-maximal argmax in both (MLlib `Vector.argmax`,
  *    SkForest's greatest + first-match CASE).
  * [[MllibExportSpec]] pins prediction parity between `model.transform`
  * and SkForest-on-export over a full corpus.
  *
  * `classes` holds the ORIGINAL class values (sklearn `classes_`): MLlib
  * class index i decodes through it, undoing ml_fit's +1 R-compat label
  * shift (class index 0 is then a phantom no leaf ever carries mass for —
  * it can never win a first-maximal argmax against probabilities that sum
  * to 1 over the real classes).
  */
object MllibExport {

  private def d(x: Double) = x.toString // round-trips bit-exactly

  /** Serialize `model` as graft-sk-forest JSON; `classes(i)` is the
    * original value MLlib class index `i` decodes to. Driver-side work is
    * model-sized (the node tables), never data-sized. */
  def toSkForestJson(spark: SparkSession,
                     model: RandomForestClassificationModel,
                     classes: Seq[Double]): String = {
    require(classes.size == model.numClasses,
      s"export: ${classes.size} class values for ${model.numClasses} classes")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_mllib_export_").toString
    model.write.overwrite().save(tmp)
    val rows = spark.read.parquet(s"$tmp/data")
      .select("treeID", "nodeData.id", "nodeData.impurityStats",
        "nodeData.leftChild", "nodeData.rightChild",
        "nodeData.split.featureIndex",
        "nodeData.split.leftCategoriesOrThreshold",
        "nodeData.split.numCategories")
      .collect()
    val trees = rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map {
      case (_, nodes) =>
        val byId = nodes.sortBy(_.getInt(1))
        require(byId.zipWithIndex.forall { case (r, i) => r.getInt(1) == i },
          "export: MLlib node ids are not contiguous 0..n-1 within a tree")
        byId.map { r =>
          val (l, rr) = (r.getInt(3), r.getInt(4))
          if (l < 0) {
            val stats = r.getSeq[Double](2)
            val tot = stats.sum
            require(tot > 0, "export: leaf with zero impurityStats total")
            require(stats.size == classes.size,
              s"export: leaf stats width ${stats.size} != ${classes.size}")
            s"""{"l":-1,"r":-1,"p":[${stats.map(s => d(s / tot)).mkString(",")}]}"""
          } else {
            require(r.getInt(7) == -1,
              "export: categorical splits are not representable in " +
                "graft-sk-forest (continuous features only)")
            val t = r.getSeq[Double](6).head
            s"""{"l":$l,"r":$rr,"f":${r.getInt(5)},"t":${d(t)}}"""
          }
        }.mkString("""{"nodes":[""", ",", "]}")
    }
    s"""{"framework":"graft-sk-forest","n_features":${model.numFeatures},""" +
      s""""classes":[${classes.map(d).mkString(",")}],""" +
      s""""trees":[${trees.mkString(",")}]}"""
  }

  /** The pinned-forest fixture recipe (regenerates
    * src/main/resources/graft/mllib_rf.json): ml_fit's canonicalized
    * deterministic path ([[RfUntrained.fit]] — partition-invariant, so the
    * artifact is bitwise reproducible on any layout) over the D58 quality
    * features at the given sf dir, then export. Usage:
    * tools/run_local.sh graft.ml.MllibExport [sfDir] [outPath]. */
  def fitPinned(spark: SparkSession, sfDir: String): RfClassModel = {
    import org.apache.spark.sql.functions._
    val feats = RidgeProbe
      .qualityFeatures(graft.core.Tables.documents(spark, sfDir))
      .select(array(col("x1"), col("x2"), col("x3")).as("feats"), col("y"))
    RfClassModel
      .untrained(numTrees = 8, maxVariables = "sqrt", seed = 42L,
        name = "graft-rf-pinned", maxDepth = 4)
      .fit(feats, featuresCol = "feats", labelCol = "y")
  }

  def fitAndExport(spark: SparkSession, sfDir: String): String = {
    val m = fitPinned(spark, sfDir).model.get
    // decode = mlIndex - 1 (the +1 R-compat shift ml_fit applies)
    toSkForestJson(spark, m, (0 until m.numClasses).map(_ - 1.0))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outPath = args.lift(1)
      .getOrElse("src/main/resources/graft/mllib_rf.json")
    val spark = SparkSession.builder()
      .appName("graft-mllib-export").master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val json = fitAndExport(spark, sfDir)
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        json.getBytes("UTF-8"))
      System.err.println(s"[export] wrote $outPath (${json.length} bytes)")
    } finally spark.stop()
  }
}
