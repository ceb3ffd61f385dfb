package graft.ml

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** One `mlm:input` entry: band list, tensor shape/dim order, per-band value
  * scaling (reference: data_model.py input spec). */
final case class MlmModelInput(
    name: String,
    bands: Seq[String],
    shape: Seq[Int],
    dimOrder: Seq[String],
    scaling: Seq[ValueScaling],
    /** `processing`-type value_scaling: a whitelisted sql expression over
      * `x` (the reference declares this type but raises NotImplemented —
      * scaling_utils.py:95; here it routes through ProcessExpression). */
    processing: Option[String] = None)

/** One `mlm:output` entry: result shape/dim order, plus the item's
  * `post_processing_function` (format, expression) — the reference runs
  * these around the model call (run_pytorch_model.py:40 postprocess). */
final case class MlmModelOutput(
    name: String,
    shape: Seq[Int],
    dimOrder: Seq[String],
    postProcessing: Option[(String, String)] = None)

/** A parsed STAC-MLM item — the metadata that drives model execution
  * (reference: load_model.py + data_model.py `MLModel`). */
final case class StacMlmItem(
    id: String,
    name: String,
    framework: String,
    batchSizeSuggestion: Option[Int],
    inputs: Seq[MlmModelInput],
    outputs: Seq[MlmModelOutput],
    weightsHref: Option[String],
    artifactType: Option[String])

/** STAC-MLM item loading — the Spark analog of the reference's
  * `load_stac_ml` (load_model.py:21-98): validate the JSON is a STAC Item,
  * check the MLM extension is declared, check the framework is supported,
  * select `mlm:input[input_index]` / `mlm:output[output_index]`, and hand
  * the result to a model-execution backend.
  *
  * Parsing uses Jackson (already on the Spark classpath) — item metadata is
  * a driver-side object of a few KB; no Spark job is involved until
  * prediction runs.
  */
object StacMlm {

  /** load_model.py:47 — the extension match is a version-tolerant regex. */
  private val MlmExtension =
    "^https://stac-extensions\\.github\\.io/mlm/v(\\d+\\.){0,2}\\d*/schema\\.json$".r

  /** Frameworks this backend can execute (reference:
    * AVAILABLE_ML_FRAMEWORKS, load_model.py:6). `spark-mllib` is the native
    * path (RfClassModel); `onnx`/`pytorch` route to the batched external
    * scorer (ExternalModel) whose session is stubbed in this container;
    * `graft-mlp` is the REAL executable path — the asset's weights are
    * fetched and run as JVM matmuls ([[MlpSession]]). */
  val supportedFrameworks: Set[String] =
    Set("spark-mllib", "onnx", "pytorch", "graft-mlp")

  /** load_stac_ml: read + validate an item JSON file and build the
    * external-execution model for it. Indices select among multiple
    * declared inputs/outputs (load_model.py:80-91). */
  def load(uri: String, modelAsset: Option[String] = None,
           inputIndex: Int = 0, outputIndex: Int = 0): ExternalModel = {
    val item = parseItem(graft.sources.Remote.readString(uri), modelAsset)
    require(supportedFrameworks.contains(item.framework.toLowerCase),
      s"load_stac_ml: framework '${item.framework}' is not supported by " +
        s"this backend; supported: ${supportedFrameworks.mkString(", ")}")
    require(inputIndex >= 0 && inputIndex < item.inputs.length,
      s"load_stac_ml: input_index=$inputIndex outside the " +
        s"${item.inputs.length} input specification(s) in the item")
    require(outputIndex >= 0 && outputIndex < item.outputs.length,
      s"load_stac_ml: output_index=$outputIndex outside the " +
        s"${item.outputs.length} output specification(s) in the item")
    require(item.weightsHref.nonEmpty,
      "load_stac_ml: the item has no asset with the mlm:model role")
    // A graft-mlp artifact is executable here and now: resolve the asset
    // href (relative hrefs resolve against the item's own location, the
    // STAC convention), load + dimension-check the weights on the driver,
    // and hand the batched scorer a real session instead of the stub.
    val runtime: Option[ModelRuntime] =
      if (item.artifactType.contains(MlpWeights.ArtifactType)) {
        val probe = new ExternalModel(item, inputIndex, outputIndex)
        val layers = MlpWeights.load(resolveHref(uri, item.weightsHref.get),
          probe.featureWidth, probe.outputWidth)
        Some(new SessionRuntime(new MlpSession(layers),
          probe.featureWidth, probe.outputWidth))
      } else None
    new ExternalModel(item, inputIndex, outputIndex, runtime)
  }

  /** Resolve a model-asset href against the item's own location — the
    * STAC convention the reference applies when it downloads the pickled
    * model (download_utils.py). An href that doesn't parse as a URI
    * (spaces, odd chars) is a relative path, not an error. */
  private def resolveHref(itemUri: String, href: String): String = {
    val isAbsolute = href.startsWith("/") ||
      (try new java.net.URI(href).isAbsolute
       catch { case _: java.net.URISyntaxException => false })
    if (isAbsolute) href
    else new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(itemUri).getParent, href).toString
  }

  /** load_stac_ml for a converted-sklearn item: the item's mlm:model
    * asset is a `graft-sk-forest` JSON (the output of
    * tools/convert_sklearn.py — the reference's pickled
    * RandomForestClassifier re-expressed as explicit node tables), fetched
    * through the same item→asset href resolution the reference's pickle
    * download takes (load_model.py:21 + scikit_learn_model.py:53) and
    * scored natively by [[SkForest]]. Returns the forest plus the item's
    * declared input bands (feature column names for scoring). */
  def loadSkForest(uri: String, modelAsset: Option[String] = None,
                   itemJson: Option[String] = None)
      : (SkForest.Forest, Seq[String]) = {
    // itemJson: the caller may already hold the fetched item (the graph's
    // framework sniff) — don't fetch and parse the same URI twice
    val item = parseItem(
      itemJson.getOrElse(graft.sources.Remote.readString(uri)), modelAsset)
    require(item.framework.equalsIgnoreCase(SkForest.Framework),
      s"load_stac_ml: expected an mlm:framework of ${SkForest.Framework}, " +
        s"got '${item.framework}'")
    require(item.weightsHref.nonEmpty,
      "load_stac_ml: the item has no asset with the mlm:model role")
    val forest = SkForest.fromJson(graft.sources.Remote.readString(
      resolveHref(uri, item.weightsHref.get)))
    (forest, item.inputs.head.bands)
  }

  /** Validate + parse an item JSON string into the metadata model.
    * Validation order mirrors load_model.py: STAC Item first, MLM
    * extension second — framework/index checks happen in [[load]]. */
  def parseItem(json: String, modelAsset: Option[String] = None): StacMlmItem = {
    val root = new ObjectMapper().readTree(json)
    require(root.path("type").asText() == "Feature",
      "load_stac_ml: the provided JSON is not a STAC Item (type != Feature)")
    val exts = root.path("stac_extensions").elements().asScala
      .map(_.asText()).toSeq
    require(exts.exists(e => MlmExtension.findFirstIn(e).isDefined),
      "load_stac_ml: the STAC Item does not declare the STAC:MLM extension")
    val props = root.path("properties")
    require(props.hasNonNull("mlm:name") && props.hasNonNull("mlm:framework"),
      "load_stac_ml: the STAC Item is missing required mlm:name/mlm:framework")

    val inputs = props.path("mlm:input").elements().asScala.map { in =>
      val entries = in.path("value_scaling").elements().asScala.toSeq
      val (procs, numeric) =
        entries.partition(_.path("type").asText() == "processing")
      require(procs.isEmpty || entries.length == 1,
        "load_stac_ml: a processing value_scaling must be the only entry")
      val processing = procs.headOption.map { p =>
        val fmt = p.path("format").asText("")
        if (fmt != "sql")
          throw new UnsupportedOperationException(
            s"load_stac_ml: processing value_scaling format '$fmt' not " +
              "implemented (only 'sql')")
        p.path("expression").asText()
      }
      MlmModelInput(
        name = in.path("name").asText(""),
        bands = in.path("bands").elements().asScala.map(_.asText()).toSeq,
        shape = in.path("input").path("shape").elements().asScala
          .map(_.asInt()).toSeq,
        dimOrder = in.path("input").path("dim_order").elements().asScala
          .map(_.asText()).toSeq,
        scaling = numeric.map(parseScaling),
        processing = processing)
    }.toSeq
    val outputs = props.path("mlm:output").elements().asScala.map { out =>
      val pp = out.path("post_processing_function")
      MlmModelOutput(
        name = out.path("name").asText(""),
        shape = out.path("result").path("shape").elements().asScala
          .map(_.asInt()).toSeq,
        dimOrder = out.path("result").path("dim_order").elements().asScala
          .map(_.asText()).toSeq,
        postProcessing =
          if (pp.isObject)
            Some((pp.path("format").asText(""), pp.path("expression").asText("")))
          else None)
    }.toSeq
    require(inputs.nonEmpty && outputs.nonEmpty,
      "load_stac_ml: the item declares no mlm:input or no mlm:output")

    // model asset: explicit key, else the asset carrying the mlm:model
    // role. Reference semantics (tests/test_datamodel.py
    // test_correct_asset_selection): a named asset must actually carry the
    // role, and multiple role-carrying assets without an explicit name are
    // AMBIGUOUS and rejected rather than silently picking one.
    val assets = root.path("assets")
    def hasModelRole(a: JsonNode): Boolean =
      a.path("roles").elements().asScala.exists(r =>
        r.asText() == "mlm:model" || r.asText() == "mlm:weights")
    val asset = modelAsset match {
      case Some(k) =>
        require(assets.has(k), s"load_stac_ml: no asset named '$k' in item")
        require(hasModelRole(assets.path(k)),
          s"load_stac_ml: asset '$k' does not carry the mlm:model role")
        Some(assets.path(k))
      case None =>
        val candidates = assets.fields().asScala
          .map(_.getValue).filter(hasModelRole).toSeq
        require(candidates.length <= 1,
          "load_stac_ml: multiple assets carry the mlm:model role — pass " +
            "model_asset to disambiguate")
        candidates.headOption
    }

    StacMlmItem(
      id = root.path("id").asText(""),
      name = props.path("mlm:name").asText(),
      framework = props.path("mlm:framework").asText(),
      batchSizeSuggestion =
        if (props.hasNonNull("mlm:batch_size_suggestion"))
          Some(props.path("mlm:batch_size_suggestion").asInt())
        else None,
      inputs = inputs,
      outputs = outputs,
      weightsHref = asset.map(_.path("href").asText("")).filter(_.nonEmpty),
      artifactType = asset.flatMap(a =>
        Option(a.path("mlm:artifact_type").asText(null))))
  }

  /** A `value_scaling` entry → the library's ValueScaling (reference:
    * scaling_utils.py kinds). */
  private def parseScaling(n: JsonNode): ValueScaling =
    n.path("type").asText() match {
      case "z-score" =>
        ValueScaling("z-score", n.path("mean").asDouble(),
          n.path("stddev").asDouble())
      case "min-max" =>
        ValueScaling("min-max", n.path("minimum").asDouble(),
          n.path("maximum").asDouble())
      case "scale"  => ValueScaling("scale", n.path("value").asDouble(), 0)
      case "offset" => ValueScaling("offset", n.path("value").asDouble(), 0)
      case "clip" =>
        ValueScaling("clip", n.path("minimum").asDouble(),
          n.path("maximum").asDouble())
      case "clip-min" =>
        ValueScaling("clip-min", n.path("minimum").asDouble(), 0)
      case "clip-max" =>
        ValueScaling("clip-max", n.path("maximum").asDouble(), 0)
      case other =>
        throw new IllegalArgumentException(
          s"load_stac_ml: unknown value_scaling type '$other'")
    }
}
