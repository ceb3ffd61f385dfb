package graft.ml

import com.fasterxml.jackson.databind.ObjectMapper

import scala.jdk.CollectionConverters._

/** One dense layer of an executable `graft-mlp` model: `out = act(W·x + b)`
  * with `w(j)` the weight row of output neuron `j`.
  */
final case class MlpLayer(w: Array[Array[Double]], b: Array[Double],
                          activation: String) {
  def inWidth: Int = if (w.isEmpty) 0 else w(0).length
  def outWidth: Int = w.length
}

/** The `graft-mlp` weight format: a REAL, executable model artifact for
  * `load_stac_ml`, filling the seam the reference fills with downloaded
  * PyTorch/ONNX weights (data_model/torch_model.py:10,
  * model_execution/run_pytorch_model.py:52). This container ships no ONNX
  * or Torch runtime, but nothing about "execute the weights an asset points
  * to" requires one: a feed-forward network is a few matmuls, which the JVM
  * does natively. The artifact is JSON —
  *
  * {{{
  * {"layers": [{"w": [[...], ...], "b": [...], "activation": "relu"}, ...]}
  * }}}
  *
  * — fetched from the STAC-MLM item's `mlm:model` asset href through the
  * same Hadoop-FS resolution as every other graft resource (file://, s3a://,
  * hdfs://, ...), so model distribution is cluster configuration, not code.
  *
  * Numeric contract (the cross-engine rule used across graft, see
  * graft.core.Exact): each neuron accumulates `Σ_i double(x_i)·w_ji` in
  * DOUBLE, left-to-right in input order, adds the bias last, applies the
  * activation in double, and narrows the result to float32 — so a DuckDB
  * oracle carrying the same weight literals reproduces the bits exactly.
  */
object MlpWeights {

  val ArtifactType = "graft-mlp-json"

  def parse(json: String): Seq[MlpLayer] = {
    val root = new ObjectMapper().readTree(json)
    val layers = root.path("layers")
    require(layers.isArray && layers.size() > 0,
      "graft-mlp: weights JSON has no 'layers' array")
    layers.elements().asScala.map { l =>
      val w = l.path("w").elements().asScala
        .map(row => row.elements().asScala.map(_.asDouble()).toArray)
        .toArray
      val b = l.path("b").elements().asScala.map(_.asDouble()).toArray
      val act = l.path("activation").asText("identity")
      require(w.nonEmpty && w(0).length > 0 &&
          w.forall(_.length == w(0).length),
        "graft-mlp: ragged or empty weight matrix")
      require(b.length == w.length,
        s"graft-mlp: bias width ${b.length} != ${w.length} output neurons")
      require(Set("identity", "relu", "sigmoid", "tanh").contains(act),
        s"graft-mlp: unknown activation '$act'")
      MlpLayer(w, b, act)
    }.toSeq
  }

  /** Load + validate weights for a model expecting `inWidth` features and
    * `outWidth` outputs (the STAC-MLM input/output shapes — dimension
    * mismatches fail at LOAD time on the driver, the reference's
    * `load_stac_ml` behavior, not mid-job on an executor). */
  def load(uri: String, inWidth: Int, outWidth: Int,
           conf: org.apache.hadoop.conf.Configuration =
             new org.apache.hadoop.conf.Configuration()): Seq[MlpLayer] = {
    val layers = parse(graft.sources.Remote.readString(uri, conf))
    require(layers.head.inWidth == inWidth,
      s"graft-mlp: first layer expects ${layers.head.inWidth} inputs but " +
        s"the item's mlm:input shape gives $inWidth features")
    require(layers.last.outWidth == outWidth,
      s"graft-mlp: last layer emits ${layers.last.outWidth} values but " +
        s"the item's mlm:output shape expects $outWidth")
    layers.sliding(2).foreach {
      case Seq(a, bl) => require(a.outWidth == bl.inWidth,
        s"graft-mlp: layer width mismatch ${a.outWidth} -> ${bl.inWidth}")
      case _ => ()
    }
    layers
  }
}

/** Executes a parsed `graft-mlp` network behind the [[TensorSession]]
  * contract — the same seam an ONNX `OrtSession` plugs into, but backed by
  * plain JVM math, so `load_stac_ml → ml_predict` runs REAL inference (the
  * asset's actual weights decide the output) in this container. The layer
  * arrays ride the closure to executors once (driver-side load, a few KB;
  * big artifacts would go through Remote.cacheToLocal on executors instead).
  */
final class MlpSession(layers: Seq[MlpLayer]) extends TensorSession {

  private def activate(v: Double, act: String): Double = act match {
    case "relu" => if (v > 0) v else 0.0
    case "sigmoid" => 1.0 / (1.0 + math.exp(-v))
    case "tanh" => math.tanh(v)
    case _ => v
  }

  override def run(inputName: String, flat: Array[Float],
                   shape: Array[Long], outputName: String): Array[Float] = {
    val n = shape(0).toInt
    val in = shape(1).toInt
    val outW = layers.last.outWidth
    val out = new Array[Float](n * outW)
    var r = 0
    while (r < n) {
      var x = new Array[Float](in)
      System.arraycopy(flat, r * in, x, 0, in)
      layers.foreach { l =>
        val y = new Array[Float](l.outWidth)
        var j = 0
        while (j < l.outWidth) {
          val wj = l.w(j)
          var acc = 0.0d
          var i = 0
          while (i < wj.length) { acc += x(i).toDouble * wj(i); i += 1 }
          y(j) = activate(acc + l.b(j), l.activation).toFloat
          j += 1
        }
        x = y
      }
      System.arraycopy(x, 0, out, r * outW, outW)
      r += 1
    }
    out
  }
}
