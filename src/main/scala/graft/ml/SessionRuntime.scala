package graft.ml

/** The tensor-session seam a REAL inference runtime plugs into. The method
  * shape mirrors ONNX Runtime's `OrtSession.run` contract — one named
  * input tensor (row-major flat buffer + shape) in, one named output
  * tensor out — without depending on the (absent) onnxruntime jar. The
  * real adapter EXISTS as the optional `ort` source set
  * (src/ort/scala/graft/ml/OrtTensorSession.scala, enabled by
  * GRAFT_WITH_ORT=1 in build.sbt once a build ships the jar); the exact
  * call contract it must satisfy — one run per batch, row-major packing,
  * [rows, inWidth] shape, name passthrough — is pinned by MlpSpec's
  * TensorSession contract test against the in-container fake.
  *
  * Implementations ship to executors once and are reused across batches
  * (same lifecycle as the reference's per-worker session,
  * model_execution/run_pytorch_model.py:52).
  */
trait TensorSession extends Serializable {
  /** `flat` is row-major `[shape(0) × shape(1)]`; returns the output
    * buffer, row-major `[shape(0) × outWidth]`. */
  def run(inputName: String, flat: Array[Float], shape: Array[Long],
          outputName: String): Array[Float]
}

/** ModelRuntime over a [[TensorSession]]: packs each mapPartitions batch
  * into one row-major tensor, runs the session once per batch (batched
  * inference, not per-row), and unpacks the output rows. This is the
  * production path behind `load_stac_ml` → `ml_predict`; [[StubRuntime]]
  * only stands in where no runtime jar exists.
  */
final class SessionRuntime(session: TensorSession,
                           inWidth: Int, outWidth: Int,
                           inputName: String = "input",
                           outputName: String = "output") extends ModelRuntime {
  override def score(batch: Array[Array[Float]]): Array[Array[Float]] = {
    val n = batch.length
    if (n == 0) return Array.empty
    val flat = new Array[Float](n * inWidth)
    var r = 0
    while (r < n) {
      require(batch(r).length == inWidth,
        s"SessionRuntime: row $r has ${batch(r).length} features, " +
          s"expected $inWidth")
      System.arraycopy(batch(r), 0, flat, r * inWidth, inWidth)
      r += 1
    }
    val out = session.run(inputName, flat, Array(n.toLong, inWidth.toLong),
      outputName)
    require(out.length == n * outWidth,
      s"SessionRuntime: session returned ${out.length} values for " +
        s"$n×$outWidth output")
    Array.tabulate(n)(i =>
      java.util.Arrays.copyOfRange(out, i * outWidth, (i + 1) * outWidth))
  }
}
