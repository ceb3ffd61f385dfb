package graft.ml

import ai.onnxruntime.{OnnxTensor, OrtEnvironment}

/** The REAL inference adapter behind the [[TensorSession]] seam — compiled
  * only when the build enables the optional `ort` source set (set
  * `GRAFT_WITH_ORT=1` with the onnxruntime jar on the unmanaged
  * classpath; see build.sbt). No other code changes: `load_stac_ml` hands
  * this session to the same [[SessionRuntime]] the `graft-mlp` JVM path
  * uses, and the batching/shape contract is pinned by MlpSpec's
  * TensorSession contract test against the in-container fake.
  *
  * Holds the model PATH, not the session: `OrtSession` is not
  * serializable, so the environment and session materialize lazily per
  * executor on first use (one session per executor, reused across
  * batches — the reference's per-worker session lifecycle,
  * model_execution/run_pytorch_model.py:52). Distribute the artifact with
  * graft.sources.Remote.cacheToLocal and pass the local path.
  */
final class OrtTensorSession(modelPath: String) extends TensorSession {

  @transient private lazy val env = OrtEnvironment.getEnvironment()
  @transient private lazy val session = env.createSession(modelPath)

  override def run(inputName: String, flat: Array[Float],
                   shape: Array[Long], outputName: String): Array[Float] = {
    val tensor =
      OnnxTensor.createTensor(env, java.nio.FloatBuffer.wrap(flat), shape)
    try {
      val out = session.run(java.util.Collections.singletonMap(inputName, tensor))
      try out.get(outputName).get().getValue
        .asInstanceOf[Array[Array[Float]]].flatten
      finally out.close()
    } finally tensor.close()
  }
}
