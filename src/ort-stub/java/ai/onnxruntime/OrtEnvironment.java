package ai.onnxruntime;

/**
 * COMPILE-ONLY STUB — never shipped, never executed. The zero-egress image
 * has no onnxruntime jar, so the optional ORT adapter
 * (src/ort/scala/graft/ml/OrtTensorSession.scala) would otherwise rot
 * uncompiled between rounds. `sbt ortcheck/compile` builds the adapter
 * against these API-shape declarations (mirroring the public
 * ai.onnxruntime Java API) instead of the real jar; a container that DOES
 * ship the jar uses GRAFT_WITH_ORT=1 and never sees this source set.
 */
public class OrtEnvironment implements AutoCloseable {
  private OrtEnvironment() {}

  public static OrtEnvironment getEnvironment() {
    throw new UnsupportedOperationException("ort-stub is compile-only");
  }

  public OrtSession createSession(String modelPath) throws OrtException {
    throw new UnsupportedOperationException("ort-stub is compile-only");
  }

  @Override
  public void close() {}
}
