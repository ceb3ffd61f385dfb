package ai.onnxruntime;

import java.nio.FloatBuffer;

/** COMPILE-ONLY STUB — see OrtEnvironment.java. */
public class OnnxTensor extends OnnxTensorLike {
  private OnnxTensor() {}

  public static OnnxTensor createTensor(
      OrtEnvironment env, FloatBuffer data, long[] shape) throws OrtException {
    throw new UnsupportedOperationException("ort-stub is compile-only");
  }

  @Override
  public Object getValue() throws OrtException {
    throw new UnsupportedOperationException("ort-stub is compile-only");
  }

  @Override
  public void close() {}
}
