package ai.onnxruntime;

import java.util.Map;
import java.util.Optional;

/** COMPILE-ONLY STUB — see OrtEnvironment.java. */
public class OrtSession implements AutoCloseable {
  private OrtSession() {}

  public Result run(Map<String, ? extends OnnxTensorLike> inputs)
      throws OrtException {
    throw new UnsupportedOperationException("ort-stub is compile-only");
  }

  @Override
  public void close() {}

  /** COMPILE-ONLY STUB of OrtSession.Result. */
  public static class Result implements AutoCloseable {
    private Result() {}

    public Optional<OnnxValue> get(String key) {
      throw new UnsupportedOperationException("ort-stub is compile-only");
    }

    @Override
    public void close() {}
  }
}
