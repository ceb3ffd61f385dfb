package ai.onnxruntime;

/** COMPILE-ONLY STUB — see OrtEnvironment.java. */
public interface OnnxValue extends AutoCloseable {
  Object getValue() throws OrtException;

  @Override
  void close();
}
