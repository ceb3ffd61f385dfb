package ai.onnxruntime;

/** COMPILE-ONLY STUB — see OrtEnvironment.java. */
public class OrtException extends Exception {
  public OrtException(String message) {
    super(message);
  }
}
