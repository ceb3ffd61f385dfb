package ai.onnxruntime;

/** COMPILE-ONLY STUB — see OrtEnvironment.java. */
public abstract class OnnxTensorLike implements OnnxValue {
  OnnxTensorLike() {}
}
