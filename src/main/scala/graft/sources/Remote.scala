package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Remote resource access — the Spark-native analog of the reference's
  * remote STAC loading (utils/stac_utils.py:8 `_load_stac_from_remote`) and
  * model download + cache (utils/download_utils.py:14,59 with
  * utils/model_cache_utils.py). Where the reference carries per-scheme
  * client code (requests for http, boto3 for s3), Spark already ships a
  * unified filesystem abstraction — Hadoop `FileSystem` resolves `file://`,
  * `hdfs://`, `s3a://`, `abfs://`, ... from the cluster's Hadoop
  * configuration — so every graft reader that takes a path takes any such
  * URI, and credentials/endpoints are cluster configuration, not call-site
  * code. Bare paths resolve against the default filesystem, keeping local
  * use unchanged.
  */
object Remote {

  /** Read a whole small driver-side resource (catalog / STAC item JSON)
    * from any Hadoop-FS URI as UTF-8 text. */
  def readString(uri: String,
                 conf: Configuration = new Configuration()): String = {
    val path = new Path(uri)
    val in = path.getFileSystem(conf).open(path)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Fetch a resource (model weights) into a local cache exactly once —
    * the reference's checksum-keyed model cache (download_utils.py:59).
    * Keyed by md5 of the URI; repeat loads reuse the cached copy, and the
    * copy lands via a temp file + rename so a concurrent loader never
    * observes a half-written cache entry. Returns the local path. */
  def cacheToLocal(uri: String, cacheDir: String,
                   conf: Configuration = new Configuration()): String = {
    val src = new Path(uri)
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(uri.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val dst = new java.io.File(cacheDir, s"$key-${src.getName}")
    if (!dst.exists()) {
      val tmp = java.io.File.createTempFile(s".$key", ".tmp",
        { val d = new java.io.File(cacheDir); d.mkdirs(); d })
      src.getFileSystem(conf)
        .copyToLocalFile(false, src, new Path(tmp.getAbsolutePath), true)
      if (!tmp.renameTo(dst)) {
        tmp.delete()
        if (!dst.exists())
          throw new java.io.IOException(s"model cache: cannot place $dst")
      }
    }
    dst.getAbsolutePath
  }
}
