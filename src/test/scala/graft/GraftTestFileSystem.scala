package graft

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A local filesystem registered under the NON-file scheme
  * `graftfs://` — the test twin of an object-store connector (s3a,
  * gs, abfs). Everything in the engine that touches storage resolves
  * its FileSystem from the PATH (`Path.getFileSystem(conf)`), so
  * pointing the same code at `graftfs://...` proves no component
  * shortcuts to `java.io.File` or assumes the `file:` scheme —
  * the s3a-readiness claim as a contract test instead of an
  * assertion. Reference behavior being modeled:
  * /root/reference/src/helper/s3.py:37-95 (boto3 list/get/put). */
class GraftTestFileSystem extends RawLocalFileSystem {
  private var myUri: URI = _

  override def getScheme: String = "graftfs"

  override def initialize(name: URI, conf: Configuration): Unit = {
    myUri = URI.create(name.getScheme + ":///")
    super.initialize(name, conf)
  }

  override def getUri: URI = if (myUri != null) myUri else URI.create("graftfs:///")

  /** Accept only graftfs paths (and scheme-less relative ones). */
  override def checkPath(path: Path): Unit = {
    val scheme = path.toUri.getScheme
    if (scheme != null && scheme != "graftfs")
      throw new IllegalArgumentException(s"Wrong FS scheme: $path")
  }
}
