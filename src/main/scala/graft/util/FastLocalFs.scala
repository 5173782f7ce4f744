package graft.util

import org.apache.hadoop.fs.{FileUtil, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem whose `setPermission` uses the pure-Java
  * `FileUtil.setPermission` fast path instead of forking a `chmod`
  * process per call.
  *
  * Why: this container has no libhadoop native library, and without it
  * `RawLocalFileSystem.setPermission` execs `chmod` for EVERY created
  * file and directory. A dynamic-partitioned write of B bucket
  * directories performs ~3B such calls (part file, .crc file, partition
  * temp dir), ~14 ms of fork+exec each — measured 772 forks / ~4 s of
  * wall for the 256-directory ANN index write, with the actual data
  * under 1 MB. `FileUtil.setPermission` applies the same permission bits
  * through `java.io.File` setters whenever group==other bits (true for
  * the default 644/755 creations) and only shells out otherwise, so
  * semantics are unchanged.
  *
  * Scope: opt-in per write via
  * `.option("fs.file.impl", classOf[FastLocalFileSystem].getName)`
  * `.option("fs.file.impl.disable.cache", "true")`
  * — session and harness filesystems are untouched. On a real cluster
  * (HDFS/S3/NVMe with native IO) this class is simply never needed.
  */
class FastRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit =
    if (permission != null) FileUtil.setPermission(pathToFile(p), permission)
}

class FastLocalFileSystem extends LocalFileSystem(new FastRawLocalFileSystem)

object FastLocalFs {
  /** DataFrameWriter options routing a single write through the no-fork
    * local fs (merged into that write's Hadoop conf only). */
  val writeOptions: Map[String, String] = Map(
    "fs.file.impl" -> classOf[FastLocalFileSystem].getName,
    "fs.file.impl.disable.cache" -> "true")
}
