package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Small shared filesystem helpers (one implementation, several callers —
  * ManifestTable staging cleanup, Bench sink cleanup).
  *
  * Both helpers close the `Files.walk` stream explicitly: `exists` would
  * otherwise short-circuit and leak the walker's open directory handles —
  * once per streaming micro-batch commit, which accumulates to EMFILE over
  * the 10^4-commit design point.
  */
object Fs {

  /** Delete a file tree if it exists (children before parents). */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Using.resource(Files.walk(p)) { w =>
        w.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
    }

  /** True when the directory contains at least one regular `.parquet` file
    * (a partitioned write of an EMPTY dataset leaves only _SUCCESS).
    */
  def hasParquetFiles(p: Path): Boolean =
    Files.exists(p) && Using.resource(Files.walk(p)) { w =>
      w.iterator().asScala
        .exists(f => Files.isRegularFile(f) && f.getFileName.toString.endsWith(".parquet"))
    }
}
