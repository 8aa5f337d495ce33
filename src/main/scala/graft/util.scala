package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Small shared filesystem helpers (one implementation, several callers —
  * ManifestTable staging cleanup, Bench sink cleanup).
  */
object Fs {

  /** Delete a file tree if it exists (children before parents). */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }

  /** True when the directory contains at least one regular `.parquet` file
    * (a partitioned write of an EMPTY dataset leaves only _SUCCESS).
    */
  def hasParquetFiles(p: Path): Boolean =
    Files.exists(p) && Files.walk(p).iterator().asScala
      .exists(f => Files.isRegularFile(f) && f.getFileName.toString.endsWith(".parquet"))
}
