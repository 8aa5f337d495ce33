package graft.sources

import graft.functions.Codecs
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.Timestamp
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** WET-style extracted-text sink + reader — the publishing half of the
  * crawl loop. Common Crawl ships extraction output as WET archives:
  * WARC `conversion` records whose payload is the UTF-8 plain text of
  * one page. This sink lets the extract pipeline re-publish its output
  * in the ecosystem's exchange format and re-ingest it for downstream
  * passes (dedup, LM scoring) without parquet.
  *
  * Record grammar written:
  * {{{
  * WARC/1.0\r\n
  * WARC-Type: conversion\r\n
  * WARC-Target-URI: <url>\r\n
  * WARC-Date: <iso-8601>\r\n
  * Content-Type: text/plain\r\n
  * Content-Length: <byte length of UTF-8 text>\r\n
  * \r\n
  * <text bytes>\r\n\r\n
  * }}}
  *
  * Scale shape: `writeWet` is a foreachPartition sink — each task
  * serializes its partition into ONE archive file (gzipped as
  * concatenated per-record members, the Common Crawl layout, so a
  * future range reader can inflate records independently). File names
  * are deterministic in the partition id and writes go through a
  * temp-file + atomic-move, so a retried task republishes the same
  * bytes instead of duplicating records. One file per task is exactly
  * the archive granularity `readWet` parallelizes over on the way back
  * in. The driver never sees row data; only task-side streams.
  */
object WetSink {

  /** Serialize one conversion record (headers ASCII, body UTF-8). */
  def writeRecord(url: String, ts: Timestamp, text: String): Array[Byte] = {
    val body = (if (text == null) "" else text).getBytes(StandardCharsets.UTF_8)
    val head =
      s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: $url\r\n" +
        s"WARC-Date: ${ts.toInstant}\r\nContent-Type: text/plain\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n"
    val out = new java.io.ByteArrayOutputStream(head.length + body.length + 4)
    out.write(head.getBytes(StandardCharsets.ISO_8859_1))
    out.write(body)
    out.write("\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1))
    out.toByteArray
  }

  /** Write `df` (url, warc_ts, text) as WET archives under `outDir`,
    * one `part-NNNNN.warc.wet[.gz]` per input partition. Caller controls
    * parallelism/file count via the frame's partitioning.
    */
  def writeWet(df: DataFrame, outDir: String, gzip: Boolean = true): Unit =
    writeArchives(df.select(F.col("url"), F.col("warc_ts"), F.col("text")),
      outDir, if (gzip) ".warc.wet.gz" else ".warc.wet", gzip) { r =>
      writeRecord(r.getString(0), r.getTimestamp(1), r.getString(2))
    }

  /** Shared task-side archive writer: one file per partition, temp-file +
    * atomic-move, gzip as concatenated per-record members. The record
    * serializer is the only thing WET and WAT publishing differ in.
    */
  private[sources] def writeArchives(
      df: DataFrame, outDir: String, ext: String, gzip: Boolean)(
      rec: org.apache.spark.sql.Row => Array[Byte]): Unit = {
    Files.createDirectories(Paths.get(outDir))
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val pid = TaskContext.getPartitionId()
      val fname = f"part-$pid%05d$ext"
      // attempt id in the temp name: concurrent attempts (speculation,
      // retry racing a zombie) must never interleave on one stream; the
      // atomic move makes whichever finishes last win with whole bytes
      val attempt = Option(TaskContext.get()).map(_.taskAttemptId()).getOrElse(0L)
      val tmp = Paths.get(outDir, s".$fname.$attempt.inprogress")
      val dst = Paths.get(outDir, fname)
      val os = new java.io.BufferedOutputStream(Files.newOutputStream(tmp))
      try {
        var any = false
        rows.foreach { r =>
          any = true
          val bytes = rec(r)
          os.write(if (gzip) Codecs.gzip(bytes) else bytes) // one member per record
        }
        os.close()
        if (any) Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        else Files.deleteIfExists(tmp) // empty partition: no archive
      } finally {
        os.close()
        Files.deleteIfExists(tmp)
      }
      ()
    }
  }

  /** Read WET archives back to (url, warc_ts, text). One task per
    * archive, mirroring `WarcReader.readWarcs`.
    */
  def readWet(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(F.col("content"))
      .as[Array[Byte]]
      .flatMap(parseWet _)
      .toDF("url", "warc_ts", "text")
  }

  /** Parse one WET archive: conversion records only, payload decoded as
    * UTF-8. Gzipped archives (single- or multi-member) inflate first.
    */
  def parseWet(archive: Array[Byte]): Seq[(String, Timestamp, String)] = {
    WarcReader.rawRecords(archive).collect {
      case (headers, payload) if headers.getOrElse("warc-type", "") == "conversion" =>
        (headers.getOrElse("warc-target-uri", ""),
          headers.get("warc-date").flatMap(WarcReader.parseTs).getOrElse(new Timestamp(0L)),
          new String(payload, StandardCharsets.UTF_8))
    }
  }
}
