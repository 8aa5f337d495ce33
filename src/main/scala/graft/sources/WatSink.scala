package graft.sources

import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** WAT-style metadata sink + reader — the third leg of the Common Crawl
  * archive triple the engine already speaks (WARC ingest, WET publish):
  * WAT files carry one WARC `metadata` record per page whose payload is
  * a JSON document of extracted metadata (title, meta tags, outlinks).
  * Downstream graph and provenance pipelines consume WAT instead of
  * re-parsing page bytes; publishing it from the extraction pass means
  * the HTML is tokenized ONCE for text + metadata + links together.
  *
  * Record grammar written (mirrors [[WetSink]]'s conversion records):
  * {{{
  * WARC/1.0\r\n
  * WARC-Type: metadata\r\n
  * WARC-Target-URI: <url>\r\n
  * WARC-Date: <iso-8601>\r\n
  * Content-Type: application/json\r\n
  * Content-Length: <byte length of UTF-8 json>\r\n
  * \r\n
  * <json bytes>\r\n\r\n
  * }}}
  *
  * Scale shape: identical to WetSink — [[WetSink.writeArchives]] does the
  * one-file-per-task, temp-file + atomic-move, per-record-gzip-member
  * publishing; readWat parallelizes one task per archive. The JSON body
  * is caller-built (to_json over kernel outputs), so the sink stays a
  * pure serialization boundary.
  */
object WatSink {

  /** Serialize one metadata record (headers ASCII, JSON body UTF-8). */
  def writeRecord(url: String, ts: Timestamp, json: String): Array[Byte] = {
    val body = (if (json == null) "" else json).getBytes(StandardCharsets.UTF_8)
    val head =
      s"WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Target-URI: $url\r\n" +
        s"WARC-Date: ${ts.toInstant}\r\nContent-Type: application/json\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n"
    val out = new java.io.ByteArrayOutputStream(head.length + body.length + 4)
    out.write(head.getBytes(StandardCharsets.ISO_8859_1))
    out.write(body)
    out.write("\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1))
    out.toByteArray
  }

  /** Write `df` (url, warc_ts, wat) as WAT archives under `outDir`, one
    * `part-NNNNN.warc.wat[.gz]` per input partition.
    */
  def writeWat(df: DataFrame, outDir: String, gzip: Boolean = true): Unit =
    WetSink.writeArchives(df.select(F.col("url"), F.col("warc_ts"), F.col("wat")),
      outDir, if (gzip) ".warc.wat.gz" else ".warc.wat", gzip) { r =>
      writeRecord(r.getString(0), r.getTimestamp(1), r.getString(2))
    }

  /** Read WAT archives back to (url, warc_ts, wat). One task per archive. */
  def readWat(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(F.col("content"))
      .as[Array[Byte]]
      .flatMap(parseWat _)
      .toDF("url", "warc_ts", "wat")
  }

  /** Parse one WAT archive: metadata records only, payload decoded UTF-8. */
  def parseWat(archive: Array[Byte]): Seq[(String, Timestamp, String)] = {
    WarcReader.rawRecords(archive).collect {
      case (headers, payload) if headers.getOrElse("warc-type", "") == "metadata" =>
        (headers.getOrElse("warc-target-uri", ""),
          headers.get("warc-date").flatMap(WarcReader.parseTs).getOrElse(new Timestamp(0L)),
          new String(payload, StandardCharsets.UTF_8))
    }
  }
}
