package graft

import graft.sources.WetSink
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class WetSinkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-wet")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: Long) = new java.sql.Timestamp(1735689600000L + s * 1000L)

  test("single record round-trips byte-identically, incl. multi-byte UTF-8") {
    val text = "héllo 世界 — line1\nline2  nbsp"
    val rec = WetSink.writeRecord("https://x.org/a", ts(1), text)
    val back = WetSink.parseWet(rec)
    assert(back === Seq(("https://x.org/a", ts(1), text)))
    // Content-Length counts UTF-8 BYTES, not chars
    val head = new String(rec, java.nio.charset.StandardCharsets.ISO_8859_1)
    val cl = head.linesIterator.find(_.startsWith("Content-Length:")).get.split(":")(1).trim.toInt
    assert(cl === text.getBytes("UTF-8").length)
    assert(cl !== text.length)
  }

  test("distributed write -> read round-trip with gzip members and empty partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-wet").toString
    try {
      val rows = (0 until 97).map(i => (s"https://x.org/p/$i", ts(i), s"text $i " + ("→" * (i % 5))))
      // 8 partitions over 97 rows plus a deliberately empty partition range
      val df = rows.toDF("url", "warc_ts", "text").repartition(8)
      WetSink.writeWet(df, dir, gzip = true)
      val files = new java.io.File(dir).listFiles().map(_.getName).sorted
      assert(files.forall(_.endsWith(".warc.wet.gz")))
      assert(files.forall(!_.contains("inprogress")))
      val back = WetSink.readWet(spark, dir)
        .as[(String, java.sql.Timestamp, String)].collect().sortBy(_._1)
      assert(back.toSeq === rows.sortBy(_._1))
    } finally graft.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("conversion records ignored by the response reader, and vice versa") {
    val wet = WetSink.writeRecord("https://x.org/a", ts(1), "plain")
    assert(graft.sources.WarcReader.parseWarc(wet) === Seq.empty)
    val warc = graft.sources.WarcReader.writeWarc(
      Seq(("https://x.org/b", ts(2), "<html/>".getBytes("UTF-8"))))
    assert(WetSink.parseWet(warc) === Seq.empty)
  }
}
