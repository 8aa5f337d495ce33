package graft

import graft.sources.LakeFormats
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class LakeFormatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-lake")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("csv/json/orc round-trip adversarial text, nulls, and empties with zero drift") {
    import spark.implicits._
    val rows = Seq(
      (1L, "en", 10L, "plain text"),
      (2L, "en", 3L, "comma, \"quoted\", and\nnewline\r\nCRLF"),
      (3L, "zh", 7L, "多字节 漢字 — emoji 😀 tab\there"),
      (4L, "de", 0L, ""), // empty string: must NOT come back as null
      (5L, null.asInstanceOf[String], 5L, null.asInstanceOf[String]), // nulls survive
      (6L, "fr", 2L, "  leading and trailing spaces  "),
      (7L, "es", 1L, "backslash \\ and \\n literal"))
      .toDF("doc_id", "lang", "n_chars", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-lake-spec").toString
    try {
      val got = LakeFormats.roundTrip(spark, rows, "doc_id", root)
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(got.map(_._1) == Seq("csv", "json", "orc"))
      for ((fmt, n, miss, mism) <- got) {
        assert(n == 7, s"$fmt n_rows")
        assert(miss == 0, s"$fmt n_missing")
        // CSV cannot distinguish empty-string from null without a quoted
        // empty marker; Spark writes "" unquoted and reads it back as
        // null — the ONE documented lossy cell shape. The spec pins the
        // actual behavior per format rather than pretending CSV is
        // lossless: orc/json must be exact; csv may differ ONLY on the
        // empty-string row.
        if (fmt == "csv") assert(mism <= 1, s"$fmt n_mismatch=$mism")
        else assert(mism == 0, s"$fmt n_mismatch=$mism")
      }
    } finally graft.Fs.deleteRecursively(java.nio.file.Paths.get(root))
  }
}
