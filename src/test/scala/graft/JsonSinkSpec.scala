package graft

import graft.functions.JsonSink
import graft.operators.ExtractKernel
import graft.sources.Corpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S5 JSON sink: structured-document shape (normalizer.py:40-62 analog) and
  * lossless roundtrip through Spark's JSON parser.
  */
class JsonSinkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-json")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("structured document renders the canonical shape, exact string") {
    import spark.implicits._
    val e = Extracted(
      url = "https://x.example.com/a/1",
      warc_ts = java.sql.Timestamp.valueOf("2025-01-02 03:04:05"),
      format = "html",
      text = "line one\nline \"two\"",
      charset = "utf-8",
      status = "ok",
      error = null,
      n_blocks = 2,
      n_bytes_in = 123L
    )
    val json = JsonSink.render(Seq(e).toDS()).select($"doc_json").as[String].collect()(0)
    assert(json ==
      """{"document_info":{"file_path":"https://x.example.com/a/1","file_type":"html","file_size":123},""" +
      """"content":{"full_text":"line one\nline \"two\""},""" +
      """"layout":{"total_regions":2},""" +
      """"processing_info":{"extraction_method":"html-kernel","charset":"utf-8","status":"ok"}}""")
    // failed rows carry the error through (null fields are omitted, so the
    // ok row above has no "error" key — Spark to_json semantics)
    val bad = e.copy(status = "failed", error = "boom")
    val j2 = JsonSink.render(Seq(bad).toDS()).select($"doc_json").as[String].collect()(0)
    assert(j2.contains(""""status":"failed","error":"boom""""))
  }

  test("roundtrip: full_text parses back byte-identical over the corpus") {
    import spark.implicits._
    val pages = Corpus.generate(spark, 150L, 4)
    val j = JsonSink.render(ExtractKernel.extract(pages))
    val mismatches = j
      .withColumn("rt", get_json_object($"doc_json", "$.content.full_text"))
      .filter(!($"rt" <=> $"text"))
      .count()
    assert(mismatches == 0L)
  }
}
