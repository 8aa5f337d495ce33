package graft

import graft.functions.{SqlFunctions, TextStats}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-callable registration surface (SURVEY §2.10): every kernel is
  * visible in the session catalog and produces the same values from SQL
  * text as the Scala kernels do.
  */
class SqlSurfaceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-sql-surface")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("register makes every function visible to spark.catalog and SQL") {
    SqlFunctions.register(spark)
    // catalog surface: listFunctions AND functionExists agree
    val listed = spark.catalog.listFunctions().collect().map(_.name).toSet
    SqlFunctions.All.foreach { f =>
      assert(spark.catalog.functionExists(f), s"$f missing from functionExists")
      assert(listed.contains(f), s"$f missing from listFunctions")
    }
    // idempotent: re-registering must not throw or duplicate
    SqlFunctions.register(spark)
    assert(spark.catalog.listFunctions().collect().map(_.name)
      .count(SqlFunctions.All.contains) == SqlFunctions.All.size)
  }

  test("SQL text mines structured metadata from raw page bytes (charset cascade + LD capture)") {
    SqlFunctions.register(spark)
    import spark.implicits._
    // latin-1 payload (0xE9 é is invalid strict UTF-8) — the meta-charset
    // sniff must fire before the title decodes correctly
    val html = ("<html><head><meta charset=\"iso-8859-1\"><title>Café &amp; Bar</title>" +
      "<meta property=\"og:title\" content=\"OG1\">" +
      "<script type=\"application/ld+json\">{\"headline\":\"H\"}</script></head>" +
      "<body>x</body></html>").getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    Seq((1L, html)).toDF("id", "payload").createOrReplaceTempView("t_sql_meta")
    val row = spark.sql(
      """SELECT structured_meta(payload).title AS t,
        |       element_at(structured_meta(payload).metas, 'og:title') AS og,
        |       structured_meta(payload).jsonld[0] AS ld,
        |       get_json_object(structured_meta(payload).jsonld[0], '$.headline') AS h
        |FROM t_sql_meta""".stripMargin).head()
    assert(row.getString(0) == "Café & Bar")
    assert(row.getString(1) == "OG1")
    assert(row.getString(2) == "{\"headline\":\"H\"}")
    assert(row.getString(3) == "H")
  }

  test("SQL text runs the link/image/microdata harvest with base-aware resolution") {
    SqlFunctions.register(spark)
    import spark.implicits._
    val html = ("""<html><head><base href="https://cdn.x/a/"></head><body>
      |<a href="p.html">go &amp; see</a>
      |<img src="i.jpg" alt="pic" srcset="i2.jpg 2x">
      |<div itemscope itemtype="T"><span itemprop="k">v</span></div>
      |<meta http-equiv="refresh" content="0; url=/next">
      |</body></html>""".stripMargin).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Seq(("https://h.org/d/p.html", html)).toDF("url", "payload")
      .createOrReplaceTempView("t_sql_harvest")
    val row = spark.sql(
      """SELECT html_links(payload, url)[0] AS link,
        |       image_pairs(payload, url) AS imgs,
        |       microdata(payload)[0] AS md,
        |       refresh_target(element_at(structured_meta(payload).metas,
        |         'http-equiv:refresh')) AS refresh
        |FROM t_sql_harvest""".stripMargin).head()
    val link = row.getStruct(0)
    assert(link.getString(0) == "https://cdn.x/a/p.html" && link.getString(1) == "go & see")
    val imgs = row.getSeq[org.apache.spark.sql.Row](1)
    assert(imgs.map(r => (r.getString(0), r.getString(1), r.getBoolean(2))) == Seq(
      ("https://cdn.x/a/i.jpg", "pic", false), ("https://cdn.x/a/i2.jpg", "pic", true)))
    val md = row.getStruct(2)
    assert(md.getString(0) == "T" && md.getString(1) == "k" && md.getString(2) == "v")
    assert(row.getString(3) == "/next")
  }

  test("SQL text runs the native unicode normalizers") {
    SqlFunctions.register(spark)
    val r = spark.sql(
      "SELECT nfc_normalize('e\u0301') AS c, nfkc_normalize('\ufb01 \uff21') AS k, " +
        "nfc_normalize(CAST(NULL AS STRING)) AS n").head()
    assert(r.getString(0) == "\u00e9")
    assert(r.getString(1) == "fi A")
    assert(r.isNullAt(2))
  }

  test("SQL text runs the real kernels: extraction struct, text functions, native fingerprint") {
    SqlFunctions.register(spark)
    import spark.implicits._
    val html = "<html><body><p>The quick brown fox jumps over the lazy dog</p></body></html>"
      .getBytes("UTF-8")
    Seq((1L, html), (2L, Array.emptyByteArray))
      .toDF("id", "payload").createOrReplaceTempView("t_sql_surface")
    val row = spark.sql(
      """SELECT extract_text(payload) AS text,
        |       extract_doc(payload).format AS fmt,
        |       extract_doc(payload).status AS status,
        |       sniff_format(payload) AS sniffed,
        |       lang_id(extract_text(payload)) AS lang,
        |       quality_score(extract_text(payload)) AS q,
        |       classify_doc(extract_text(payload)) AS label,
        |       token_count(extract_text(payload)) AS toks,
        |       fingerprint64(extract_text(payload)) AS fp
        |FROM t_sql_surface WHERE id = 1""".stripMargin).head()
    val expected = SqlFunctions.extractDoc(html)
    assert(row.getAs[String]("text") == expected.text)
    assert(row.getAs[String]("fmt") == "html" && row.getAs[String]("status") == "ok")
    assert(row.getAs[String]("sniffed") == "html")
    assert(row.getAs[String]("lang") == TextStats.langId(expected.text))
    assert(row.getAs[Double]("q") == TextStats.quality(expected.text).score)
    assert(row.getAs[String]("label") == TextStats.classify(expected.text)._1)
    assert(row.getAs[Int]("toks") == TextStats.tokenCount(expected.text))
    assert(row.getAs[Long]("fp") == TextStats.fingerprint64(expected.text))
    // the empty payload routes through the unsupported branch, not a crash
    val empty = spark.sql(
      "SELECT extract_doc(payload).status AS st, sniff_format(payload) AS sn " +
        "FROM t_sql_surface WHERE id = 2").head()
    assert(empty.getAs[String]("st") == "unsupported")
    assert(empty.getAs[String]("sn") == "empty")
  }

  test("pipeline-tier kernels callable from SQL: scrub, hit count, gate score") {
    SqlFunctions.register(spark)
    import spark.implicits._
    val dirty = "reach me at jo.doe+x@test.org or 415-555-0000 from 10.1.2.3 thanks"
    Seq((1L, dirty), (2L, null.asInstanceOf[String]))
      .toDF("id", "text").createOrReplaceTempView("t_sql_pii")
    val row = spark.sql(
      """SELECT scrub_pii(text) AS clean, pii_hits(text) AS hits,
        |       quality_gate_score(scrub_pii(text)) AS score
        |FROM t_sql_pii WHERE id = 1""".stripMargin).head()
    val expected = graft.functions.PiiScrub.scrub(dirty)
    assert(row.getAs[String]("clean") == expected.clean)
    assert(row.getAs[Long]("hits") == 3L)
    assert(row.getAs[Long]("score") ==
      graft.functions.HashClassifier.score(expected.clean, SqlFunctions.DefaultGateWeights)._1)
    // null text: scrub passes null through, counts stay zero
    val nul = spark.sql(
      "SELECT scrub_pii(text) AS c, pii_hits(text) AS h, quality_gate_score(text) AS s " +
        "FROM t_sql_pii WHERE id = 2").head()
    assert(nul.isNullAt(0) && nul.getAs[Long]("h") == 0L && nul.getAs[Long]("s") == 0L)
  }

  test("image-curation and lexicon primitives callable from SQL: exif_meta, strip_exif, term_count") {
    SqlFunctions.register(spark)
    import spark.implicits._
    val jpeg = graft.functions.ExifMeta.encode(
      "CamQ", "M1", 6, "2026:08:20 10:00:00", 320, 240, withGps = true)
    Seq((1L, jpeg)).toDF("id", "img").createOrReplaceTempView("t_sql_exif")
    val row = spark.sql(
      """SELECT exif_meta(img)._2 AS orient, exif_meta(img)._3 AS make,
        |       exif_meta(img)._8 AS has_gps,
        |       exif_meta(strip_exif(img)) IS NULL AS stripped
        |FROM t_sql_exif""".stripMargin).head()
    assert(row.getAs[Int]("orient") == 6)
    assert(row.getAs[String]("make") == "CamQ")
    assert(row.getAs[Boolean]("has_gps") && row.getAs[Boolean]("stripped"))
    Seq((1L, "the WINNER wins; grandwinner does not; winner-takes-all does"))
      .toDF("id", "text").createOrReplaceTempView("t_sql_lex")
    val tc = spark.sql("SELECT term_count(text, 'winner') AS n FROM t_sql_lex").head()
    assert(tc.getAs[Long]("n") == 2L)
  }

  test("term_count automaton cache is size-bounded; past-cap terms still count correctly") {
    SqlFunctions.register(spark)
    import spark.implicits._
    // the term argument is a COLUMN here — the pathological high-cardinality
    // usage the cap exists for: more distinct terms than TermAutoCacheMax
    // must leave the per-JVM cache bounded while every row still counts
    // through the uncached-compile fallback
    val n = SqlFunctions.TermAutoCacheMax + 150
    val rows = (0 until n).map(i => (s"alpha term$i beta term$i term$i", s"term$i"))
    rows.toDF("text", "term").createOrReplaceTempView("t_sql_lex_cap")
    val counts = spark.sql(
      "SELECT term_count(text, term) AS n FROM t_sql_lex_cap").as[Long].collect()
    assert(counts.length == n && counts.forall(_ == 3L),
      "every row must count its own term exactly, cached or not")
    // local mode: the executor shares this JVM, so the cache is inspectable
    assert(SqlFunctions.termAutoCache.size <= SqlFunctions.TermAutoCacheMax,
      s"cache grew past the cap: ${SqlFunctions.termAutoCache.size}")
  }

  test("KMV sketch buildable from pure SQL, bit-identical to the Dataset path") {
    SqlFunctions.register(spark)
    import spark.implicits._
    val vals = (0 until 3000).map(i => s"url-${i % 2100}").toDF("v")
    vals.createOrReplaceTempView("t_sql_kmv")
    // SQL path: registered hash UDF + registered typed-Aggregator UDAF
    val sqlSk = spark.sql(
      "SELECT kmv_sketch(kmv_hash48(v)) AS sk FROM t_sql_kmv")
      .as[Seq[Long]].head()
    // Dataset path: the column-expression hash + the same Aggregator
    val dsSk = graft.operators.KmvSketch.sketch(vals, "v", 256)
      .as[Seq[Long]].head()
    assert(sqlSk == dsSk, "SQL and Dataset sketches must be bit-identical")
    assert(sqlSk.size == 256 && sqlSk == sqlSk.distinct.sorted)
    // null hashes are skipped by the aggregation, matching the column path
    val withNull = spark.sql(
      "SELECT kmv_sketch(kmv_hash48(CASE WHEN v = 'url-0' THEN NULL ELSE v END)) AS sk " +
        "FROM t_sql_kmv").as[Seq[Long]].head()
    val noNullVal = graft.operators.KmvSketch.sketch(
      vals.filter($"v" =!= "url-0"), "v", 256).as[Seq[Long]].head()
    assert(withNull == noNullVal)
  }
}
