package graft.functions

import graft.PageIn
import org.apache.spark.sql.SparkSession

/** SQL-callable registration of the extraction + text kernels (SURVEY §2.10):
  * after `SqlFunctions.register(spark)`, a pure-SQL user can run the whole
  * per-document surface without writing Scala —
  *
  * {{{
  *   SELECT url, extract_text(html)            AS text,
  *          sniff_format(html)                 AS sniffed,
  *          extract_doc(html).format           AS format,
  *          lang_id(extract_text(html))        AS lang,
  *          quality_score(extract_text(html))  AS q,
  *          classify_doc(extract_text(html))   AS label,
  *          fingerprint64(extract_text(html))  AS fp
  *   FROM pages
  * }}}
  *
  * Reference analog: the per-document extractors ARE the reference's API
  * surface (enhanced_extract.py:574-654); here they become session
  * functions. Two registration paths:
  *
  *   - kernel functions go through `spark.udf.register` (scalar UDFs — the
  *     kernels are imperative byte/string walkers, so a UDF boundary is the
  *     honest cost; `extract_doc` returns the full STRUCT in one kernel
  *     pass so SQL users don't pay one extraction per projected field);
  *   - the codegen'd native expressions (fingerprint64 / cosine_sim /
  *     hamming64) go through the FunctionRegistry
  *     ([[expressions.registerAll]]) and stay inside WholeStageCodegen even
  *     when invoked from SQL text.
  *
  * The x_sql_surface driver query asserts zero divergence between this SQL
  * path and the Dataset kernel path; registration visibility is asserted
  * against `spark.catalog.listFunctions` in SqlSurfaceSpec.
  */
object SqlFunctions {

  /** Everything [[register]] makes visible to SQL. */
  val All: Seq[String] = Seq(
    "extract_text", "extract_doc", "sniff_format",
    "lang_id", "quality_score", "classify_doc", "token_count",
    "scrub_pii", "pii_hits", "quality_gate_score", "fix_mojibake",
    "structured_meta",
    "html_links", "image_pairs", "microdata", "refresh_target",
    "fingerprint64", "cosine_sim", "hamming64",
    "nfc_normalize", "nfkc_normalize",
    "kmv_hash48", "kmv_sketch",
    "exif_meta", "strip_exif", "term_count")

  /** SQL-facing row of `extract_doc`: the [[graft.Extracted]] columns that
    * are a function of the payload alone (url/warc_ts stay with the caller's
    * row; n_bytes_in is `length(payload)` in SQL already).
    */
  final case class SqlDoc(
      format: String,
      text: String,
      charset: String,
      status: String,
      error: String,
      n_blocks: Int)

  /** One kernel pass over a payload (null-safe; a null payload is an empty
    * one, matching the Dataset path's null handling).
    */
  def extractDoc(payload: Array[Byte]): SqlDoc = {
    val e = graft.operators.ExtractKernel.extractOneIn(PageIn(null, null, payload, null))
    SqlDoc(e.format, e.text, e.charset, e.status, e.error, e.n_blocks)
  }

  /** Register every kernel as a session-scoped SQL function (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("extract_text", (b: Array[Byte]) => extractDoc(b).text)
    spark.udf.register("extract_doc", (b: Array[Byte]) => extractDoc(b))
    spark.udf.register("sniff_format", (b: Array[Byte]) =>
      FormatSniff.sniff(if (b == null) Array.emptyByteArray else b))
    spark.udf.register("lang_id", (t: String) =>
      if (t == null) "und" else TextStats.langId(t))
    spark.udf.register("quality_score", (t: String) =>
      if (t == null) 0.0 else TextStats.quality(t).score)
    spark.udf.register("classify_doc", (t: String) =>
      if (t == null) "Unknown" else TextStats.classify(t)._1)
    spark.udf.register("token_count", (t: String) =>
      if (t == null) 0 else TextStats.tokenCount(t))
    // pipeline-tier kernels: redaction and classifier scoring from SQL
    spark.udf.register("scrub_pii", (t: String) => PiiScrub.scrub(t).clean)
    spark.udf.register("pii_hits", (t: String) => {
      val s = PiiScrub.scrub(t); (s.n_email + s.n_phone + s.n_ip).toLong
    })
    spark.udf.register("quality_gate_score", (t: String) =>
      HashClassifier.score(t, DefaultGateWeights)._1)
    spark.udf.register("fix_mojibake", (t: String) => Mojibake.fix(t)._1)
    // structured-metadata mining over the raw page bytes: the SAME charset
    // cascade as the html kernel, then the StructuredData pass — so
    // `SELECT structured_meta(html).title FROM pages` works on a binary
    // column without a separate decode step
    spark.udf.register("structured_meta", (b: Array[Byte]) => {
      val s = if (b == null) "" else Charsets.decode(b, isHtml = true).text
      graft.functions.html.StructuredData.extract(s)
    })
    // the declared-link harvest tier from SQL, same charset cascade:
    // `SELECT explode(html_links(html, url)) FROM pages` yields the
    // resolved (dst, anchor) rows; image_pairs the (img url, alt,
    // from_srcset) rows; microdata the (itemtype, prop, value) triples
    spark.udf.register("html_links", (b: Array[Byte], url: String) => {
      val s = if (b == null) "" else Charsets.decode(b, isHtml = true).text
      graft.functions.html.HtmlLinks.extract(s, if (url == null) "" else url)
    })
    spark.udf.register("image_pairs", (b: Array[Byte], url: String) => {
      val s = if (b == null) "" else Charsets.decode(b, isHtml = true).text
      graft.functions.html.ImageLinks.extract(s, if (url == null) "" else url)
        .map(i => (i.url, i.alt, i.fromSrcset))
    })
    spark.udf.register("microdata", (b: Array[Byte]) => {
      val s = if (b == null) "" else Charsets.decode(b, isHtml = true).text
      graft.functions.html.Microdata.extract(s).map(t => (t.itemtype, t.prop, t.value))
    })
    spark.udf.register("refresh_target", (content: String) =>
      graft.functions.html.StructuredData.refreshTarget(content).orNull)
    // image-curation tier from SQL: `SELECT exif_meta(img).orientation`,
    // `WHERE (exif_meta(img)).has_gps`, and the privacy scrub
    // `SELECT strip_exif(img)` (byte-exact Exif-segment removal)
    spark.udf.register("exif_meta", (b: Array[Byte]) =>
      ExifMeta.parseJpeg(b).map(e => (e.bigEndian, e.orientation.getOrElse(-1),
        e.make.orNull, e.model.orNull, e.dateTimeOriginal.orNull,
        e.pixelX.getOrElse(-1L), e.pixelY.getOrElse(-1L), e.hasGps)).orNull)
    spark.udf.register("strip_exif", (b: Array[Byte]) => ExifMeta.stripExif(b))
    // the policy-lexicon gate from SQL over a session-fixed lexicon is the
    // Dataset path's job (the automaton broadcast is per-term-list); what
    // SQL gets is the single-term primitive with identical boundary rules
    spark.udf.register("term_count", (t: String, term: String) => {
      if (t == null || term == null || term.isEmpty) 0L
      else {
        // per-JVM automaton cache: the SQL surface sees one term per call,
        // and rebuilding the trie per ROW would dwarf the match cost. The
        // cache is size-bounded: the term argument is a column in the UDF
        // signature, so a high-cardinality term column must not grow
        // executor memory for the process lifetime — past the cap we fall
        // back to an uncached compile (correct, just slower), which is the
        // right price for the pathological usage. The bound is
        // approximate, not strict: N concurrent executor threads can
        // each pass the size check and overshoot the cap by up to the
        // thread count — acceptable drift for KB-sized entries (a
        // strict bound would need putIfAbsent + post-insert evict for
        // no behavioral gain).
        val key = term.toLowerCase
        val cached = termAutoCache.get(key)
        val a =
          if (cached != null) cached
          else if (termAutoCache.size < TermAutoCacheMax)
            termAutoCache.computeIfAbsent(key,
              k => graft.operators.Lexicon.compile(Seq(k), asciiFold = true))
          else graft.operators.Lexicon.compile(Seq(key), asciiFold = true)
        val counts = new Array[Int](1); val touched = new Array[Int](1)
        a.countInto(t, wordBounds = true, asciiFold = true, counts, touched)
        counts(0).toLong
      }
    })
    // typed AGGREGATOR from SQL: kmv_sketch(hash) groups to the k-minimum
    // distinct-hash array (k=256), so `SELECT kmv_sketch(kmv_hash48(url))
    // FROM pages` builds the theta sketch without leaving SQL; kmv_hash48
    // is the matching 48-bit md5-prefix hash
    spark.udf.register("kmv_hash48", (v: String) => {
      // null → null, matching the column path (md5(null) is null there)
      if (v == null) null
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(v.getBytes("UTF-8"))
        // first 12 hex digits = top 6 bytes, big-endian
        java.lang.Long.valueOf(
          (0 until 6).foldLeft(0L)((acc, i) => (acc << 8) | (md(i) & 0xffL)))
      }
    }: java.lang.Long)
    // boxed variant: SQL NULL hashes are skipped (the primitive encoder
    // would decode NULL to 0L and insert a spurious minimum)
    spark.udf.register("kmv_sketch", org.apache.spark.sql.functions.udaf(
      graft.operators.KmvSketch.KmvBoxed(256),
      org.apache.spark.sql.Encoders.LONG))
    expressions.registerAll(spark)
  }

  /** Cap on distinct cached term automatons (see term_count above): a few
    * thousand single-term tries are KBs each — bounded memory even if every
    * session query uses a different constant term.
    */
  private[graft] final val TermAutoCacheMax = 4096

  private[graft] val termAutoCache =
    new java.util.concurrent.ConcurrentHashMap[String, graft.operators.Lexicon.Automaton]()

  /** The driver queries' deterministic stand-in weight table (see
    * t_hash_classifier); a trained model replaces this array, nothing else.
    */
  val DefaultGateWeights: Array[Long] =
    Array.tabulate(256)(b => (((b * 37 + 11) % 201) - 100).toLong)
}
