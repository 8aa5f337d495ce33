package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bitext (parallel-corpus) mining by URL pattern — the first stage of
  * every web-scale translation-data pipeline (ParaCrawl, CCMatrix,
  * WikiMatrix): multilingual sites publish the same page under
  * language-tagged paths (`example.com/en/about` ↔ `example.com/fr/about`),
  * so stripping the language segment yields a canonical page key whose
  * groups are translation candidates. Candidates then pass the classic
  * sentence/document length-ratio sanity filter (Gale & Church 1993:
  * translations have comparable length) before alignment.
  *
  * Everything is built-in Catalyst expressions — anchored regexp_replace
  * for the key (codegen'd; anchored at ^ so "replace first" vs "replace
  * all" engine semantics cannot diverge), a per-(key, lang) min-id window
  * to pick ONE candidate per side (keeps the join 1:1 — a hub key can
  * never go quadratic), and an equi-join on the canonical key. Scale
  * shape: one shuffle per side on the canonical key, then a same-key
  * sort-merge/hash join; the length-ratio gate is a cross-multiplied
  * integer predicate evaluated inside the join, no floats.
  */
object Bitext {

  /** Canonical page key: the URL with a leading language path segment
    * removed. Only the FIRST path segment after the authority is
    * considered (the dominant site convention), and the match is
    * anchored, so the rewrite is single-occurrence by construction.
    */
  def canonicalKey(url: Column, langs: Seq[String]): Column = {
    require(langs.nonEmpty && langs.forall(_.matches("[a-z]{2}")),
      s"langs must be 2-letter codes, got $langs")
    regexp_replace(url, s"^(https?://[^/]+)/(${langs.mkString("|")})/", "$1/")
  }

  /** Mined document pairs (key, src_id, tgt_id, src_len, tgt_len) for one
    * language pair. Per (key, lang) the smallest-id page is the one
    * candidate; pairs whose text lengths differ by more than `ratio`×
    * are dropped (cross-multiplied: tgt_len*ratio >= src_len and
    * src_len*ratio >= tgt_len — integer-exact).
    */
  def minePairs(pages: DataFrame, urlCol: String, langCol: String,
                idCol: String, textCol: String, srcLang: String,
                tgtLang: String, allLangs: Seq[String],
                ratio: Int = 2): DataFrame = {
    require(ratio >= 1, s"ratio must be >= 1, got $ratio")
    val keyed = pages
      .filter(col(langCol).isin(srcLang, tgtLang))
      .select(
        canonicalKey(col(urlCol), allLangs).as("key"),
        col(langCol).as("lang"),
        col(idCol).as("id"),
        length(coalesce(col(textCol), lit(""))).cast("long").as("len"))
    val one = keyed
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("key"), col("lang")).orderBy(col("id"))))
      .filter(col("rn") === 1).drop("rn")
    val srcSide = one.filter(col("lang") === srcLang)
      .select(col("key"), col("id").as("src_id"), col("len").as("src_len"))
    val tgtSide = one.filter(col("lang") === tgtLang)
      .select(col("key"), col("id").as("tgt_id"), col("len").as("tgt_len"))
    srcSide.join(tgtSide, "key")
      .filter(col("tgt_len") * ratio >= col("src_len") &&
              col("src_len") * ratio >= col("tgt_len"))
      .select("key", "src_id", "tgt_id", "src_len", "tgt_len")
  }
}
