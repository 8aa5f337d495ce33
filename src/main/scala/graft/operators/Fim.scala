package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fill-in-the-middle transformation (Bavarian 2022) — the code-model
  * counterpart of [[SpanCorrupt]]: a fraction of documents are rewritten
  * into PSM order (`<fim_prefix> P <fim_suffix> S <fim_middle> M`) so the
  * model learns infilling while the rest stay left-to-right — the
  * standard recipe for code corpora (the [[graft.functions.html.CodeBlocks]]
  * tier feeds exactly this stage).
  *
  * Determinism discipline (same as SpanCorrupt): whether a doc is
  * FIM-transformed and WHERE it splits are pure functions of doc id via
  * the engine-reproducible md5-prefix device — rate class `id|0`, cut
  * points `id|1`/`id|2` mod (n_tokens+1), lo/hi ordered. Token-level
  * cuts, segments joined by single spaces, EMPTY segments dropped from
  * the join (concat_ws-skip semantics — mirrored exactly in SQL with
  * nullif). Map-only, one kernel pass.
  */
object Fim {

  private[graft] def md5pfx(s: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((md(0) & 0xFF) << 8) | (md(1) & 0xFF)
  }

  /** One row per doc: (idCol, mode = fim|plain, output, n_middle). */
  def transform(docs: DataFrame, idCol: String, textCol: String,
                rateMod: Int = 2): DataFrame = {
    require(rateMod >= 1, s"fim: rateMod must be >= 1, got $rateMod")
    val spark = docs.sparkSession
    import spark.implicits._
    val kernel = udf { (id: Long, text: String) =>
      val toks = (if (text == null) "" else text).split("\\s+").filter(_.nonEmpty)
      val n = toks.length
      val applies = n >= 2 && md5pfx(s"$id|0") % rateMod == 0
      if (!applies) ("plain", toks.mkString(" "), 0L)
      else {
        val c1 = md5pfx(s"$id|1") % (n + 1)
        val c2 = md5pfx(s"$id|2") % (n + 1)
        val lo = math.min(c1, c2)
        val hi = math.max(c1, c2)
        val pre = toks.slice(0, lo).mkString(" ")
        val mid = toks.slice(lo, hi).mkString(" ")
        val suf = toks.slice(hi, n).mkString(" ")
        val psm = Seq("<fim_prefix>", pre, "<fim_suffix>", suf, "<fim_middle>", mid)
          .filter(_.nonEmpty).mkString(" ")
        ("fim", psm, (hi - lo).toLong)
      }
    }
    docs.select(col(idCol), kernel(col(idCol).cast("long"), col(textCol)).as("f"))
      .select(col(idCol), col("f._1").as("mode"), col("f._2").as("output"),
        col("f._3").as("n_middle"))
  }
}
