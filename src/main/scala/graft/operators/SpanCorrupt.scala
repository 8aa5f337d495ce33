package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Span-corruption data generation — the denoising-objective shape (T5,
  * Raffel 2020 §3.1.4): mask contiguous token spans with sentinel ids,
  * emit (input with sentinels, target = sentinel + original span) pairs.
  * The pipeline stage that turns a CLEANED corpus into seq2seq training
  * rows.
  *
  * Determinism discipline (the whole point of this variant): span
  * selection must be a pure function of (doc, position) — an RNG would
  * make every rerun a different dataset and the oracle impossible. Spans
  * align to a fixed `gridL`-token grid and a grid cell is masked iff the
  * engine-reproducible md5-prefix hash of `doc_id|position` lands in the
  * configured rate class — the same hex device as
  * [[Sampling.stratifiedExact]], so DuckDB replays the exact mask. Grid
  * alignment also makes overlap IMPOSSIBLE by construction (T5 samples
  * unaligned spans; the aligned variant trades that freedom for a
  * closed-form oracle and identical masking on every engine — documented
  * deviation, corruption rate ≈ 1/modD of cells either way).
  *
  * Map-only: one kernel pass per row, no shuffle; sentinels are
  * `<extra_id_K>` numbered per doc in span order.
  */
object SpanCorrupt {

  /** Mask decision for the grid cell starting at 1-based token `i`. */
  private[graft] def masked(docId: Long, i: Int, modD: Int): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$docId|$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val pfx = ((md(0) & 0xFF) << 8) | (md(1) & 0xFF) // first 4 hex chars
    pfx % modD == 0
  }

  /** One row per input doc: (idCol, input, target, n_spans, n_masked). */
  def corrupt(docs: DataFrame, idCol: String, textCol: String,
              gridL: Int = 3, modD: Int = 5): DataFrame = {
    require(gridL >= 1 && modD >= 1, s"spanCorrupt: bad gridL=$gridL modD=$modD")
    val spark = docs.sparkSession
    import spark.implicits._
    val kernel = udf { (id: Long, text: String) =>
      val toks = (if (text == null) "" else text).split("\\s+").filter(_.nonEmpty)
      val input = new StringBuilder
      val target = new StringBuilder
      var k = 0
      var nMasked = 0
      var c = 0
      while (c * gridL < toks.length) {
        val start = c * gridL
        val cell = toks.slice(start, math.min(start + gridL, toks.length))
        if (masked(id, start + 1, modD)) {
          if (input.nonEmpty) input.append(' ')
          input.append(s"<extra_id_$k>")
          if (target.nonEmpty) target.append(' ')
          target.append(s"<extra_id_$k> ${cell.mkString(" ")}")
          k += 1
          nMasked += cell.length
        } else {
          if (input.nonEmpty) input.append(' ')
          input.append(cell.mkString(" "))
        }
        c += 1
      }
      (input.toString, target.toString, k.toLong, nMasked.toLong)
    }
    docs.select(col(idCol), kernel(col(idCol).cast("long"), col(textCol)).as("sc"))
      .select(col(idCol), col("sc._1").as("input"), col("sc._2").as("target"),
        col("sc._3").as("n_spans"), col("sc._4").as("n_masked"))
  }
}
