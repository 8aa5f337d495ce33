package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Hashed-feature linear classifier INFERENCE — the shape of every
  * production quality filter between CCNet's Wikipedia-LM scorer and the
  * fastText quality classifiers of the Llama-era data pipelines: tokens
  * hash into a fixed-width bucket space, a dense weight vector (trained
  * offline, broadcast to executors) is summed over the buckets, and the
  * document keeps or drops on the sign. Inference is map-only — one UDF
  * call per document, no explode, no shuffle; at 10^12 docs the weight
  * vector rides the closure broadcast and the cost is linear in tokens.
  *
  * The bucket hash is the 16-bit md5 prefix (mod the table width) rather
  * than a faster non-cryptographic hash so the DuckDB oracle can replay
  * the identical bucketing from hex arithmetic; swap in xxhash64 % D for
  * a trained production model (the table layout and scoring are
  * unchanged — only the oracle needs the portable hash).
  *
  * Weights are integer (Long) so document scores are exact and
  * order-independent — a trained float model is applied by fixed-point
  * scaling (w ← round(w·2^16)), which changes no decision unless the
  * trained margin is below the quantization step.
  */
object HashClassifier {

  /** (scoreNum, nTokens): the summed weight of each whitespace token's
    * bucket, and the token count. Empty/null docs score 0 over 0 tokens.
    */
  def score(text: String, weights: Array[Long]): (Long, Long) = {
    if (text == null) return (0L, 0L)
    val ws = TextStats.tokens(text)
    val md = MessageDigest.getInstance("MD5")
    var s = 0L
    ws.foreach { w =>
      md.reset()
      val d = md.digest(w.toLowerCase.getBytes(StandardCharsets.UTF_8))
      // first two digest bytes == the first four hex chars Spark/DuckDB
      // render: bucket = int(md5(w)[0..4)) mod D
      val v = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      s += weights(v % weights.length)
    }
    (s, ws.length.toLong)
  }
}
