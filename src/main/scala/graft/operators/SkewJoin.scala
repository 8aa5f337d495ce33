package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Salted join for skewed keys — the standard mitigation when one hot key
  * would pin a whole shuffle partition to a single task (a 90%-hot key
  * makes a 1000-executor cluster wait on one straggler). AQE's skew-join
  * split handles the SORT-MERGE case adaptively; explicit salting is the
  * portable form that also covers aggregations and works when AQE cannot
  * see the skew (e.g. skew introduced by a derived key).
  *
  * Mechanics: the fact side gets a deterministic salt in [0, nSalts) from
  * a unique-ish column (NEVER `rand()` — retries and speculative tasks
  * must re-derive the same salt or exactly-once breaks); the dim side is
  * replicated nSalts times via a literal explode. The join key becomes
  * (key, salt), so the hot key's rows spread over nSalts partitions while
  * every original (fact, dim) pair still matches exactly once — the
  * result is row-for-row identical to the unsalted join, which is exactly
  * what the oracle checks.
  *
  * Cost model: dim shuffles nSalts copies (choose nSalts ~ the straggler
  * factor, not hundreds); fact pays one extra hash per row. Worth it when
  * maxKeyShare * nTasks >> 1.
  */
object SkewJoin {

  /** Inner-join `fact` with `dim` on `keyCol`, salted `nSalts` ways.
    * `saltSrcCol` must be unique-ish per fact row (a row id, url, digest)
    * so hot-key rows spread evenly and deterministically.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, keyCol: String,
      saltSrcCol: String, nSalts: Int): DataFrame = {
    require(nSalts >= 1 && nSalts <= 1024, s"1..1024 salts, got $nSalts")
    val salted = fact.withColumn("__salt",
      F.pmod(F.xxhash64(F.col(saltSrcCol)), F.lit(nSalts.toLong)))
    val replicated = dim.withColumn("__salt",
      F.explode(F.lit((0 until nSalts).map(_.toLong).toArray)))
    salted.join(replicated, Seq(keyCol, "__salt")).drop("__salt")
  }
}
