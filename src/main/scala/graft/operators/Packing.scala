package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: documents are tokenized, concatenated
  * in a canonical order, and sliced into fixed-length contexts (GPT-style
  * packing — docs straddle boundaries rather than padding). The core
  * primitive is an EXACT global running token offset per document.
  *
  * The naive formulation — `sum(toks) over (order by id)` with no
  * partitionBy — pulls the entire corpus into ONE task (Spark warns
  * "No Partition Defined for Window operation"); at 10^12 docs that is the
  * whole job on one core. [[withGlobalOffsets]] is the distributed
  * prefix-sum instead:
  *
  *  1. range-repartition by id (pid order == id order by construction),
  *  2. one tiny aggregate: per-partition token subtotals to the driver
  *     (numParts longs — not data),
  *  3. driver prefix-scan -> broadcast offsets,
  *  4. partition-LOCAL window cumsum + the partition's offset.
  *
  * Every stage is parallel; the only sequential work is the numParts-long
  * scan on the driver. Caveat: stage retries must not re-randomize
  * partition placement — range partitioning is deterministic for a fixed
  * input, but a production run at petabyte scale should materialize the
  * ranged stage (manifest-table snapshot) so a lost executor replays the
  * same split, not a resampled one.
  */
object Packing {

  /** Adds `cum` = inclusive global running sum of `tokCol` in `idCol`
    * order. Exact: equals the single-partition window result row for row.
    */
  def withGlobalOffsets(docs: DataFrame, idCol: String, tokCol: String,
                        numParts: Int = 64): DataFrame = {
    val ranged = docs
      .repartitionByRange(numParts, col(idCol))
      .withColumn("__pid", spark_partition_id())
    val subtotals = ranged
      .groupBy("__pid")
      .agg(sum(col(tokCol)).as("__s"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    // offsets(p) = total tokens in partitions strictly before p
    val offsets = (0 until numParts)
      .scanLeft(0L)((acc, p) => acc + subtotals.getOrElse(p, 0L))
      .toArray
    val offUdf = udf((p: Int) => offsets(p))
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol))
    ranged
      .withColumn("cum", sum(col(tokCol)).over(w) + offUdf(col("__pid")))
      .drop("__pid")
  }
}
