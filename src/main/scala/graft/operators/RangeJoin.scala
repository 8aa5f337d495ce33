package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Point-in-interval range join via equi-bucket expansion — the join shape
  * Spark cannot plan well natively: `points JOIN intervals ON p BETWEEN lo
  * AND hi` has no equi-key, so Catalyst falls back to
  * BroadcastNestedLoopJoin (every point against every interval — O(P·I)
  * compares, and an outright driver OOM once the "broadcast" side is not
  * tiny). Used for numeric band joins (price bands, size classes, time
  * windows once converted to micros).
  *
  * The rewrite: quantize the axis into fixed-width buckets. Each point
  * lands in exactly one bucket (`floor(p / w)`); each interval is
  * replicated into every bucket it overlaps (`sequence(floor(lo/w),
  * floor(hi/w))` + explode). An ordinary shuffled hash equi-join on the
  * bucket id then meets every qualifying (point, interval) pair exactly
  * once — the point's single bucket is also one of the interval's buckets —
  * so the residual `BETWEEN` filter needs no dedup afterwards. Work is
  * O(P + I·(span/w) + candidate pairs): the cross product is gone, and the
  * join parallelizes over buckets like any equi-join (AQE skew-split
  * handles a hot bucket).
  *
  * Picking `bucketWidth`: ~ the typical interval span. Too small →
  * replication factor grows (bounded below, fails loudly); too large → more
  * false candidates for the residual filter. `maxBucketsPerInterval` is the
  * documented-limit guard: an interval spanning more than that many buckets
  * (span/width out of tune) raises rather than silently exploding the
  * replication.
  */
object RangeJoin {

  /** Inner join: all columns of `points` then all columns of `intervals`
    * (names must be disjoint) for each pair with lo <= p <= hi. Null
    * points / bounds never match (SQL comparison semantics).
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double,
      maxBucketsPerInterval: Int = 1024
  ): DataFrame = {
    require(bucketWidth > 0, s"pointInInterval: bucketWidth must be > 0, got $bucketWidth")
    require(maxBucketsPerInterval >= 1, "pointInInterval: maxBucketsPerInterval must be >= 1")
    val clash = points.columns.toSet.intersect(intervals.columns.toSet)
    require(clash.isEmpty, s"pointInInterval: column name clash: ${clash.mkString(", ")}")
    require(!points.columns.contains("__bucket") && !intervals.columns.contains("__bucket"),
      "pointInInterval: '__bucket' is reserved for the internal join key")

    def bucketOf(c: org.apache.spark.sql.Column) =
      F.floor(c / F.lit(bucketWidth)).cast("long")

    val loB = bucketOf(F.col(loCol))
    val hiB = bucketOf(F.col(hiCol))
    val nB = hiB - loB + 1L
    val guarded = F.when(F.col(loCol) > F.col(hiCol),
        F.raise_error(F.lit(s"pointInInterval: $loCol > $hiCol (empty interval row)")))
      .when(nB > maxBucketsPerInterval,
        F.raise_error(F.concat(F.lit("pointInInterval: interval spans "), nB.cast("string"),
          F.lit(s" buckets > max $maxBucketsPerInterval; raise bucketWidth"))))
      .otherwise(F.sequence(loB, hiB))
    val iRep = intervals
      .filter(F.col(loCol).isNotNull && F.col(hiCol).isNotNull)
      .withColumn("__bucket", F.explode(guarded))
    val pB = points
      .filter(F.col(pointCol).isNotNull)
      .withColumn("__bucket", bucketOf(F.col(pointCol)))

    pB.join(iRep, Seq("__bucket"))
      .filter(F.col(pointCol) >= F.col(loCol) && F.col(pointCol) <= F.col(hiCol))
      .select(points.columns.map(F.col).toSeq ++ intervals.columns.map(F.col): _*)
  }
}
