package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted skew join: result-invariance vs the plain join, and actual
  * spread of the hot key across salt buckets (the point of the exercise).
  */
class SkewJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-skewjoin")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("saltedJoin equals the unsalted join row for row on a 90%-hot key") {
    import spark.implicits._
    // 1000 fact rows, 900 of them on key "hot" — the straggler shape.
    val fact = spark.range(1000)
      .select($"id",
        when($"id" < 900, lit("hot")).otherwise(concat(lit("k"), $"id" % 7)).as("k"),
        ($"id" * 3 % 101).as("v"))
    val dim = Seq(("hot", 10L), ("k0", 1L), ("k1", 2L), ("k2", 3L),
      ("k3", 4L), ("k4", 5L), ("k5", 6L), ("k6", 7L)).toDF("k", "w")

    val salted = SkewJoin.saltedJoin(fact, dim, "k", "id", nSalts = 8)
      .select($"id", $"k", $"v", $"w")
    val plain = fact.join(dim, Seq("k")).select($"id", $"k", $"v", $"w")

    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() === 1000L)
  }

  test("the hot key spreads over multiple salt buckets") {
    import spark.implicits._
    val fact = spark.range(1000)
      .select($"id", lit("hot").as("k"))
      .withColumn("__salt", pmod(xxhash64($"id"), lit(8L)))
    val buckets = fact.groupBy($"__salt").count().collect()
    assert(buckets.length === 8, "xxhash64 salt must hit all 8 buckets at n=1000")
    // no bucket should hold more than ~3x the fair share
    assert(buckets.map(_.getLong(1)).max < 3 * 1000 / 8)
  }

  test("saltedJoin rejects out-of-range salt counts") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "k")
    intercept[IllegalArgumentException](SkewJoin.saltedJoin(df, df, "k", "id", 0))
    intercept[IllegalArgumentException](SkewJoin.saltedJoin(df, df, "k", "id", 2048))
  }
}
