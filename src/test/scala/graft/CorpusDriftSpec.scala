package graft

import graft.operators.CorpusDrift
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Drift monitor: hand-computed scaled-L1 numerators, identical snapshots
  * drift zero, one-sided tokens, and the top-V cut.
  */
class CorpusDriftSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-drift")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def docs(texts: String*) = texts.toSeq.toDF("text")

  test("hand-computed drift: counts, totals, scaled L1, order") {
    val a = docs("x x y")        // c_a: x=2, y=1; N_a=3
    val b = docs("x y y y")      // c_b: x=1, y=3; N_b=4
    val got = CorpusDrift.tokenDrift(a, b, "text", topV = 10, k = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    // drift(x) = |2*4 - 1*3| = 5 ; drift(y) = |1*4 - 3*3| = 5 ; tie -> token asc
    assert(got === Seq(("x", 2L, 1L, 5L), ("y", 1L, 3L, 5L)))
  }

  test("identical snapshots drift to zero everywhere") {
    val a = docs("alpha beta beta", "gamma")
    val got = CorpusDrift.tokenDrift(a, a, "text", topV = 10, k = 10)
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.forall(_._4 === 0L))
  }

  test("a token present on one side only carries its full mass as drift") {
    val a = docs("only_a only_a")
    val b = docs("only_b")
    val got = CorpusDrift.tokenDrift(a, b, "text", topV = 10, k = 10)
      .as[(String, Long, Long, Long)].collect()
      .map { case (w, ca, cb, d) => (w, (ca, cb, d)) }.toMap
    // N_a=2, N_b=1: drift(only_a)=|2*1-0*2|=2, drift(only_b)=|0*1-1*2|=2
    assert(got("only_a") === ((2L, 0L, 2L)))
    assert(got("only_b") === ((0L, 1L, 2L)))
  }

  test("topV cuts by combined count with token tie-break, and totals are in-vocab") {
    val a = docs("big big big small")
    val b = docs("big rare")
    // combined: big=4, small=1, rare=1 -> topV=2 keeps {big, rare} (tie small/rare -> 'rare' < 'small')
    val got = CorpusDrift.tokenDrift(a, b, "text", topV = 2, k = 10)
      .as[(String, Long, Long, Long)].collect().map(_._1).toSet
    assert(got === Set("big", "rare"))
  }
}
