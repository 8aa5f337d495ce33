package graft

import graft.operators.HllSketch
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class HllSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-hll")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def regMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
    import spark.implicits._
    df.as[(Long, Long)].collect().toMap
  }

  test("registers are layout-invariant and merge is element-wise max") {
    import spark.implicits._
    val vals = (0L until 3000L).map(i => s"item-$i").toDF("v")
    val whole = regMap(HllSketch.registers(vals, "v"))
    assert(whole == regMap(HllSketch.registers(vals.repartition(7), "v")))
    // split into two disjoint slices: merge(regs(a), regs(b)) == regs(a ∪ b)
    val a = vals.filter($"v" < "item-5") // lexicographic split is fine — any split works
    val b = vals.filter($"v" >= "item-5")
    val merged = regMap(HllSketch.merge(
      HllSketch.registers(a, "v"), HllSketch.registers(b, "v")))
    assert(merged == whole)
    // overlap is idempotent
    val overlapped = regMap(HllSketch.merge(
      HllSketch.registers(vals, "v"), HllSketch.registers(b, "v")))
    assert(overlapped == whole)
  }

  test("estimate lands within 10% on cardinalities spanning the correction regimes") {
    import spark.implicits._
    for (n <- Seq(150, 2000, 20000)) {
      val vals = (0 until n).map(i => s"v$i-$n").toDF("v")
      val est = HllSketch.estimate(regMap(HllSketch.registers(vals, "v")))
      val err = math.abs(est - n) / n
      // m=256 gives sigma ~ 1.04/sqrt(256) = 6.5%; 10% is ~1.5 sigma
      assert(err < 0.10, s"n=$n est=$est err=$err")
    }
  }

  test("estimate applies the large-range hash-collision correction") {
    // all 256 registers saturated high -> raw estimate far beyond 2^32/30;
    // the corrected value must match -2^32 ln(1 - raw/2^32) exactly and
    // exceed the uncorrected raw (collision bias pulls raw DOWN)
    val regs = (0L until 256L).map(_ -> 24L).toMap
    val m = 256.0
    val alpha = 0.7213 / (1 + 1.079 / m)
    val raw = alpha * m * m / (256.0 * math.pow(2.0, -24.0))
    assert(raw > math.pow(2.0, 32) / 30.0)
    val want = -math.pow(2.0, 32) * math.log(1.0 - raw / math.pow(2.0, 32))
    assert(HllSketch.estimate(regs) === want)
    assert(want > raw)
  }

  test("rho formula: known hash corner cases") {
    import spark.implicits._
    // single value, register derivable by hand from md5
    val one = Seq("x").toDF("v")
    val regs = regMap(HllSketch.registers(one, "v"))
    assert(regs.size == 1)
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("x".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(md5hex, 16)
    val bucket = h >> 24
    val suffix = h & 0xFFFFFF
    val rho = if (suffix == 0) 25L else 25L - java.lang.Long.toBinaryString(suffix).length
    assert(regs == Map(bucket -> rho))
  }
}
