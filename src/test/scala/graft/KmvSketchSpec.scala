package graft

import graft.operators.KmvSketch
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class KmvSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-kmv")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sk(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] = {
    import spark.implicits._
    KmvSketch.sketch(df, "v", k).as[Seq[Long]].head()
  }

  test("buffer insert/merge: sorted, distinct, bounded, order-insensitive") {
    val k = 8
    val xs = Seq(42L, 7L, 42L, 99L, 1L, 7L, 55L, 3L, 88L, 2L, 1L, 60L, 5L)
    val one = xs.foldLeft(Seq.empty[Long])((b, h) => KmvSketch.insert(b, h, k))
    assert(one == xs.distinct.sorted.take(k))
    // any split point merges to the same sketch (semilattice)
    for (cut <- 0 to xs.size) {
      val (l, r) = xs.splitAt(cut)
      val lb = l.foldLeft(Seq.empty[Long])((b, h) => KmvSketch.insert(b, h, k))
      val rb = r.foldLeft(Seq.empty[Long])((b, h) => KmvSketch.insert(b, h, k))
      assert(KmvSketch.mergeSorted(lb, rb, k) == one)
    }
    // merge is idempotent
    assert(KmvSketch.mergeSorted(one, one, k) == one)
  }

  test("sketch is layout-invariant and equals the k smallest distinct hashes") {
    import spark.implicits._
    val k = 64
    val vals = (0 until 2000).map(i => s"item-${i % 1300}").toDF("v")
    val got = sk(vals, k)
    assert(got == sk(vals.repartition(7), k))
    // reference: hash every distinct value, take the k smallest
    val all = KmvSketch
      .sketch(vals, "v", Int.MaxValue) // unbounded: the full distinct hash set
      .as[Seq[Long]].head()
    assert(all.size == 1300)
    assert(got == all.take(k))
    assert(got.size == k && got == got.distinct.sorted)
  }

  test("unsaturated sketch is the exact distinct set; estimate is exact there") {
    import spark.implicits._
    val vals = (0 until 40).map(i => s"u$i").toDF("v")
    val got = sk(vals, 256)
    assert(got.size == 40)
    assert(KmvSketch.estimateDistinct(got, 256) == 40.0)
  }

  test("distinct estimate lands within 15% at k=256 over 10k-100k values") {
    import spark.implicits._
    for (n <- Seq(10000, 100000)) {
      val vals = (0 until n).map(i => s"v$i-$n").toDF("v")
      val est = KmvSketch.estimateDistinct(sk(vals, 256), 256)
      val err = math.abs(est - n) / n
      assert(err < 0.15, s"n=$n est=$est err=$err")
    }
  }

  test("intersection estimate recovers a planted overlap within 30%") {
    import spark.implicits._
    // |A|=20k, |B|=20k, |A∩B|=8k
    val a = ((0 until 12000).map(i => s"onlyA-$i") ++
      (0 until 8000).map(i => s"both-$i")).toDF("v")
    val b = ((0 until 12000).map(i => s"onlyB-$i") ++
      (0 until 8000).map(i => s"both-$i")).toDF("v")
    val (ska, skb) = (sk(a, 256), sk(b, 256))
    val est = KmvSketch.estimateIntersection(ska, skb, 256)
    assert(math.abs(est - 8000) / 8000.0 < 0.30, s"est=$est")
    // disjoint sets estimate ~0 (a stray hash collision below theta is
    // possible in principle but astronomically unlikely at 48 bits)
    val c = (0 until 20000).map(i => s"onlyC-$i").toDF("v")
    assert(KmvSketch.estimateIntersection(ska, sk(c, 256), 256) == 0.0)
  }
}
