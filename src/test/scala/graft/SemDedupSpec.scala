package graft

import graft.operators.SemDedup
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup semantics: argmax cluster assignment with deterministic
  * tie-break, the non-transitive upper-triangle greedy drop rule,
  * per-cluster scoping, and rank-column override.
  */
class SemDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-semdedup")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val u1 = Array(1f, 0f, 0f, 0f)
  private val u2 = Array(0f, 1f, 0f, 0f)
  private val seeds = Array((0L, u1), (1L, u2))

  private def vec(deg: Double): Array[Float] = {
    val r = math.toRadians(deg)
    Array(math.cos(r).toFloat, math.sin(r).toFloat, 0f, 0f)
  }

  private def df(rows: Seq[(Long, Array[Float])]) = {
    import spark.implicits._
    rows.map { case (id, v) => (id, v.toSeq) }.toDF("id", "v")
  }

  test("assignClusters: argmax cosine, ties to the lowest centroid id") {
    import spark.implicits._
    val rows = df(Seq(
      (10L, vec(10)),   // near u1
      (11L, vec(80)),   // near u2
      (12L, vec(45)),   // exact tie -> centroid 0
      (13L, Array(0f, 0f, 0f, 0f)) // zero vector -> lowest centroid id
    ))
    val got = SemDedup.assignClusters(rows, "id", "v", seeds)
      .select("id", "cluster").as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 0L, 11L -> 1L, 12L -> 0L, 13L -> 0L))
  }

  test("greedy upper-triangle rule is non-transitive: a dropped doc still drops its successors") {
    import spark.implicits._
    // chain at 0 / 20 / 40 degrees (all cluster u1), eps 0.9:
    // cos(20deg)=0.94 links both adjacent pairs, cos(40deg)=0.77 does not
    // link the ends. b drops to a; c drops to b EVEN THOUGH b itself
    // dropped (paper rule, no CC).
    val out = SemDedup
      .semDeDup(df(Seq((1L, vec(0)), (2L, vec(20)), (3L, vec(40)))),
        "id", "v", seeds, eps = 0.9)
      .select("id", "is_kept").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("the scan is scoped per cluster: eps-close docs in different clusters both survive") {
    import spark.implicits._
    // 40 vs 50 degrees: cos(10deg)=0.985 >= eps, but 40deg clusters to u1
    // and 50deg to u2 — never compared
    val out = SemDedup
      .semDeDup(df(Seq((1L, vec(40)), (2L, vec(50)))), "id", "v", seeds, eps = 0.9)
      .select("id", "is_kept").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> true, 2L -> true))
  }

  test("rankCol overrides id priority (paper's distance-to-centroid policy plugs in)") {
    import spark.implicits._
    val rows = Seq((1L, vec(5).toSeq, 50L), (2L, vec(6).toSeq, 10L))
      .toDF("id", "v", "pri")
    // default rank = id: doc 1 wins
    val byId = SemDedup.semDeDup(rows, "id", "v", seeds, eps = 0.9)
      .select("id", "is_kept").as[(Long, Boolean)].collect().toMap
    assert(byId == Map(1L -> true, 2L -> false))
    // rank by pri: doc 2 wins
    val byPri = SemDedup.semDeDup(rows, "id", "v", seeds, eps = 0.9, rankCol = Some("pri"))
      .select("id", "is_kept").as[(Long, Boolean)].collect().toMap
    assert(byPri == Map(1L -> false, 2L -> true))
  }

  test("equal ranks break ties by id — never drop both sides of a tie") {
    import spark.implicits._
    val rows = Seq((7L, vec(5).toSeq, 1L), (3L, vec(6).toSeq, 1L)).toDF("id", "v", "pri")
    val out = SemDedup.semDeDup(rows, "id", "v", seeds, eps = 0.9, rankCol = Some("pri"))
      .select("id", "is_kept").as[(Long, Boolean)].collect().toMap
    assert(out == Map(3L -> true, 7L -> false))
  }

  test("seedCentroids fails loudly on a missing seed id") {
    val rows = df(Seq((1L, vec(0)), (2L, vec(90))))
    val got = SemDedup.seedCentroids(rows, "id", "v", Seq(1L, 2L))
    assert(got.map(_._1).sorted.toSeq == Seq(1L, 2L))
    val e = intercept[IllegalArgumentException] {
      SemDedup.seedCentroids(rows, "id", "v", Seq(1L, 99L))
    }
    assert(e.getMessage.contains("seed ids missing"))
  }
}
