package graft

import java.nio.file.{Files, Paths}

import graft.streaming.NearDupGate
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Streaming near-dup admission gate: in-batch representative selection,
  * store-probe rejection, exactly-once replay, the crash-window
  * reconcile, and the full streaming drive.
  */
class NearDupGateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-neardup-gate")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val base =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima " +
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray"
  private def variant(tag: String) = base + " " + tag
  private def fresh(seed: Int) =
    (0 until 24).map(i => s"tok${seed}_$i").mkString(" ")

  private def admittedIds(root: String): Set[Long] =
    NearDupGate.admittedDocs(spark, root).select("id").as[Long].collect().toSet

  test("gate admits representatives, rejects near-dups of the store, replays as no-op") {
    val root = Files.createTempDirectory("gate1").toString
    // batch 0: two near-dups of each other (1 wins) + one fresh doc
    val b0 = Seq((1L, variant("one")), (2L, variant("two")), (10L, fresh(7)))
      .toDF("id", "text")
    assert(NearDupGate.admitBatch(b0, root, 0L) === 2L)
    assert(admittedIds(root) === Set(1L, 10L))
    // batch 1: near-dup of admitted 1 (rejected), fresh (admitted),
    // in-batch dup pair (min id 20 wins)
    val b1 = Seq((3L, variant("three")), (20L, fresh(9)), (21L, fresh(9)))
      .toDF("id", "text")
    assert(NearDupGate.admitBatch(b1, root, 1L) === 1L)
    assert(admittedIds(root) === Set(1L, 10L, 20L))
    // replaying a committed batch is skipped outright
    assert(NearDupGate.admitBatch(b1, root, 1L) === -1L)
    assert(admittedIds(root) === Set(1L, 10L, 20L))
    // band index holds exactly the admitted ids
    assert(NearDupGate.bandIndex(spark, root).select("id").as[Long]
      .collect().toSet === Set(1L, 10L, 20L))
  }

  test("crash window: data written but no marker -> replay rewrites identically") {
    val root = Files.createTempDirectory("gate2").toString
    val b0 = Seq((1L, variant("one")), (10L, fresh(3))).toDF("id", "text")
    NearDupGate.admitBatch(b0, root, 0L)
    val b1 = Seq((2L, variant("crash")), (30L, fresh(4))).toDF("id", "text")
    NearDupGate.admitBatch(b1, root, 1L)
    // simulate the crash: batch 1's data exists but its commit marker is gone
    Files.delete(Paths.get(root, "_commits", "batch-1"))
    assert(admittedIds(root) === Set(1L, 10L), "torn batch must be invisible")
    // replay re-runs the batch against the same committed store
    assert(NearDupGate.admitBatch(b1, root, 1L) === 1L)
    assert(admittedIds(root) === Set(1L, 10L, 30L))
  }

  test("streaming drive equals sequential batch admission") {
    val root = Files.createTempDirectory("gate3").toString
    val landing = Files.createTempDirectory("gate3-landing").toString
    val ckpt = Files.createTempDirectory("gate3-ckpt").toString
    val drop1 = Seq((1L, variant("a")), (2L, variant("b")), (50L, fresh(1)))
    val drop2 = Seq((3L, variant("c")), (60L, fresh(2)))
    def drain(): Unit = {
      val q = NearDupGate.gate(
        spark.readStream.schema("id BIGINT, text STRING").parquet(landing),
        root, ckpt)
      q.processAllAvailable()
      q.stop()
    }
    drop1.toDF("id", "text").write.mode("append").parquet(landing)
    drain()
    drop2.toDF("id", "text").write.mode("append").parquet(landing)
    drain() // restart on the same checkpoint
    assert(admittedIds(root) === Set(1L, 50L, 60L))
    drain() // nothing new: exactly-once
    assert(admittedIds(root) === Set(1L, 50L, 60L))
  }
}
