package graft

import graft.operators.Funnel
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class FunnelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-funnel")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("funnel: anchor at first step-1, greedy steps, window cutoff, strict after") {
    import spark.implicits._
    val events = Seq(
      // user 1: full conversion A(10) -> B(20) -> C(30)
      (1L, ts(10), "A"), (1L, ts(20), "B"), (1L, ts(30), "C"),
      // user 2: B before A never counts; reaches only step 1
      (2L, ts(10), "B"), (2L, ts(20), "A"),
      // user 3: anchored at FIRST A (t=10); B at 1000 is outside the 100 s
      // window even though a later A(950)->B(1000) pair would convert
      (3L, ts(10), "A"), (3L, ts(950), "A"), (3L, ts(1000), "B"),
      // user 4: B simultaneous with A does not advance (strictly after)
      (4L, ts(10), "A"), (4L, ts(10), "B"),
      // user 5: greedy picks the FIRST B (15), so C(18) after it converts
      (5L, ts(10), "A"), (5L, ts(15), "B"), (5L, ts(90), "B"), (5L, ts(18), "C"),
      // user 6: no step-1 event at all -> absent from output
      (6L, ts(10), "B"), (6L, ts(20), "C"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.conversion(events, "user_id", "ts", "event_type",
        Seq("A", "B", "C"), windowMicros = 100L * 1000000L)
      .select("user", "reached", "t1", "t_last")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map(
      1L -> ((3L, 10000000L, 30000000L)),
      2L -> ((1L, 20000000L, 20000000L)),
      3L -> ((1L, 10000000L, 10000000L)),
      4L -> ((1L, 10000000L, 10000000L)),
      5L -> ((3L, 10000000L, 18000000L))))
  }

  test("funnel: single-step degenerate and empty input") {
    import spark.implicits._
    val events = Seq((1L, ts(5), "A"), (1L, ts(9), "A")).toDF("user_id", "ts", "event_type")
    val got = Funnel.conversion(events, "user_id", "ts", "event_type",
        Seq("A"), windowMicros = 1000000L)
      .select("user", "reached", "t1")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L, 5000000L)))
    val empty = Funnel.conversion(events.filter("user_id < 0"), "user_id", "ts",
      "event_type", Seq("A", "B"), windowMicros = 1000L)
    assert(empty.count() === 0L)
  }
}
