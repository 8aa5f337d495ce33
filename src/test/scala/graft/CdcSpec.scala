package graft

import graft.operators.Cdc
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Content-defined chunking: reconstruction invariant, boundary
  * determinism, the resynchronization property that justifies CDC over
  * fixed-size blocks, and the exploded Spark surface.
  */
class CdcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-cdc")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private val sample =
    "the quick brown fox jumps over the lazy dog " * 40 // 1760 chars

  test("chunks reconstruct the document: lengths sum, hashes match pieces") {
    val chunks = Cdc.chunk(sample, k = 8, m = 16)
    assert(chunks.map(_._2).sum === sample.length)
    var off = 0
    chunks.foreach { case (h, l) =>
      assert(h === md5hex(sample.substring(off, off + l)))
      off += l
    }
    assert(chunks.length > 1, "sample must actually split")
  }

  test("prefix edit resynchronizes: every chunk after the first survives") {
    val v1 = Cdc.chunk(sample, k = 8, m = 16)
    val v2 = Cdc.chunk("UPDATED " + sample, k = 8, m = 16)
    // every window of v1 exists shifted by 8 in v2, so every v1 boundary
    // survives; only the first chunk (the edited region) may differ
    val v2set = v2.toSet
    v1.drop(1).foreach(c => assert(v2set.contains(c), s"lost chunk $c"))
    assert(v1.drop(1).nonEmpty)
  }

  test("documents shorter than the window are one whole-text chunk") {
    val t = "short"
    assert(Cdc.chunk(t, k = 8, m = 16).toSeq === Seq((md5hex(t), 5)))
  }

  test("null and empty texts chunk to nothing; m=1 cuts at every window position") {
    assert(Cdc.chunk(null, 8, 16).isEmpty)
    assert(Cdc.chunk("", 8, 16).isEmpty)
    val everything = Cdc.chunk("abcdefghij", k = 8, m = 1)
    // boundary at every i in [8,10]: chunks of length 8, 1, 1
    assert(everything.map(_._2).toSeq === Seq(8, 1, 1))
  }

  test("chunkDocs explodes with stable indices and matches the kernel") {
    import spark.implicits._
    val df = Seq((1L, sample), (2L, "tiny")).toDF("doc_id", "text")
    val got = Cdc.chunkDocs(df, "text", k = 8, m = 16)
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4.toInt)).toSeq).toMap
    assert(got(1L) === Cdc.chunk(sample, 8, 16).toSeq)
    assert(got(2L) === Cdc.chunk("tiny", 8, 16).toSeq)
  }
}
