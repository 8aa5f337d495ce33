package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** sf1.0 stress leg for the superlinear-suspect operators (VERDICT r4 ask
  * #3): runs each suspect at sf0.1 (5,000 docs) and at a deterministic 10×
  * corpus (50,000 docs), and reports the measured runtime exponent
  * log10(t10/t1) next to the OUTPUT-row exponent — an operator whose
  * runtime grows like its output is output-bound (optimal for its
  * semantics); one whose runtime outgrows both input and output is the
  * accidental quadratic this leg exists to catch.
  *
  * The 10× corpus preserves the sf0.1 within-copy structure exactly: ten
  * copies of the documents table, doc_id offset by 5,000·k, and for copy
  * k>0 every word whose murmur3 lands in a fixed 30% class is rewritten to
  * a copy-tagged variant. Mutation is deterministic BY WORD, so two
  * near-duplicate docs in the same copy mutate identically — their
  * within-copy Jaccard is UNCHANGED — while the same doc across copies
  * shares only the unmutated 70% (cross-copy Jaccard ≈ 0.54, safely under
  * the 0.8 near-dup gate). Near-dup pairs and duplicate families therefore
  * scale exactly 10×; the id-derived graph/image queries scale their node
  * count 10×. Output: STRESS_BENCH.json (rendered into BENCH.md by Bench).
  */
object ScalingStress {

  private val Suspects = Seq(
    "d_clusters", "d_cluster_histogram", "w_scc", "w_kcore", "w_trustrank",
    "m_phash_neardup")

  private def timeIt[T](f: => T): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scaling-stress")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._

    val base = "/root/testdata/sf0.1"
    val stressDir = "/root/repo/target/graft-stress/sf1.0"
    val marker = Paths.get(stressDir, "documents.parquet", "_SUCCESS")
    if (!Files.exists(marker)) {
      val docs = s.read.parquet(s"$base/documents.parquet")
      val copies = 10
      val stride = docs.agg(max($"doc_id")).as[Long].head() + 1
      val mutateUdf = udf { (t: String, k: Int) =>
        if (k == 0) t
        else t.split(' ').map { w =>
          val h = scala.util.hashing.MurmurHash3.stringHash(w, 42)
          if (math.floorMod(h, 10) < 3) w + "_" + k else w
        }.mkString(" ")
      }
      val scaled = (0 until copies).map { k =>
        docs.select(
          ($"doc_id" + lit(k.toLong * stride)).as("doc_id"),
          mutateUdf($"text", lit(k)).as("text"),
          $"lang", $"source")
      }.reduce(_ unionAll _)
        .withColumn("n_chars", length($"text").cast("int"))
      scaled.repartition(32).write.mode("overwrite")
        .parquet(s"$stressDir/documents.parquet")
    }

    val results = Suspects.map { q =>
      def run(dir: String): (Double, Long) = {
        val rows = SparkEntry.queries(q)(s, dir).count() // warm
        SparkEntry.queries(q)(s, dir).count()
        val t = (1 to 2).map(_ => timeIt(SparkEntry.queries(q)(s, dir).count())).min
        s.sharedState.cacheManager.clearCache()
        (t, rows)
      }
      val (t1, rows1) = run(base)
      val (t10, rows10) = run(stressDir)
      val timeExp = math.log10(t10 / t1)
      val rowsExp = math.log10(math.max(1, rows10).toDouble / math.max(1, rows1))
      println(f"STRESS $q t1=$t1%.2f t10=$t10%.2f rows1=$rows1 rows10=$rows10 " +
        f"timeExp=$timeExp%.2f rowsExp=$rowsExp%.2f")
      (q, t1, t10, rows1, rows10, timeExp, rowsExp)
    }

    val json = results.map { case (q, t1, t10, r1, r10, te, re) =>
      s""""$q":{"t_sf01_sec":${f"$t1%.2f"},"t_sf1_sec":${f"$t10%.2f"},""" +
        s""""rows_sf01":$r1,"rows_sf1":$r10,"time_exponent":${f"$te%.2f"},""" +
        s""""rows_exponent":${f"$re%.2f"}}"""
    }.mkString("{\"input_ratio\":10,\"docs_sf01\":5000,\"docs_sf1\":50000,", ",", "}")
    Files.writeString(Paths.get("/root/repo/STRESS_BENCH.json"), json)
    println(json)
    s.stop()
  }
}
