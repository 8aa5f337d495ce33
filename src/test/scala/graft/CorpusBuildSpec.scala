package graft

import graft.operators.CorpusBuild
import graft.sources.ManifestTable
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot-materialized corpus build: stage-granular crash-safe resume
  * (the property session caches cannot give), stage lineage through the
  * manifest machinery, and parity with the cache-composed pipeline.
  */
class CorpusBuildSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-corpus-build")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("full build commits 4 stages; rerun reuses all of them with identical output") {
    val root = java.nio.file.Files.createTempDirectory("cb-full").toString
    val r1 = CorpusBuild.buildSnapshotted(spark, docs, root)
    assert(r1.stages.map(_.name) == Seq("gate", "dedup", "decontam", "sample"))
    assert(r1.stages.forall(!_.reused))
    val s1 = r1.summary.collect().map(_.toString).toSeq
    val r2 = CorpusBuild.buildSnapshotted(spark, docs, root)
    assert(r2.stages.forall(_.reused), s"rerun must reuse every stage: ${r2.stages}")
    assert(r2.stages.map(_.seq) == r1.stages.map(_.seq), "reuse must not commit new snapshots")
    assert(r2.summary.collect().map(_.toString).toSeq == s1)
  }

  test("crash between stages resumes: committed stages reused, missing stages recomputed") {
    val rootA = java.nio.file.Files.createTempDirectory("cb-crash").toString
    val full = CorpusBuild.buildSnapshotted(spark, docs, rootA)
    val fullRows = full.summary.collect().map(_.toString).toSeq
    // simulate a job killed after the dedup commit: decontam + sample
    // never published — remove their stage tables entirely
    for (stage <- Seq("decontam", "sample"))
      Fs.deleteRecursively(java.nio.file.Paths.get(s"$rootA/stage-$stage"))
    val resumed = CorpusBuild.buildSnapshotted(spark, docs, rootA)
    assert(resumed.stages.map(s => s.name -> s.reused) ==
      Seq("gate" -> true, "dedup" -> true, "decontam" -> false, "sample" -> false))
    // the surviving stages' snapshots are untouched (no recompute)
    assert(resumed.stages.take(2).map(_.seq) == full.stages.take(2).map(_.seq))
    assert(resumed.summary.collect().map(_.toString).toSeq == fullRows)
  }

  test("a stage killed MID-write (no published manifest) reruns cleanly") {
    val root = java.nio.file.Files.createTempDirectory("cb-midwrite").toString
    // partial stage directory with data junk but no published manifest =
    // what a crash inside the distributed write leaves behind
    val junk = java.nio.file.Paths.get(s"$root/stage-gate/data-00000")
    java.nio.file.Files.createDirectories(junk)
    java.nio.file.Files.write(junk.resolve("part-junk.parquet"), Array[Byte](1, 2, 3))
    val r = CorpusBuild.buildSnapshotted(spark, docs, root)
    assert(!r.stages.head.reused, "unpublished partial stage must recompute")
    assert(r.summary.collect().nonEmpty)
  }

  test("stage lineage: every stage is a real manifest table (snapshots + integrity)") {
    val root = java.nio.file.Files.createTempDirectory("cb-lineage").toString
    CorpusBuild.buildSnapshotted(spark, docs, root)
    for (stage <- Seq("gate", "dedup", "decontam", "sample")) {
      val sroot = s"$root/stage-$stage"
      assert(ManifestTable.snapshots(sroot).nonEmpty, s"$stage: no published snapshot")
      val reports = ManifestTable.verifyIntegrity(spark, sroot)
      assert(reports.nonEmpty && reports.forall(_.ok), s"$stage: integrity check failed")
    }
    // monotone refinement: each stage keeps a subset of the previous
    val counts = Seq("gate", "dedup", "decontam", "sample")
      .map(st => CorpusBuild.docsFromStage(spark, root, st).count())
    assert(counts == counts.sorted.reverse, s"stages must refine: $counts")
  }
}
