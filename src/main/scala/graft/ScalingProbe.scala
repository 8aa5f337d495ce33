package graft
import graft.operators.ExtractKernel
import graft.sources.Corpus
import org.apache.spark.sql.SparkSession
object ScalingProbe {
  def t[T](f: => T): Double = { val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
  def main(args: Array[String]): Unit = {
    val c = sys.env.getOrElse("PROBE_CORES", "32").toInt
    val s = SparkSession.builder().master(s"local[$c]").appName(s"probe$c")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val pages = Corpus.benchPages(s, "/root/testdata/sf0.1")._1
    val gcBefore = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    def gcTime = { import scala.jdk.CollectionConverters._; gcBefore.asScala.map(_.getCollectionTime).sum }
    val times = (1 to 5).map { _ =>
      val g0 = gcTime
      val w = t(ExtractKernel.extract(pages).count())
      val g1 = gcTime
      f"$w%.2f(gc ${(g1-g0)/1000.0}%.1f)"
    }
    println(s"CORES=$c extract=${times.mkString(",")}")
    s.stop()
  }
}
