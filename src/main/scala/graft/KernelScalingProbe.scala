package graft
import graft.fixtures.CorpusGen
import graft.operators.ExtractKernel
import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

object KernelScalingProbe {
  def run(pages: Array[Page], threads: Int): Double = {
    val pool = Executors.newFixedThreadPool(threads)
    val idx = new AtomicLong(0)
    val sink = new AtomicLong(0)
    val t0 = System.nanoTime()
    (0 until threads).foreach { _ =>
      pool.submit(new Runnable {
        def run(): Unit = {
          var i = idx.getAndIncrement()
          while (i < pages.length) {
            sink.addAndGet(ExtractKernel.extractOne(pages(i.toInt)).text.length.toLong)
            i = idx.getAndIncrement()
          }
        }
      })
    }
    pool.shutdown(); pool.awaitTermination(600, TimeUnit.SECONDS)
    (System.nanoTime() - t0) / 1e9
  }
  def main(args: Array[String]): Unit = {
    val n = 20000
    println("generating...")
    val pages = (0 until n).map(i => CorpusGen.page(i.toLong)).toArray
    val bytes = pages.map(_.html.length.toLong).sum
    println(s"n=$n bytes=${bytes/1e6}MB")
    Seq(1, 8, 32, 8, 32).foreach { t =>
      val times = (1 to 3).map(_ => run(pages, t))
      println(f"THREADS=$t times=${times.map(x=>f"$x%.2f").mkString(",")} best_mbps=${bytes/1e6/times.min}%.1f")
    }
  }
}
