package graft

import graft.operators.LinkGraph
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Strongly connected components: hand graphs plus Tarjan brute-force
  * parity on a synthesized graph (the FW-BW coloring must agree with the
  * sequential classic on every node).
  */
class SccSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-scc")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def scc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    LinkGraph.stronglyConnectedComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("two cycles joined by a one-way bridge stay separate SCCs") {
    // 1->2->3->1 and 10->11->10, bridge 3->10 (one-way)
    val got = scc(Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 10L), (3L, 10L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a pure DAG yields singleton SCCs; self-loops are ignored") {
    val got = scc(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 3L)))
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("chain into a trap cycle: only the trap is multi-node") {
    // 1->2->3->4->5->3 : {3,4,5} is the spider trap
    val got = scc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 3L)))
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 3L, 5L -> 3L))
  }

  test("parity with sequential Tarjan on a synthesized 60-node graph") {
    val edges = (0L until 180L).flatMap { d =>
      val ring = (d % 60, (d - d % 6) % 60 + (d + 1) % 6)
      val cross = if (d % 3 == 0) Some(((d % 60), (d * 7 + 3) % 60)) else None
      Seq(ring) ++ cross
    }.filter { case (a, b) => a != b }.distinct
    val got = scc(edges)

    // sequential Tarjan, relabeled to min-member representatives
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val nodesAll = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val index = scala.collection.mutable.Map.empty[Long, Int]
    val low = scala.collection.mutable.Map.empty[Long, Int]
    val onStack = scala.collection.mutable.Set.empty[Long]
    val stack = scala.collection.mutable.Stack.empty[Long]
    val comp = scala.collection.mutable.Map.empty[Long, Long]
    var counter = 0
    def strongconnect(v: Long): Unit = {
      index(v) = counter; low(v) = counter; counter += 1
      stack.push(v); onStack += v
      adj.getOrElse(v, Seq.empty).foreach { w =>
        if (!index.contains(w)) { strongconnect(w); low(v) = math.min(low(v), low(w)) }
        else if (onStack(w)) low(v) = math.min(low(v), index(w))
      }
      if (low(v) == index(v)) {
        val members = scala.collection.mutable.Buffer.empty[Long]
        var w = -1L
        while ({ w = stack.pop(); onStack -= w; members += w; w != v }) ()
        val rep = members.min
        members.foreach(m => comp(m) = rep)
      }
    }
    nodesAll.foreach(v => if (!index.contains(v)) strongconnect(v))
    assert(got === comp.toMap)
    assert(got.keySet === nodesAll.toSet)
  }

  test("empty edge set settles to an empty result") {
    assert(scc(Seq.empty) === Map.empty)
  }
}
