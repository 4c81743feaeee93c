package graft

import org.apache.spark.sql.functions._

import graft.ann.{IvfIndex, KnnGraph}
import graft.core.{CollectionConfig, Metric}
import graft.prepare.Prepare

/** kNN graph construction: exact vs IVF-blocked equivalence, partial
  * probing on clustered data, and the no-cartesian plan shape. */
class KnnGraphSpec extends SparkSpec {

  private val config = CollectionConfig("g", 4, Metric.Cosine)

  private def coll(rows: Seq[(String, Array[Float])]) =
    Prepare.prepareEmbeddings(embeddingRows(rows), config)

  private val rng = new scala.util.Random(11)
  private val clustered = (0 until 40).map { i =>
    val c = Array.tabulate(4)(d => if (d == i % 4) 10f else 0f)
    (f"v$i%02d", c.map(x => x + rng.nextFloat() * 0.2f))
  }

  test("ivf at full probes == exact, row for row; self excluded") {
    val df = coll(clustered).persist()
    val cents = IvfIndex.train(df, config, IvfIndex.IvfConfig(k = 4, iterations = 5))
    val e = KnnGraph.exact(df, config, 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val f = KnnGraph.ivf(df, config, cents, 3, nprobe = 4).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(e === f)
    assert(!e.exists(t => t._1 == t._2))
    assert(e.count(_._3 == 1) === 40) // every row has a nearest neighbor
    df.unpersist()
  }

  test("partial probes on clustered data: neighbors stay in-cluster") {
    val df = coll(clustered).persist()
    val cents = IvfIndex.train(df, config, IvfIndex.IvfConfig(k = 4, iterations = 5))
    val g = KnnGraph.ivf(df, config, cents, 3, nprobe = 1).collect()
    // with one probe per row, every returned neighbor shares the row's
    // axis cluster (clusters are axis-aligned and well separated)
    g.foreach { r =>
      val qi = r.getString(0).drop(1).toInt % 4
      val ni = r.getString(1).drop(1).toInt % 4
      assert(qi === ni, s"${r.getString(0)} -> ${r.getString(1)} crossed clusters")
    }
    // and the graph still covers every row
    assert(g.map(_.getString(0)).distinct.length === 40)
    df.unpersist()
  }

  test("ivf path plans a cell hash-join, not a cartesian product") {
    val df = coll(clustered)
    val cents = IvfIndex.train(df, config, IvfIndex.IvfConfig(k = 4, iterations = 3))
    val plan = KnnGraph.ivf(df, config, cents, 3, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    val exactPlan = KnnGraph.exact(df, config, 3)
      .queryExecution.executedPlan.toString
    // the exact path IS the documented n^2 tool — cartesian expected
    assert(exactPlan.contains("CartesianProduct") || exactPlan.contains("BroadcastNestedLoopJoin"))
  }
}
