package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Goldens, SparkSpec}
import graft.graph.Adjacency

class GraphAlgoSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): (Goldens.Golden, DataFrame, DataFrame) = {
    val g = Goldens.load(name)
    val arcs = Adjacency.symmetrize(g.edges.toDF("src", "dst", "weight"))
    val vertices = (0L until g.nVertices.toLong).toDF("vid")
    (g, arcs, vertices)
  }

  for (name <- Goldens.all) {
    test(s"connected components exact vs networkx [$name]") {
      val (g, arcs, vertices) = fixture(name)
      val (labels, _) = ConnectedComponents.run(arcs, vertices)
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (v <- 0 until g.nVertices)
        assert(got(v.toLong) == g.cc(v), s"vid=$v")
    }

    test(s"synchronous min-label LPA exact vs oracle [$name]") {
      val (g, arcs, vertices) = fixture(name)
      val (labels, _) = LabelProp.run(arcs, vertices, maxIter = 20)
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (v <- 0 until g.nVertices)
        assert(got(v.toLong) == g.lpa(v), s"vid=$v")
    }

    test(s"triangle count exact vs networkx [$name]") {
      val (g, arcs, vertices) = fixture(name)
      val (perVertex, total) = Triangles.run(arcs, vertices)
      assert(total == g.triTotal)
      val got = perVertex.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (v <- 0 until g.nVertices)
        assert(got(v.toLong) == g.triPerVertex(v), s"vid=$v")
    }
  }

  test("CC is invariant to partition count") {
    val (_, arcs, vertices) = fixture("chain")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def runWith(p: String) = {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      try ConnectedComponents.run(arcs, vertices)._1.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    assert(runWith("2") == runWith("16"))
  }
}
