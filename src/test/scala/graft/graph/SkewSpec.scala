package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSum == plain groupBy sum on a Zipf-skewed key distribution") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 20000).map { _ =>
      val k = if (rnd.nextDouble() < 0.6) "hub" else s"k${rnd.nextInt(50)}"
      (k, rnd.nextInt(10).toDouble)
    }.toDF("key", "v")
    val plain = rows.groupBy("key").agg(sum("v").as("sum(v)"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(rows, Seq("key"), "v", salts = 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(plain.keySet == salted.keySet)
    plain.foreach { case (k, v) =>
      assert(math.abs(v - salted(k)) < 1e-6, s"key=$k")
    }
  }

  test("degree histogram exposes the synthetic corpus hub skew") {
    val pages = graft.ingest.PageSynth.pagesDF(spark, 2000)
    val triples = graft.extract.Extract.sentenceTriples(
      graft.extract.Extract.chunks(pages, "text", Seq("url")))
    val arcs = Adjacency.symmetrize(GraphBuild.factEdges(triples))
    val hist = Skew.degreeHistogram(arcs).collect()
    // Zipf vocabulary: the max bucket must be well above the min bucket
    // (i.e. hubs exist and the salting paths are actually exercised).
    val buckets = hist.map(_.getAs[Long]("bucket"))
    assert(buckets.max - buckets.min >= 3, s"no skew? ${hist.mkString(", ")}")
  }
}
