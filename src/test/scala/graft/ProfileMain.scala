package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the scaling-bench build phase at a given core
  * count: sbt "Test/runMain graft.ProfileMain <cores> <pagesDir>".
  */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val pagesDir = args(1)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile/$cores] $label: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    import graft.extract.Extract
    import graft.graph.{Adjacency, GraphBuild}
    val pages = spark.read.parquet(pagesDir)
    t("read+scan")(pages.select(sum(length(col("text")))).collect())
    val chunks = Extract.chunks(pages, "text", Seq("url"))
    t("chunks count")(chunks.count())
    val triples = Extract.sentenceTriples(chunks)
    t("triples count")(triples.count())
    val edges = GraphBuild.factEdges(triples).persist()
    t("fact edges")(edges.count())
    val dict = graft.core.Ids.dictionary(
      edges.select(col("src").as("key")).unionAll(edges.select(col("dst").as("key"))), "key")
    val nV = t("dictionary")(dict.count())
    val arcs = Adjacency.encode(Adjacency.symmetrize(edges), dict)
    t("encode+collect")(graft.algo.PprShard.buildLocal(arcs, nV.toInt))
    spark.stop()
  }
}
