package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("corpus JSON loader: title\\ntext doc shape (main.py:76-81)") {
    val dir = Files.createTempDirectory("corpus").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/corpus.json"),
      """[{"title": "A", "text": "alpha beta"}, {"title": "B", "text": "gamma"}]""")
    val docs = CorpusJson.loadCorpus(spark, s"$dir/corpus.json")
      .as[String].collect().sorted
    assert(docs.toSeq == Seq("A\nalpha beta", "B\ngamma"))
  }

  test("openie stats: avg entity chars/words (HippoRAG.py:1125-1134)") {
    val ce = Seq(("c1", "new york"), ("c1", "usa"), ("c2", "usa"))
      .toDF("chunk_id", "entity")
    val row = CorpusJson.openieStats(ce).collect().head
    assert(math.abs(row.getAs[Double]("avg_ent_chars") - (8 + 3 + 3) / 3.0) < 1e-12)
    assert(math.abs(row.getAs[Double]("avg_ent_words") - (2 + 1 + 1) / 3.0) < 1e-12)
  }

  test("IRCoT merged ranking: max over steps then re-sort (HippoRAG.py:540-547)") {
    val steps = Seq(
      (0L, "d1", 0.9), (0L, "d2", 0.5), // step 1
      (0L, "d2", 0.8), (0L, "d3", 0.7)  // step 2
    ).toDF("qid", "chunk_id", "score")
    val merged = graft.retrieve.Retriever.ircotMerge(steps, topK = 2).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("chunk_id"))).sorted
    assert(merged.toSeq == Seq((1, "d1"), (2, "d2")))
  }
}
