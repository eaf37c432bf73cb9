package graft

/** Regenerate the committed q27 golden parquet (the driver-facing value
  * oracle for the tol-CONVERGED PPR query — round-3 verdict ask #4).
  *
  *   sbt "Test/runMain graft.GenQ27Golden"
  *
  * Writes one single-file parquet directory per sf under
  * src/test/resources/goldens/q27_sf*.parquet. The q27 oracle SQL
  * ([[graft.entry.Oracles]]) reads these via DuckDB `read_parquet`,
  * dispatching on a fingerprint of the `documents` table — so the driver
  * hash-compares the live q27 output against this committed artifact.
  * Provenance / independence: `scripts/check_q27_golden.py` re-derives
  * the graph in DuckDB (the same SQL the q06/q07 oracles validate) and
  * recomputes the converged PPR with networkx — run it after
  * regenerating; PprSpec additionally pins the live query to the golden
  * inside `sbt test`.
  */
object GenQ27Golden {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val out = "src/test/resources/goldens"
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val df = graft.entry.DocQueries.qPpr(spark, s"/root/testdata/$sf")
      df.coalesce(1).write.mode("overwrite").parquet(s"$out/q27_$sf.parquet")
      println(s"q27 golden $sf: ${spark.read.parquet(s"$out/q27_$sf.parquet").count()} rows")
    }
    spark.stop()
  }
}
