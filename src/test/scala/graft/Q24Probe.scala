package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolate the q24 star-CC wall at a given sf (round-4 verdict #1: the
  * committed BENCH_r04 doubled q24 vs r3 while BASELINE.md claimed flat).
  * Times, per rep: star CC with pre-contraction (the shipping default),
  * star CC without it, and min-label CC (the r3 implementation) — same
  * session config as the bench headline.
  *
  * sbt "Test/runMain graft.Q24Probe <sfDir> [reps]"
  */
object Q24Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "512k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[q24probe] $label: $w%.2fs")
      w
    }
    t("cache warm")(graft.entry.DocQueries.warmSharedCaches(spark, sfDir))
    t("q24 as benched (first)")(
      SparkEntry.queries("q24_connected_components")(spark, sfDir)
        .write.mode("overwrite").format("noop").save())
    // Decomposed variants on the same cached arcs/vertices.
    val m = graft.entry.DocQueries.getClass.getDeclaredMethods
    def priv(name: String) = {
      val mm = m.find(_.getName == name).get; mm.setAccessible(true); mm
    }
    val arcs = priv("entityArcs").invoke(graft.entry.DocQueries, spark, sfDir)
      .asInstanceOf[org.apache.spark.sql.DataFrame]
    val verts = priv("entityVertices").invoke(graft.entry.DocQueries, spark, sfDir)
      .asInstanceOf[org.apache.spark.sql.DataFrame]
    println(s"[q24probe] arcs=${arcs.count()} verts=${verts.count()}")
    for (r <- 1 to reps) {
      t(s"star preContract=true  rep$r") {
        val (l, it) = graft.algo.ConnectedComponents.run(arcs, verts)
        l.write.mode("overwrite").format("noop").save()
        println(s"[q24probe]   rounds=$it")
      }
      t(s"star preContract=false rep$r") {
        val (l, it) = graft.algo.ConnectedComponents.run(arcs, verts, preContract = false)
        l.write.mode("overwrite").format("noop").save()
        println(s"[q24probe]   rounds=$it")
      }
      t(s"min-label              rep$r") {
        val (l, _) = graft.algo.ConnectedComponents.runMinLabel(arcs, verts)
        l.write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
