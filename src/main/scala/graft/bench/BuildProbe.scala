package graft.bench

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.{Adjacency, GraphBuild}

/** Stage-level diagnosis of the pages→edges build phase: which stages run
  * with how many tasks and how much task-time at 8 vs 32 cores — the
  * build phase's poor thread scaling has to be explained per-stage.
  */
object BuildProbe {

  private final class StageLog extends SparkListener {
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long, Long, Long)]
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val i = sc.stageInfo
      val wall = i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
      rows += ((i.stageId, i.numTasks, wall,
        i.taskMetrics.executorRunTime, i.taskMetrics.jvmGCTime))
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    for (cores <- Seq(8, 32)) {
      val s = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"build-probe-$cores")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "512k")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      val log = new StageLog
      s.sparkContext.addSparkListener(log)
      val t0 = System.nanoTime()
      val pages = s.read.parquet(s"$dir/pages")
      val chunks = graft.extract.Extract.chunks(pages, "text", Seq("url"))
      val triples = graft.extract.Extract.sentenceTriples(chunks)
      if (args.length > 1 && args(1) == "narrow") {
        // regex extraction only, NO shuffle write — isolates the
        // extraction compute from the shuffle/memory-manager path
        println(s"triples=${triples.count()}")
        val wallN = (System.nanoTime() - t0) / 1e9
        println(f"cores=$cores narrowWall=$wallN%.1fs")
        Thread.sleep(500)
        log.rows.foreach { case (id, n, w, run, gc) =>
          if (w > 300) println(f"  stage=$id%3d tasks=$n%4d wall=${w / 1e3}%7.2fs taskTime=${run / 1e3}%8.2fs gc=${gc / 1e3}%7.2fs")
        }
        s.stop()
      } else {
      val edges = GraphBuild.factEdges(triples)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"edges=${edges.count()}")
      val dict = graft.core.Ids.dictionary(
        edges.select(col("src").as("key"))
          .unionAll(edges.select(col("dst").as("key"))), "key")
      val nV = dict.count()
      val arcs = Adjacency.encode(Adjacency.symmetrize(edges), dict)
      val csr = graft.algo.PprShard.buildLocal(arcs, nV.toInt)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"cores=$cores wall=$wall%.1fs nV=$nV arcs=${csr.nEdges}")
      Thread.sleep(500)
      log.rows.foreach { case (id, n, w, run, gc) =>
        if (w > 300) println(f"  stage=$id%3d tasks=$n%4d wall=${w / 1e3}%7.2fs taskTime=${run / 1e3}%8.2fs gc=${gc / 1e3}%7.2fs")
      }
      s.stop()
      }
    }
  }
}
