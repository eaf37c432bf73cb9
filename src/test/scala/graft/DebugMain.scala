package graft

/** Scratch main for quick query debugging: sbt "Test/runMain graft.DebugMain <name> <sfDir>". */
object DebugMain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = TestSpark.spark
    val df = if (name == "entry") SparkEntry.entry(spark)
             else SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    df.show(20, truncate = false)
    println(s"rows=${df.count()}")
    spark.stop()
  }
}
