package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query profiler: times one SparkEntry query N times on a
  * given sf dir and prints the formatted physical plan. Usage:
  *   sbt "Test/runMain graft.ProfileQuery q87_url_domains /root/testdata/sf0.1 [runs]"
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConfs)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for { s <- i.submissionTime; c <- i.completionTime } yield c - s).getOrElse(-1L)
        stages.add(f"stage ${i.stageId} tasks=${i.numTasks} wall=${wall}ms " +
          f"exec=${i.taskMetrics.executorRunTime}ms " +
          i.name.takeWhile(_ != '\n').take(60))
      }
    })
    for (name <- names) {
      println(s"\n===== $name =====")
      val q = SparkEntry.queries(name)
      val df = q(spark, sfDir)
      println("=== formatted plan ===")
      df.explain("formatted")
      for (i <- 1 to runs) {
        stages.clear()
        val t0 = System.nanoTime()
        val t1 = System.nanoTime()
        val built = q(spark, sfDir)
        val tBuild = (System.nanoTime() - t1) / 1e9
        // same sink as Bench: noop write re-evaluates everything without
        // paying driver-side collect deserialization
        built.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(100)
        println(f"run $i: $dt%.3f s (build $tBuild%.3f)")
        if (i == runs) stages.forEach(s => println("  " + s))
      }
    }
    spark.stop()
  }
}
