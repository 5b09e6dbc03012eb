package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

// temporary profiling harness — not part of the library surface
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(), j.stageInfos.map(_.numTasks).sum))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.get(j.jobId)
        if (s != null) jobs.put(j.jobId, (s._1, System.nanoTime(), s._2))
      }
    })
    val name = args(0)
    val fn = SparkEntry.queries(name)
    // warm run
    fn(spark, sfDir).collect()
    for (i <- 1 to 3) {
      val c0 = System.nanoTime()
      fn(spark, sfDir)
      println(f"  construct#$i ${(System.nanoTime() - c0) / 1e9}%.3f")
    }
    {
      val e0 = System.nanoTime()
      org.apache.spark.sql.Encoders.product[(Long, String, Long, Long, Long)]
      println(f"  encoder-derive ${(System.nanoTime() - e0) / 1e9}%.3f")
    }
    Thread.sleep(300)
    jobs.clear()
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    val tc = System.nanoTime()
    df.queryExecution.executedPlan // force analysis+optimization+planning
    val tp = System.nanoTime()
    df.collect()
    val t1 = System.nanoTime()
    println(f"construct ${(tc - t0) / 1e9}%.3f  plan ${(tp - tc) / 1e9}%.3f  exec ${(t1 - tp) / 1e9}%.3f")
    Thread.sleep(300)
    println(f"TOTAL ${(t1 - t0) / 1e9}%.3f s")
    import scala.jdk.CollectionConverters._
    jobs.asScala.toSeq.sortBy(_._1).foreach { case (id, (s, e, nt)) =>
      println(f"  job $id%3d  ${(e - s) / 1e9}%.3f s  tasks=$nt  offset=${(s - t0) / 1e9}%.3f")
    }
    if (args.length > 1 && args(1) == "explain") df.explain("formatted")
    spark.stop()
  }
}
