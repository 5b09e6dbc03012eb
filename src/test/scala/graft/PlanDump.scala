package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for every declared query to a
  * directory (one file per query) — the optimization rounds' plan
  * evidence. Usage:
  *   sbt "Test/runMain graft.PlanDump /root/testdata/sf0.1 plans/r18/all"
  * Queries whose construction EXECUTES eagerly (localCheckpoint
  * gates, driver union-find) dump the plan of the returned frame —
  * for those the stage evidence lives in ProfileQuery output instead.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "plans/all"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConfs)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (q <- SparkEntry.all) {
      try {
        val df = q.run(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, q.name + ".txt"), plan)
        println(s"ok ${q.name}")
      } catch {
        case e: Throwable => println(s"ERR ${q.name}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
