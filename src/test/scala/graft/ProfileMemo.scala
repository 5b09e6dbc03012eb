package graft

import org.apache.spark.sql.SparkSession

/** Micro-profile of PlanMemo.dataKey cost per query construction. */
object ProfileMemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
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
    for (i <- 1 to 6) {
      val t0 = System.nanoTime()
      val df = Tables.t(spark, sfDir, "embeddings")
      val t1 = System.nanoTime()
      val files = df.inputFiles
      val t2 = System.nanoTime()
      val h = df.queryExecution.analyzed.semanticHash()
      val t3 = System.nanoTime()
      val k = graft.operators.PlanMemo.dataKey(df)
      val t4 = System.nanoTime()
      println(f"iter $i: t ${(t1 - t0) / 1e6}%.1fms inputFiles ${(t2 - t1) / 1e6}%.1fms " +
        f"semanticHash ${(t3 - t2) / 1e6}%.1fms dataKey ${(t4 - t3) / 1e6}%.1fms " +
        s"(files=${files.length} h=$h k=${k.hashCode})")
    }
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val docs = Tables.t(spark, sfDir, "documents")
      val rep = graft.operators.DedupOps.portableSimhashCapReport(
        docs, "doc_id", "text", 64)
      val t1 = System.nanoTime()
      rep.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"capReport $i: build ${(t1 - t0) / 1e6}%.1fms exec ${(t2 - t1) / 1e6}%.1fms")
    }
    spark.stop()
  }
}
