package graft
import org.apache.spark.sql.SparkSession

// temporary r18 profiling probe — where does the minhash signature
// pass spend its time? (raw compute+encode vs cache write vs reads)
object SigProbe {
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
    val docs = Tables.t(spark, sfDir, "documents")
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-34s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val m = classOf[graft.operators.DedupOps.type]
    val sigRows = graft.operators.DedupOps.getClass.getDeclaredMethods
      .find(_.getName == "signatureRows").get
    sigRows.setAccessible(true)
    def sig() = sigRows.invoke(graft.operators.DedupOps, docs, "doc_id", "text",
      Integer.valueOf(3), Integer.valueOf(16)).asInstanceOf[org.apache.spark.sql.DataFrame]
    time("sig noop (compute+encode)") {
      sig().write.format("noop").mode("overwrite").save()
    }
    time("sig sig-only noop") {
      sig().select("doc_id", "sig").write.format("noop").mode("overwrite").save()
    }
    time("sig persist+count+unpersist") {
      val p = sig().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p.unpersist(true)
    }
    time("sig localCheckpoint(eager)") {
      val p = sig().localCheckpoint(true)
      p.count()
    }
    time("sig persist + 3 reads") {
      val p = sig().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count()
      p.select("doc_id", "sig").write.format("noop").mode("overwrite").save()
      p.select("doc_id", "shingles").write.format("noop").mode("overwrite").save()
      p.unpersist(true)
    }
    spark.stop()
  }
}
