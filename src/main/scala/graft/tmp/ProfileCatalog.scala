package graft.tmp

import org.apache.spark.sql.SparkSession
import graft.{Tables, pgwire}

// throwaway profiling main — not part of the library
object ProfileCatalog {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConfs)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.register(spark, "/root/testdata/sf0.1")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    t("registerStatic")(pgwire.PgCatalog.registerStatic(spark))
    t("refresh")(pgwire.PgCatalog.refresh(spark))
    t("q72 sql")(spark.sql(
      "SELECT CAST(oid AS INT) AS oid, relname FROM pg_class ORDER BY relname").collect())
    t("q72 sql again")(spark.sql(
      "SELECT CAST(oid AS INT) AS oid, relname FROM pg_class ORDER BY relname").collect())
    t("registerStatic again")(pgwire.PgCatalog.registerStatic(spark))
    spark.stop()
  }
}
