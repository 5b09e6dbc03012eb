package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-generated TPC-H-ish testdata
  * (see TESTDATA.md / FIXTURES.md §2). Tables are registered as temp
  * views so queries can be expressed in plain Spark SQL — mirroring
  * the reference's model of a catalog of registered file-backed tables
  * (reference: datafusion-postgres-cli/src/main.rs:132-182 registers
  * CSV/JSON/Parquet/Avro files as named tables).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table as a DataFrame.
    *
    * `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 rejects
    * ([PARQUET_TYPE_ILLEGAL]); read it as long ns (legacy conf) and
    * rebuild a timestamp at micro precision. Integer `DIV` keeps the
    * ns→µs conversion exact (a double division would lose precision
    * above 2^53 ns).
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every testdata table as a temp view named after it.
    * Lazy (schema-read only) — no data is scanned until an action runs,
    * so per-query registration costs only parquet footer reads.
    */
  def register(spark: SparkSession, dir: String): Unit =
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
