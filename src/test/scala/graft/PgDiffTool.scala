package graft

import org.apache.spark.sql.SparkSession

/** Manual differential harness: evaluates expression vectors from a
  * file (one pg expression per line) through the engine — Compat
  * rewrite + registered functions + the wire text encoder — and
  * writes `expr\t=>\tresult` lines for diffing against live
  * PostgreSQL output (see live-postgres-oracle notes). Run:
  *
  *   sbt "Test/runMain graft.PgDiffTool /tmp/diff_vectors.txt /tmp/engine_results.txt"
  *
  * Not a test: a scratch pg cluster isn't available on CI runs; the
  * curated divergence-free vectors get pinned into specs instead.
  */
object PgDiffTool {
  def main(args: Array[String]): Unit = {
    val in = args(0)
    val outPath = args(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    pgwire.PgFunctions.registerAll(spark)
    // the container JVM's default charset is POSIX — be explicit
    val vectors = scala.io.Source.fromFile(in)(scala.io.Codec.UTF8)
      .getLines().filter(_.trim.nonEmpty).toVector
    val out = new java.io.PrintWriter(outPath, "UTF-8")
    vectors.foreach { v =>
      val res =
        try {
          // the SAME path the live server runs: Compat rewrite +
          // PgSemantics plan pass + TIME tagging (Handlers.runSql)
          val df = pgwire.Handlers.runSql(spark, s"SELECT $v")
          if (sys.env.contains("SPARK_GRAFT_DIFF_NAMES"))
            df.schema.fieldNames.mkString("|") // RowDescription sweep mode
          else {
            val row = df.collect()(0)
            val f = df.schema.fields(0)
            pgwire.TextEncoder.encodeField(row.get(0), f, java.time.ZoneOffset.UTC)
              .getOrElse("<NULL>")
          }
        } catch {
          case e: Throwable =>
            "<ERR:" + Option(e.getMessage).getOrElse(e.getClass.getName)
              .replace("\n", " ").take(
                if (sys.env.contains("SPARK_GRAFT_DIFF_FULLERR")) 600 else 80) + ">"
        }
      out.println(v + "\t=>\t" + res.replace("\n", "\\n"))
      // optional third arg: also log the rewritten SQL for debugging
      if (args.length > 2)
        System.err.println("REWRITE: " + v + "  ==>  " +
          (try pgwire.Compat.rewrite(s"SELECT $v") catch { case e: Throwable => "<" + e.getMessage + ">" }))
    }
    out.close()
    spark.stop()
  }
}
