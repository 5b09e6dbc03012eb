package graft

/** Manual randomized DML differential (like PgDiffTool): replays a
  * statement script against the engine's wire path and prints the
  * full table state after every mutating statement, for diffing
  * against live PostgreSQL executing the same script. Script lines:
  * one SQL statement per line; lines starting with `?` dump the
  * state (`SELECT * FROM <table> ORDER BY 1,2,3…` by position).
  *
  *   sbt "Test/runMain graft.PgDmlDiffTool script.sql out.txt"
  */
object PgDmlDiffTool {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConfs)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.pgwire.PgFunctions.registerAll(spark)
    val server = new graft.pgwire.PgServer(spark)
    server.start()
    val c = new Client(server.boundPort)
    c.startup()
    val out = new java.io.PrintWriter(args(1), "UTF-8")
    scala.io.Source.fromFile(args(0))(scala.io.Codec.UTF8).getLines()
      .filter(_.trim.nonEmpty).foreach { line =>
        if (line.startsWith("?")) {
          val table = line.drop(1).trim
          val r = c.query(s"SELECT * FROM $table")
          if (r.errors.nonEmpty) out.println(s"STATE $table ERR ${r.errors.head._1}")
          else {
            val rows = r.rows.map(_.map(_.getOrElse("\\N")).mkString("|")).sorted
            out.println(s"STATE $table ${rows.size}")
            rows.foreach(out.println)
          }
        } else if (line.startsWith(">")) {
          // `><dml> RETURNING …`: dump sorted RETURNING rows + the tag
          val r = c.query(line.drop(1).trim)
          if (r.errors.nonEmpty) out.println(s"ROWS ERR ${r.errors.head._1}")
          else {
            val rows = r.rows.map(_.map(_.getOrElse("\\N")).mkString("|")).sorted
            out.println(s"ROWS ${rows.size}")
            rows.foreach(out.println)
            out.println(s"TAG ${r.tags.headOption.getOrElse("OK")}")
          }
        } else if (line.startsWith("!")) {
          // `!<query>`: dump the query's sorted rows (catalog probes)
          val r = c.query(line.drop(1).trim)
          if (r.errors.nonEmpty) out.println(s"Q ERR ${r.errors.head._1}")
          else {
            val rows = r.rows.map(_.map(_.getOrElse("\\N")).mkString("|")).sorted
            out.println(s"Q ${rows.size}")
            rows.foreach(out.println)
          }
        } else {
          val r = c.query(line)
          val tag = r.tags.headOption.getOrElse(
            r.errors.headOption.map("ERR " + _._1).getOrElse(
              if (r.rows.nonEmpty) s"ROWS ${r.rows.size}" else "OK"))
          out.println(s"TAG $tag")
        }
      }
    out.close()
    c.close(); server.stop(); spark.stop()
  }
}
