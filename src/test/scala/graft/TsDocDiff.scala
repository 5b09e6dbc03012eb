package graft

/** Manual document-scale differential: to_tsvector('english', text)
  * over real `documents` rows vs a live-pg capture
  * (doc_id\ttsvector per line). Not a test — capture is
  * sweep-session-local.
  */
object TsDocDiff {
  def main(args: Array[String]): Unit = {
    val captureFile = args(0)
    val parquet = args(1)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(parquet)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    var bad = 0
    var n = 0
    scala.io.Source.fromFile(captureFile)(scala.io.Codec.UTF8).getLines().foreach { l =>
      val Array(id, want) = l.split("\t", 2)
      n += 1
      val got = graft.functions.TextSearch.toTsVector("english", docs(id.toLong)).render
      if (got != want) {
        bad += 1
        if (bad <= 10) println(s"DIFF doc $id:\n  live: $want\n  got:  $got")
      }
    }
    println(s"$n docs, $bad diffs")
    spark.stop()
  }
}
