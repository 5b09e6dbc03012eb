package graft

/** Manual stemmer differential (like PgDiffTool): compares
  * TextSearch.stem against a live-pg `ts_lexize('english_stem', w)`
  * capture (word\tstem per line). Not a test — the capture file is
  * sweep-session-local.
  */
object TsStemDiff {
  def main(args: Array[String]): Unit = {
    val lines = scala.io.Source.fromFile(args(0)).getLines().toVector
    var bad = 0
    lines.foreach { l =>
      val parts = l.split("\t")
      if (parts.length == 2) {
        val (w, want) = (parts(0), parts(1))
        val got = if (want == "<STOP?>") "<STOP?>"
          else graft.functions.TextSearch.stem(w)
        if (got != want) {
          bad += 1
          if (bad <= 40) println(s"DIFF $w: live=$want got=$got")
        }
      }
    }
    println(s"${lines.length} words, $bad diffs")
  }
}

/** [[TsStemDiff]] for the non-english Snowball ports: args =
  * (config-name, capture-file). Capture lines: word\tstem, with
  * <STOP> for a stop word (empty ts_lexize array). */
object TsStemDiffLang {
  def main(args: Array[String]): Unit = {
    val Some((stop, stemFn)) = graft.functions.SnowballStems.byConfig(args(0))
    val lines = scala.io.Source.fromFile(args(1))(scala.io.Codec.UTF8)
      .getLines().toVector
    // diffs go to a UTF-8 side file — the container stdout is POSIX
    val diffOut = new java.io.PrintWriter(args(1) + ".diff", "UTF-8")
    var bad = 0
    lines.foreach { l =>
      val parts = l.split("\t")
      if (parts.length == 2) {
        val (w, want) = (parts(0), parts(1))
        val got = if (stop.contains(w)) "<STOP>" else stemFn(w)
        if (got != want) {
          bad += 1
          if (bad <= 500) diffOut.println(s"DIFF $w: live=$want got=$got")
        }
      }
    }
    diffOut.close()
    println(s"${lines.length} words, $bad diffs")
  }
}
