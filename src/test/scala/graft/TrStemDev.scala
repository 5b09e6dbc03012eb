package graft

/** Turkish Snowball stemmer development harness: stems
  * /tmp/tr/vocab.txt and diffs against sys.env.getOrElse("TR_EXPECTED", "/tmp/tr/expected_lib.tsv")
  * (libstemmer 2.2 == pg 15 on the whole probe vocabulary).
  *
  *   sbt "Test/runMain graft.TrStemDev [maxPrint]"
  */
object TrStemDev {

  import graft.functions.SnowballStems.{turkishStem => stem}

  def main(args: Array[String]): Unit = {
    if (args.length == 2 && args(0) == "-w") {
      println(args(1) + " -> " + stem(args(1)))
      return
    }
    val maxPrint = args.headOption.map(_.toInt).getOrElse(40)
    val expected = scala.io.Source.fromFile(
      sys.env.getOrElse("TR_EXPECTED", "/tmp/tr/expected_lib.tsv"))(
      scala.io.Codec.UTF8).getLines().map { l =>
      val Array(w, s) = l.split("\t", 2); (w, s)
    }.toVector
    var bad = 0
    val out = new java.io.PrintWriter(
      new java.io.OutputStreamWriter(
        new java.io.FileOutputStream("/tmp/tr/diffs.txt"), "UTF-8"))
    expected.foreach { case (w, want) =>
      val got = stem(w)
      if (got != want) {
        bad += 1
        out.println(s"$w\twant=$want\tgot=$got")
      }
    }
    out.close()
    println(s"DIFFS: $bad / ${expected.size} (details: /tmp/tr/diffs.txt, showing $maxPrint)")
  }
}
