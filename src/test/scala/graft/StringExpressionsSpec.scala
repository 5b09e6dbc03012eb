package graft

import graft.functions.StringExpressions
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** `lev_banded(a, b, k)` must be exactly `levenshtein(a, b)` capped at
  * k+1 — pinned against Spark's own levenshtein over pseudo-random
  * string pairs, on both codegen and interpreted paths.
  */
class StringExpressionsSpec extends SparkSpec {
  import spark.implicits._

  StringExpressions.install(spark)

  // deterministic pseudo-random word-ish strings over a tiny alphabet
  // (small alphabet => frequent near-matches at every distance)
  private def rndStr(seed: Long): String = {
    val len = (seed % 13 + 3).toInt
    val sb = new StringBuilder
    var h = seed * 2654435761L
    (0 until len).foreach { _ =>
      h = h * 6364136223846793005L + 1442695040888963407L
      sb.append(('a' + math.floorMod(h >> 33, 4)).toChar)
    }
    sb.toString
  }

  test("lev_banded equals levenshtein capped at k+1 (static function)") {
    for (k <- Seq(0, 1, 2, 5); i <- 0 until 60) {
      val a = rndStr(i * 7 + 1); val b = rndStr(i * 11 + 5)
      val full = org.apache.commons.text.similarity.LevenshteinDistance
        .getDefaultInstance.apply(a, b)
      val got = StringExpressions.levBanded(
        UTF8String.fromString(a), UTF8String.fromString(b), k)
      assert(got === math.min(full, k + 1), s"a=$a b=$b k=$k")
    }
  }

  test("lev_banded: non-ASCII decode path and prefix/suffix stripping agree") {
    val lev = org.apache.commons.text.similarity.LevenshteinDistance.getDefaultInstance
    def check(a: String, b: String, k: Int): Unit =
      assert(StringExpressions.levBanded(
        UTF8String.fromString(a), UTF8String.fromString(b), k) ===
        math.min(lev.apply(a, b), k + 1), s"a=$a b=$b k=$k")
    // non-ASCII forces the char path; mixed pairs exercise both probes
    check("café", "cafe", 2)
    check("grün", "gruen", 3)
    check("日本語", "日本", 2)
    check("naïve", "naive", 1)
    // shared-prefix/suffix heavy (the blocked-join hot case)
    check("goldenrod lavender spring chocolate lace",
      "goldenrod lavender sprint chocolate lace", 2)
    check("identical string", "identical string", 2)
    check("prefix-only-differs-x", "prefix-only-differs-y", 0)
    check("abc", "abcabc", 2)
  }

  test("lev_banded agrees with Spark's levenshtein through SQL, both paths") {
    val pairs = (0 until 40).map(i => (rndStr(i * 3 + 2), rndStr(i * 5 + 9)))
      .toDF("a", "b")
    def run(): Seq[(Int, Int)] = pairs
      .select(call_function("lev_banded", $"a", $"b", lit(2)).as("banded"),
        least(levenshtein($"a", $"b"), lit(3)).as("capped"))
      .as[(Int, Int)].collect().toSeq
    val withCodegen = run()
    withCodegen.foreach { case (banded, capped) => assert(banded === capped) }
    val key = "spark.sql.codegen.factoryMode"
    try {
      spark.conf.set(key, "NO_CODEGEN")
      assert(run() === withCodegen)
    } finally spark.conf.unset(key)
  }

  test("negative / overflowing / NULL threshold rejected at analysis time") {
    val df = Seq(("abc", "abd")).toDF("a", "b")
    for (bad <- Seq(lit(-1), lit(Int.MaxValue), lit(null).cast("int"))) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        df.select(call_function("lev_banded", $"a", $"b", bad)).collect()
      }
      assert(e.getMessage.contains("threshold"), s"for $bad: ${e.getMessage}")
    }
    // boundary: k = 0 stays legal (exact-match-or-1 semantics)
    val ok = df.select(call_function("lev_banded", $"a", $"b", lit(0)))
      .collect().head.getInt(0)
    assert(ok === 1)
  }

  test("NULL input and edge strings") {
    val df = Seq((null.asInstanceOf[String], "abc"), ("abc", null),
      ("", ""), ("", "abc"), ("same", "same")).toDF("a", "b")
    val got = df.select(call_function("lev_banded", $"a", $"b", lit(2)))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(got.toSeq === Seq(None, None, Some(0), Some(3), Some(0)))
  }
}
