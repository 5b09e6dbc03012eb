package graft

import java.nio.ByteBuffer
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.pgwire.{BinaryEncoder, Compat, PgFunctions, TextEncoder}

/** Property-based hardening of the codec/compat invariants:
  * round-trips that must hold for EVERY input, not just the fixture
  * matrix (complements CodecSpec/CompatSpec). Deterministic seed —
  * no scalatest-scalacheck bridge in the pinned env, so samples are
  * drawn directly from Gen.
  */
class PropertySpec extends AnyFunSuite {

  private def forSamples[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default.withSize(40)
    var seed = Seed(42L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 10) {
      gen.apply(params, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(produced > n / 2, s"generator too sparse: $produced of $n")
  }

  test("tokenize → render is the identity on arbitrary strings") {
    // the rewriter's soundness depends on lossless tokenization
    forSamples(Gen.asciiPrintableStr) { s =>
      assert(Compat.render(Compat.tokenize(s)) === s)
    }
  }

  test("tokenize → render is the identity on SQL-shaped text") {
    val sqlish = for {
      kw <- Gen.oneOf("SELECT", "FROM t WHERE", "ORDER BY", "GROUP BY")
      id <- Gen.identifier
      lit <- Gen.oneOf("'a''b'", "42", "1.5e-3", "\"Q id\"", "/* b */", "$1")
      op <- Gen.oneOf("=", "<>", "::", "~", "||", ",", "!~*")
    } yield s"$kw $id $op $lit"
    forSamples(sqlish) { s => assert(Compat.render(Compat.tokenize(s)) === s) }
  }

  private val doubleGen: Gen[Double] = Gen.frequency(
    5 -> Gen.chooseNum(-1e6, 1e6),
    2 -> Gen.chooseNum(-1.0, 1.0),
    2 -> Gen.chooseNum(Double.MinValue, Double.MaxValue),
    1 -> Gen.oneOf(0.0, -0.0, 1e-300, -1e300, 0.0001, 1e-5, 123456789.123456789))

  test("pg float8 text parses back to the exact double (shortest round-trip)") {
    forSamples(doubleGen) { d =>
      val txt = TextEncoder.formatFloat(d, isFloat4 = false)
      assert(java.lang.Double.parseDouble(txt) === d,
        s"$d printed as $txt did not round-trip")
    }
  }

  test("pg float4 text parses back to the exact float") {
    forSamples(doubleGen.map(_.toFloat).suchThat(f => !f.isNaN && !f.isInfinite)) { f =>
      val txt = TextEncoder.formatFloat(f.toDouble, isFloat4 = true)
      assert(java.lang.Float.parseFloat(txt) === f)
    }
  }

  test("quote_ident → parse_ident round-trips any identifier") {
    val ident = Gen.nonEmptyListOf(
      Gen.frequency(8 -> Gen.alphaNumChar, 1 -> Gen.const('_'),
        1 -> Gen.oneOf(' ', '.', '"', 'ä'))).map(_.mkString)
    forSamples(ident) { s =>
      val quoted = PgFunctions.quoteIdent(s)
      val parsed = PgFunctions.parseIdent(quoted)
      assert(parsed.toSeq === Seq(if (quoted == s) s.toLowerCase else s),
        s"ident <$s> quoted <$quoted> parsed ${parsed.toSeq}")
    }
  }

  /** Decode the pg numeric binary format back into a BigDecimal. */
  private def decodeNumeric(bytes: Array[Byte]): java.math.BigDecimal = {
    val b = ByteBuffer.wrap(bytes)
    val ndigits = b.getShort
    val weight = b.getShort
    val sign = b.getShort
    val dscale = b.getShort
    var acc = java.math.BigDecimal.ZERO
    (0 until ndigits).foreach { i =>
      val digit = java.math.BigDecimal.valueOf(b.getShort.toLong)
      acc = acc.add(digit.scaleByPowerOfTen((weight - i) * 4))
    }
    val signed = if (sign == 0x4000) acc.negate else acc
    signed.setScale(dscale)
  }

  test("numeric binary encodes any BigDecimal losslessly") {
    val decGen = for {
      unscaled <- Gen.chooseNum(-1000000000000L, 1000000000000L)
      scale <- Gen.chooseNum(0, 8)
    } yield java.math.BigDecimal.valueOf(unscaled, scale)
    forSamples(decGen) { bd =>
      val dec = decodeNumeric(BinaryEncoder.encodeNumeric(bd))
      assert(dec.compareTo(bd) === 0, s"$bd -> $dec")
    }
  }

  test("array text encoding quotes every element unambiguously") {
    // any element list renders with balanced braces and the same
    // top-level element count (split on unquoted commas)
    val elsGen = Gen.listOf(Gen.frequency(
      6 -> Gen.asciiPrintableStr, 1 -> Gen.const(null: String),
      1 -> Gen.oneOf("a,b", "{x}", "say \"hi\"", "back\\slash", "", "NULL")))
    forSamples(elsGen) { els =>
      val txt = TextEncoder.encodeArray(els, StringType)
      assert(txt.startsWith("{") && txt.endsWith("}"))
      var inQ = false
      var count = if (els.isEmpty) 0 else 1
      var i = 1
      while (i < txt.length - 1) {
        val c = txt.charAt(i)
        if (inQ) {
          if (c == '\\') i += 1
          else if (c == '"') inQ = false
        } else if (c == '"') inQ = true
        else if (c == ',') count += 1
        i += 1
      }
      assert(count === els.length, s"elements $els encoded: $txt")
    }
  }
}
