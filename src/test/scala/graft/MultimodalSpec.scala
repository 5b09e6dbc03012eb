package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MultimodalOps.ImageHeaders

/** Real-header image parsing: golden bytes of genuine files (the
  * canonical 1x1 PNG and GIF that ship base64-inline in countless
  * public web pages), synthesize→parse round trips, and truncation/
  * garbage safety.
  */
class MultimodalSpec extends AnyFunSuite {

  private def b64(s: String): Array[Byte] = java.util.Base64.getDecoder.decode(s)

  test("golden 1x1 transparent PNG parses as png 1x1 RGBA") {
    val png = b64("iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNk" +
      "YPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    assert(ImageHeaders.parse(png) === Some(("png", 1, 1, 4)))
  }

  test("golden 1x1 GIF parses as gif 1x1") {
    val gif = b64("R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7")
    assert(ImageHeaders.parse(gif) === Some(("gif", 1, 1, 3)))
  }

  test("synthesized headers round-trip for every format and edge dims") {
    for (fmt <- Seq("png", "jpeg", "gif"); (w, h) <- Seq((1, 1), (4096, 2160), (640, 480))) {
      assert(ImageHeaders.parse(ImageHeaders.synthesize(fmt, w, h)) ===
        Some((fmt, w, h, 3)), s"$fmt $w x $h")
    }
  }

  test("jpeg parser walks past multi-segment preambles to SOF") {
    // SOI + two APP segments + COM, then SOF2 (progressive)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0xff, 0xd8).map(_.toByte)) // SOI
    def seg(marker: Int, dataLen: Int): Unit = {
      out.write(0xff); out.write(marker)
      out.write((dataLen + 2) >>> 8); out.write((dataLen + 2) & 0xff)
      out.write(new Array[Byte](dataLen))
    }
    seg(0xe0, 14); seg(0xe1, 30); seg(0xfe, 5) // APP0, APP1, COM
    out.write(Array(0xff, 0xc2).map(_.toByte)) // SOF2
    out.write(Array(0, 11, 8).map(_.toByte)) // len, precision
    out.write(Array(0x04, 0x38).map(_.toByte)) // height 1080
    out.write(Array(0x07, 0x80).map(_.toByte)) // width 1920
    out.write(1) // grayscale
    assert(ImageHeaders.parse(out.toByteArray) === Some(("jpeg", 1920, 1080, 1)))
  }

  test("garbage, truncated and null inputs return None") {
    assert(ImageHeaders.parse(null) === None)
    assert(ImageHeaders.parse(Array[Byte]()) === None)
    assert(ImageHeaders.parse("not an image at all".getBytes) === None)
    assert(ImageHeaders.parse(Array(0x89.toByte, 'P'.toByte, 'N'.toByte)) === None)
    // JPEG SOI with EOI right after: no SOF -> None
    assert(ImageHeaders.parse(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)) === None)
  }
}
