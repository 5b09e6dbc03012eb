package graft.functions

import java.math.BigInteger

import graft.pgwire.PgException

/** PostgreSQL network types (`inet`/`cidr`, pg §8.9/§9.12) over
  * canonical text — the round-11 type-family pattern (geo, range,
  * text search, enum): every behavior pinned against live pg 15
  * BEFORE implementation (PgParitySpec sweep-18): v4/v6 parsing and
  * RFC 5952 rendering (/32 and /128 suppressed for inet display),
  * cidr host-bit validation, the operator family
  * (`<< <<= >> >>= && + - ~ & |` and ordering), and the accessor
  * functions. Pure per-value string computation — map-side at scale.
  */
object Inet extends Serializable {

  /** family 4|6, address as unsigned BigInteger, mask length, cidr? */
  final case class Ip(family: Int, addr: BigInteger, masklen: Int, cidr: Boolean) {
    def bits: Int = if (family == 4) 32 else 128
  }

  private def badInet(s: String): Nothing =
    throw PgException("22P02", s"""invalid input syntax for type inet: "$s"""")

  /** Parse inet/cidr text. `asCidr` validates that no host bits are
    * set (pg: `invalid cidr value`).
    */
  def parse(raw: String, asCidr: Boolean): Ip = {
    val s = raw.trim
    val slash = s.indexOf('/')
    val addrPart = if (slash < 0) s else s.substring(0, slash)
    val v6 = addrPart.contains(':')
    val bits = if (v6) 128 else 32
    val masklen =
      if (slash < 0) { if (asCidr && !v6) netmaskLenFromClass(addrPart) else bits }
      else {
        val m = s.substring(slash + 1)
        if (m.isEmpty || !m.forall(_.isDigit)) badInet(raw)
        val v = m.toInt
        if (v > bits) badInet(raw)
        v
      }
    val addr = if (v6) parseV6(addrPart, raw) else parseV4(addrPart, raw)
    val ip = Ip(if (v6) 6 else 4, addr, masklen, asCidr)
    if (asCidr && ip.addr.compareTo(network(ip).addr) != 0)
      throw PgException("22P02", s"""invalid cidr value: "$raw"""")
    ip
  }

  /** pg classful default for a bare-cidr address — only used for the
    * rare `'10.1.2'::cidr` spellings; full addresses default to the
    * full mask.
    */
  private def netmaskLenFromClass(addr: String): Int = 32

  private def parseV4(s: String, raw: String): BigInteger = {
    val parts = s.split("\\.", -1)
    if (parts.length != 4 || parts.exists(p => p.isEmpty || !p.forall(_.isDigit)))
      badInet(raw)
    var v = BigInteger.ZERO
    parts.foreach { p =>
      val o = p.toInt
      if (o > 255) badInet(raw)
      v = v.shiftLeft(8).or(BigInteger.valueOf(o.toLong))
    }
    v
  }

  private def parseV6(s: String, raw: String): BigInteger = {
    // groups with at most one '::' compression; trailing v4 allowed
    val dbl = s.indexOf("::")
    if (dbl != s.lastIndexOf("::")) badInet(raw)
    def groups(part: String): Seq[Int] =
      if (part.isEmpty) Nil
      else part.split(":", -1).toSeq.flatMap { g =>
        if (g.isEmpty) badInet(raw)
        else if (g.contains('.')) { // embedded v4 tail
          val v4 = parseV4(g, raw)
          Seq(v4.shiftRight(16).intValue() & 0xffff, v4.intValue() & 0xffff)
        } else {
          if (g.length > 4 || !g.forall(c => Character.digit(c, 16) >= 0)) badInet(raw)
          Seq(Integer.parseInt(g, 16))
        }
      }
    val gs: Seq[Int] =
      if (dbl < 0) {
        val g = groups(s)
        if (g.length != 8) badInet(raw)
        g
      } else {
        val left = groups(s.substring(0, dbl))
        val right = groups(s.substring(dbl + 2))
        if (left.length + right.length > 7) badInet(raw)
        left ++ Seq.fill(8 - left.length - right.length)(0) ++ right
      }
    gs.foldLeft(BigInteger.ZERO)((acc, g) =>
      acc.shiftLeft(16).or(BigInteger.valueOf(g.toLong)))
  }

  // ---- rendering -----------------------------------------------------------

  private def renderV4(addr: BigInteger): String = {
    val v = addr.longValue()
    s"${(v >> 24) & 0xff}.${(v >> 16) & 0xff}.${(v >> 8) & 0xff}.${v & 0xff}"
  }

  /** RFC 5952: lowercase hex, longest (leftmost) run of ≥2 zero
    * groups compressed to `::`.
    */
  private def renderV6(addr: BigInteger): String = {
    val gs = (0 until 8).map(i =>
      addr.shiftRight((7 - i) * 16).intValue() & 0xffff)
    var bestStart = -1; var bestLen = 0
    var i = 0
    while (i < 8) {
      if (gs(i) == 0) {
        var j = i
        while (j < 8 && gs(j) == 0) j += 1
        if (j - i > bestLen) { bestLen = j - i; bestStart = i }
        i = j
      } else i += 1
    }
    if (bestLen < 2) gs.map(Integer.toHexString).mkString(":")
    else {
      val pre = gs.take(bestStart).map(Integer.toHexString).mkString(":")
      val post = gs.drop(bestStart + bestLen).map(Integer.toHexString).mkString(":")
      pre + "::" + post
    }
  }

  def render(ip: Ip): String = {
    val a = if (ip.family == 4) renderV4(ip.addr) else renderV6(ip.addr)
    if (ip.cidr || ip.masklen != ip.bits) a + "/" + ip.masklen else a
  }

  /** text(inet): always shows the mask length. */
  def renderFull(ip: Ip): String =
    (if (ip.family == 4) renderV4(ip.addr) else renderV6(ip.addr)) + "/" + ip.masklen

  /** abbrev(cidr): v4 drops trailing zero octets beyond the mask
    * (live pin: 10.1.0.0/16 → 10.1/16); abbrev(inet) = plain display.
    */
  def abbrevCidr(ip: Ip): String =
    if (ip.family != 4) render(ip)
    else {
      val keep = math.max(1, (ip.masklen + 7) / 8)
      val v = ip.addr.longValue()
      val octs = Seq((v >> 24) & 0xff, (v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff)
      var n = 4
      while (n > keep && octs(n - 1) == 0) n -= 1
      octs.take(n).mkString(".") + "/" + ip.masklen
    }

  // ---- accessors / transforms ---------------------------------------------

  private def maskOf(ip: Ip): BigInteger = {
    val all = BigInteger.ONE.shiftLeft(ip.bits).subtract(BigInteger.ONE)
    all.shiftRight(ip.masklen).xor(all) // high masklen bits set
  }

  def network(ip: Ip): Ip = ip.copy(addr = ip.addr.and(maskOf(ip)))

  def broadcast(ip: Ip): Ip = {
    val all = BigInteger.ONE.shiftLeft(ip.bits).subtract(BigInteger.ONE)
    ip.copy(addr = ip.addr.or(maskOf(ip).xor(all)))
  }

  def netmask(ip: Ip): Ip = Ip(ip.family, maskOf(ip), ip.bits, cidr = false)

  def hostmask(ip: Ip): Ip = {
    val all = BigInteger.ONE.shiftLeft(ip.bits).subtract(BigInteger.ONE)
    Ip(ip.family, maskOf(ip).xor(all), ip.bits, cidr = false)
  }

  def setMasklen(ip: Ip, len: Int): Ip = {
    if (len > ip.bits) throw PgException("22023",
      s"invalid mask length: $len")
    val next = ip.copy(masklen = len)
    if (ip.cidr) network(next) else next
  }

  def merge(a: Ip, b: Ip): Ip = {
    if (a.family != b.family)
      throw PgException("22023", "cannot merge addresses from different families")
    // longest common prefix of the two NETWORKS
    var len = math.min(a.masklen, b.masklen)
    def netAt(ip: Ip, l: Int): BigInteger = {
      val all = BigInteger.ONE.shiftLeft(ip.bits).subtract(BigInteger.ONE)
      ip.addr.and(all.shiftRight(l).xor(all))
    }
    while (len > 0 && netAt(a, len).compareTo(netAt(b, len)) != 0) len -= 1
    Ip(a.family, netAt(a, len), len, cidr = true)
  }

  def add(ip: Ip, n: Long): Ip = {
    val v = ip.addr.add(BigInteger.valueOf(n))
    val all = BigInteger.ONE.shiftLeft(ip.bits).subtract(BigInteger.ONE)
    if (v.signum < 0 || v.compareTo(all) > 0)
      throw PgException("22003", "result is out of range")
    ip.copy(addr = v)
  }

  def diff(a: Ip, b: Ip): BigInteger = {
    if (a.family != b.family)
      throw PgException("22023",
        "cannot subtract inet values of different sizes")
    a.addr.subtract(b.addr)
  }

  def not(ip: Ip): Ip = {
    val all = BigInteger.ONE.shiftLeft(ip.bits).subtract(BigInteger.ONE)
    ip.copy(addr = ip.addr.xor(all))
  }

  def and(a: Ip, b: Ip): Ip = a.copy(addr = a.addr.and(b.addr))
  def or(a: Ip, b: Ip): Ip = a.copy(addr = a.addr.or(b.addr))

  /** a is contained in b's network (strict: a.masklen > b.masklen). */
  def containedIn(a: Ip, b: Ip, strict: Boolean): Boolean = {
    if (a.family != b.family) return false
    val okLen = if (strict) a.masklen > b.masklen else a.masklen >= b.masklen
    okLen && network(a.copy(masklen = b.masklen)).addr
      .compareTo(network(b).addr) == 0
  }

  def overlap(a: Ip, b: Ip): Boolean =
    containedIn(a, b, strict = false) || containedIn(b, a, strict = false)

  /** pg network_cmp: network first, then masklen, then host bits. */
  def cmp(a: Ip, b: Ip): Int = {
    if (a.family != b.family) return a.family - b.family
    val n = network(a).addr.compareTo(network(b).addr)
    if (n != 0) return n
    if (a.masklen != b.masklen) return a.masklen - b.masklen
    a.addr.compareTo(b.addr)
  }

  // ---- macaddr / macaddr8 (pg §8.10) ---------------------------------------

  private def badMac(s: String, eight: Boolean): Nothing =
    throw PgException("22P02",
      s"invalid input syntax for type macaddr${if (eight) "8" else ""}: \"$s\"")

  /** Parse the pg macaddr spellings (colon/dash pairs, 3-hex groups,
    * dotted quads, bare hex); macaddr8 additionally accepts 8 bytes
    * and expands 6-byte input with the ff:fe EUI-64 midsection.
    */
  def parseMac(raw: String, eight: Boolean): Array[Int] = {
    val hex = raw.trim.filter(c => Character.digit(c, 16) >= 0)
    val seps = raw.trim.filterNot(c => Character.digit(c, 16) >= 0)
    if (!seps.forall(c => c == ':' || c == '-' || c == '.')) badMac(raw, eight)
    val nBytes = hex.length / 2
    if (hex.length % 2 != 0) badMac(raw, eight)
    if (nBytes != 6 && !(eight && nBytes == 8)) badMac(raw, eight)
    val bytes = Array.tabulate(nBytes)(i =>
      Integer.parseInt(hex.substring(i * 2, i * 2 + 2), 16))
    if (eight && nBytes == 6)
      Array(bytes(0), bytes(1), bytes(2), 0xff, 0xfe, bytes(3), bytes(4), bytes(5))
    else bytes
  }

  def renderMac(b: Array[Int]): String =
    b.map(v => f"$v%02x").mkString(":")

  // ---- registration --------------------------------------------------------

  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val u = spark.udf
    def p(s: String): Ip = parse(s, asCidr = false)
    u.register("inet_in", (s: String) =>
      if (s == null) null else render(parse(s, asCidr = false)))
    u.register("cidr_in", (s: String) =>
      if (s == null) null else render(parse(s, asCidr = true).copy(cidr = true)))
    u.register("host", (s: String) =>
      if (s == null) null else {
        val ip = p(s)
        if (ip.family == 4) renderV4(ip.addr) else renderV6(ip.addr)
      })
    u.register("masklen", (s: String) =>
      (if (s == null) null else Int.box(p(s).masklen)): java.lang.Integer)
    u.register("family", (s: String) =>
      (if (s == null) null else Int.box(p(s).family)): java.lang.Integer)
    u.register("network", (s: String) =>
      if (s == null) null else render(network(p(s)).copy(cidr = true)))
    u.register("broadcast", (s: String) =>
      if (s == null) null else render(broadcast(p(s))))
    u.register("netmask", (s: String) =>
      if (s == null) null else render(netmask(p(s))))
    u.register("hostmask", (s: String) =>
      if (s == null) null else render(hostmask(p(s))))
    u.register("abbrev", (s: String) =>
      if (s == null) null else render(p(s))) // abbrev(inet) = display form
    u.register("pg_abbrev_cidr", (s: String) =>
      if (s == null) null else abbrevCidr(parse(s, asCidr = true)))
    u.register("pg_inet_text", (s: String) =>
      if (s == null) null else renderFull(p(s)))
    u.register("set_masklen", (s: String, n: Int) =>
      if (s == null) null else render(setMasklen(p(s), n)))
    u.register("pg_set_masklen_cidr", (s: String, n: Int) =>
      if (s == null) null
      else render(setMasklen(parse(s, asCidr = true), n).copy(cidr = true)))
    u.register("inet_same_family", (a: String, b: String) =>
      (if (a == null || b == null) null
       else Boolean.box(p(a).family == p(b).family)): java.lang.Boolean)
    u.register("inet_merge", (a: String, b: String) =>
      if (a == null || b == null) null else render(merge(p(a), p(b))))
    u.register("inet_add", (s: String, n: Long) =>
      if (s == null) null else render(add(p(s), n)))
    u.register("inet_sub", (s: String, n: Long) =>
      if (s == null) null else render(add(p(s), -n)))
    u.register("inet_diff", (a: String, b: String) =>
      (if (a == null || b == null) null
       else Long.box(diff(p(a), p(b)).longValueExact)): java.lang.Long)
    u.register("inet_not", (s: String) =>
      if (s == null) null else render(not(p(s))))
    u.register("inet_and", (a: String, b: String) =>
      if (a == null || b == null) null else render(and(p(a), p(b))))
    u.register("inet_or", (a: String, b: String) =>
      if (a == null || b == null) null else render(or(p(a), p(b))))
    def bin(name: String)(f: (Ip, Ip) => Boolean): Unit =
      u.register(name, (a: String, b: String) =>
        (if (a == null || b == null) null
         else Boolean.box(f(p(a), p(b)))): java.lang.Boolean)
    bin("inet_contained_strict")((a, b) => containedIn(a, b, strict = true))
    bin("inet_contained_eq")((a, b) => containedIn(a, b, strict = false))
    bin("inet_contains_strict")((a, b) => containedIn(b, a, strict = true))
    bin("inet_contains_eq")((a, b) => containedIn(b, a, strict = false))
    bin("inet_overlap")(overlap)
    bin("inet_lt")((a, b) => cmp(a, b) < 0)
    u.register("macaddr_in", (s: String) =>
      if (s == null) null else renderMac(parseMac(s, eight = false)))
    u.register("macaddr8_in", (s: String) =>
      if (s == null) null else renderMac(parseMac(s, eight = true)))
    u.register("mac_trunc", (s: String) =>
      if (s == null) null else {
        val b = parseMac(s, eight = false)
        renderMac(b.take(3) ++ Array(0, 0, 0))
      })
    u.register("mac_not", (s: String) =>
      if (s == null) null
      else renderMac(parseMac(s, eight = s.count(_ == ':') == 7).map(v => ~v & 0xff)))
    u.register("mac_and", (a: String, b: String) =>
      if (a == null || b == null) null
      else renderMac(parseMac(a, eight = false).zip(parseMac(b, eight = false))
        .map { case (x, y) => x & y }))
    u.register("mac_or", (a: String, b: String) =>
      if (a == null || b == null) null
      else renderMac(parseMac(a, eight = false).zip(parseMac(b, eight = false))
        .map { case (x, y) => x | y }))
    u.register("macaddr8_set7bit", (s: String) =>
      if (s == null) null else {
        val b = parseMac(s, eight = true)
        b(0) |= 0x02
        renderMac(b)
      })
    bin("inet_le")((a, b) => cmp(a, b) <= 0)
    bin("inet_gt")((a, b) => cmp(a, b) > 0)
    bin("inet_ge")((a, b) => cmp(a, b) >= 0)
  }
}
