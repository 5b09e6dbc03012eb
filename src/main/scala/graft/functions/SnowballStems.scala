package graft.functions

/** Non-english Snowball stemmers for the pg text-search configs the
  * reference's functions roadmap lists beyond 'english'/'simple'
  * (reference: datafusion-postgres docs/functions.md text-search
  * rows). Implemented from the PUBLIC Snowball algorithm
  * descriptions (snowballstem.org/algorithms/{german,spanish,french}/
  * stemmer.html) and verified by differential sweeps against live
  * pg 15 `ts_lexize('<lang>_stem', w)` over morphological
  * cross-product vocabularies (sweep-26) — the same method the
  * english Porter2 port used. Stop-word sets are the public Snowball
  * project lists as shipped in PostgreSQL's tsearch_data.
  *
  * All stemmers take a lowercase word and return its stem.
  */
object SnowballStems extends Serializable {

  // ------------------------------------------------------------------
  // German (snowballstem.org/algorithms/german/stemmer.html)
  // ------------------------------------------------------------------

  private val deVowels = "aeiouyäöü".toSet

  /** Standard R1/R2: the region after the first non-vowel following
    * a vowel, scanning from `from`. */
  private def regionAfter(s: String, from: Int, isV: Char => Boolean): Int = {
    var i = from
    while (i < s.length && !isV(s(i))) i += 1
    while (i < s.length && isV(s(i))) i += 1
    if (i < s.length) i + 1 else s.length
  }

  def germanStem(word0: String): String = {
    var w = word0.replace("ß", "ss")
    // mark u/y between vowels as consonants (upper case)
    if (w.length >= 3) {
      val cs = w.toCharArray
      var i = 1
      while (i < cs.length - 1) {
        if ((cs(i) == 'u' || cs(i) == 'y') &&
          deVowels(cs(i - 1)) && deVowels(cs(i + 1)))
          cs(i) = cs(i).toUpper
        i += 1
      }
      w = new String(cs)
    }
    val isV = (c: Char) => deVowels(c)
    var r1 = regionAfter(w, 0, isV)
    val r2 = regionAfter(w, r1, isV)
    if (r1 < 3) r1 = 3
    def inR1(pos: Int) = pos >= r1
    def inR2(pos: Int) = pos >= r2

    // step 1
    val sEnding = "bdfghklmnrt".toSet
    Seq("ern", "em", "er", "en", "es", "e", "s").find(w.endsWith) match {
      case Some(suf @ ("ern" | "em" | "er")) =>
        if (inR1(w.length - suf.length)) w = w.dropRight(suf.length)
      case Some(suf @ ("en" | "es" | "e")) =>
        if (inR1(w.length - suf.length)) {
          w = w.dropRight(suf.length)
          if (w.endsWith("niss")) w = w.dropRight(1)
        }
      case Some("s") =>
        if (inR1(w.length - 1) && w.length >= 2 && sEnding(w(w.length - 2)))
          w = w.dropRight(1)
      case _ =>
    }
    // step 2
    val stEnding = "bdfghklmnt".toSet
    Seq("est", "en", "er", "st").find(w.endsWith) match {
      case Some(suf @ ("est" | "en" | "er")) =>
        if (inR1(w.length - suf.length)) w = w.dropRight(suf.length)
      case Some("st") =>
        if (inR1(w.length - 2) && w.length >= 6 && stEnding(w(w.length - 3)))
          w = w.dropRight(2)
      case _ =>
    }
    // step 3: d-suffixes
    Seq("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik")
      .find(w.endsWith) match {
      case Some(suf @ ("end" | "ung")) =>
        if (inR2(w.length - suf.length)) {
          w = w.dropRight(suf.length)
          val p = w.length - 2
          if (w.endsWith("ig") && inR2(p) && (p == 0 || w(p - 1) != 'e'))
            w = w.dropRight(2)
        }
      case Some(suf @ ("ig" | "ik" | "isch")) =>
        val p = w.length - suf.length
        if (inR2(p) && (p == 0 || w(p - 1) != 'e')) w = w.dropRight(suf.length)
      case Some(suf @ ("lich" | "heit")) =>
        if (inR2(w.length - suf.length)) {
          w = w.dropRight(suf.length)
          Seq("er", "en").find(w.endsWith) match {
            case Some(s2) if inR1(w.length - 2) => w = w.dropRight(s2.length)
            case _ =>
          }
        }
      case Some("keit") =>
        if (inR2(w.length - 4)) {
          w = w.dropRight(4)
          Seq("lich", "ig").find(w.endsWith) match {
            case Some(s2) if inR2(w.length - s2.length) =>
              w = w.dropRight(s2.length)
            case _ =>
          }
        }
      case _ =>
    }
    w.map {
      case 'U' => 'u'; case 'Y' => 'y'
      case 'ä' => 'a'; case 'ö' => 'o'; case 'ü' => 'u'
      case c => c
    }
  }

  // ------------------------------------------------------------------
  // Spanish (snowballstem.org/algorithms/spanish/stemmer.html)
  // ------------------------------------------------------------------

  private val esVowels = "aeiouáéíóúü".toSet

  /** Romance-language RV: second letter consonant → after the next
    * vowel; first two letters vowels → after the next consonant;
    * consonant-vowel → after the third letter. */
  private def rvRomance(s: String, isV: Char => Boolean): Int = {
    if (s.length < 3) return s.length
    if (!isV(s(1))) {
      var i = 2; while (i < s.length && !isV(s(i))) i += 1
      if (i < s.length) i + 1 else s.length
    } else if (isV(s(0)) && isV(s(1))) {
      var i = 2; while (i < s.length && isV(s(i))) i += 1
      if (i < s.length) i + 1 else s.length
    } else 3
  }

  private def esUnaccent(c: Char): Char = c match {
    case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'
    case 'ó' => 'o'; case 'ú' => 'u'; case x => x
  }

  def spanishStem(word0: String): String = {
    var w = word0
    val isV = (c: Char) => esVowels(c)
    val rv = rvRomance(w, isV)
    val r1 = regionAfter(w, 0, isV)
    val r2 = regionAfter(w, r1, isV)
    def inRV(pos: Int) = pos >= rv
    def inR1(pos: Int) = pos >= r1
    def inR2(pos: Int) = pos >= r2

    // NOTE on all RV-limited steps (0, 2a, 2b, 3): Snowball's
    // `setlimit tomark pV` bounds the suffix MATCH itself — a longer
    // suffix that starts before RV is not a candidate at all (no
    // condition-failure fallback, but shorter in-RV suffixes still
    // match). Implemented as a candidate filter before longest-match;
    // the first sweep-26 run had this as a post-check, which is what
    // produced every spanish/french diff.
    def inRvCandidates(sufs: Seq[String]): Option[String] =
      sufs.filter(s => w.endsWith(s) && w.length - s.length >= rv)
        .sortBy(-_.length).headOption

    // step 0: attached pronoun
    val pronouns = Seq("selas", "selos", "sela", "selo", "las", "les",
      "los", "nos", "me", "se", "la", "le", "lo")
    inRvCandidates(pronouns).foreach { pr =>
      val stemEnd = w.length - pr.length
      val head = w.substring(0, stemEnd)
      val accented = Seq("iéndo", "ándo", "ár", "ér", "ír")
      val plain = Seq("ando", "iendo", "ar", "er", "ir")
      accented.find(head.endsWith) match {
        case Some(a) if inRV(stemEnd - a.length) =>
          w = head.map(esUnaccent)
        case _ =>
          plain.find(head.endsWith) match {
            case Some(a) if inRV(stemEnd - a.length) => w = head
            case _ =>
              if (head.endsWith("yendo") && stemEnd >= 6 &&
                head(stemEnd - 6) == 'u' && inRV(stemEnd - 5)) w = head
          }
      }
    }

    val lenBefore1 = w.length
    // step 1: standard suffixes — longest match across the whole table
    val st1: Seq[(String, Int)] = Seq(
      // (suffix, action)
      "amientos" -> 1, "imientos" -> 1, "amiento" -> 1, "imiento" -> 1,
      "anzas" -> 1, "anza" -> 1, "icos" -> 1, "icas" -> 1, "ico" -> 1,
      "ica" -> 1, "ismos" -> 1, "ismo" -> 1, "ables" -> 1, "able" -> 1,
      "ibles" -> 1, "ible" -> 1, "istas" -> 1, "ista" -> 1, "osos" -> 1,
      "osas" -> 1, "oso" -> 1, "osa" -> 1,
      "adoras" -> 2, "adores" -> 2, "aciones" -> 2, "adora" -> 2,
      "ación" -> 2, "ador" -> 2, "antes" -> 2, "ante" -> 2,
      "ancias" -> 2, "ancia" -> 2,
      "logías" -> 3, "logía" -> 3,
      "uciones" -> 4, "ución" -> 4,
      "encias" -> 5, "encia" -> 5,
      "amente" -> 6, "mente" -> 7,
      "idades" -> 8, "idad" -> 8,
      "ivas" -> 9, "ivos" -> 9, "iva" -> 9, "ivo" -> 9)
    val m1 = st1.filter { case (s, _) => w.endsWith(s) }
      .sortBy(-_._1.length).headOption
    m1.foreach { case (suf, act) =>
      val p = w.length - suf.length
      act match {
        case 1 => if (inR2(p)) w = w.dropRight(suf.length)
        case 2 => if (inR2(p)) {
          w = w.dropRight(suf.length)
          if (w.endsWith("ic") && inR2(w.length - 2)) w = w.dropRight(2)
        }
        case 3 => if (inR2(p)) w = w.dropRight(suf.length - 3) // keep "log"
        case 4 => if (inR2(p)) w = w.substring(0, p) + "u"
        case 5 => if (inR2(p)) w = w.substring(0, p) + "ente"
        case 6 => if (inR1(p)) { // amente
          w = w.dropRight(6)
          if (w.endsWith("iv") && inR2(w.length - 2)) {
            w = w.dropRight(2)
            if (w.endsWith("at") && inR2(w.length - 2)) w = w.dropRight(2)
          } else Seq("os", "ic", "ad").find(w.endsWith) match {
            case Some(s2) if inR2(w.length - 2) => w = w.dropRight(2)
            case _ =>
          }
        }
        case 7 => if (inR2(p)) { // mente
          w = w.dropRight(5)
          Seq("ante", "able", "ible").find(w.endsWith) match {
            case Some(s2) if inR2(w.length - 4) => w = w.dropRight(4)
            case _ =>
          }
        }
        case 8 => if (inR2(p)) { // idad(es)
          w = w.dropRight(suf.length)
          Seq("abil", "ic", "iv").find(w.endsWith) match {
            case Some(s2) if inR2(w.length - s2.length) =>
              w = w.dropRight(s2.length)
            case _ =>
          }
        }
        case 9 => if (inR2(p)) { // iva/ivo(s)
          w = w.dropRight(suf.length)
          if (w.endsWith("at") && inR2(w.length - 2)) w = w.dropRight(2)
        }
      }
    }

    var removed = w.length != lenBefore1
    // step 2a: verb suffixes beginning y (only if step 1 removed nothing)
    if (!removed) {
      val lb = w.length
      val ys = Seq("yeron", "yendo", "yamos", "yais", "yan", "yen",
        "yas", "yes", "ya", "ye", "yo", "yó")
      inRvCandidates(ys).foreach { suf =>
        val p = w.length - suf.length
        if (p >= 1 && w(p - 1) == 'u') w = w.dropRight(suf.length)
      }
      removed = w.length != lb
    }
    // step 2b: other verb suffixes (if nothing removed yet)
    if (!removed) {
      val groupA = Seq("emos", "éis", "en", "es")
      val groupB = Seq(
        "arían", "arías", "arán", "arás", "aríais", "aría", "aréis",
        "aríamos", "aremos", "ará", "aré",
        "erían", "erías", "erán", "erás", "eríais", "ería", "eréis",
        "eríamos", "eremos", "erá", "eré",
        "irían", "irías", "irán", "irás", "iríais", "iría", "iréis",
        "iríamos", "iremos", "irá", "iré",
        "aba", "ada", "ida", "ía", "ara", "iera", "ad", "ed", "id",
        "ase", "iese", "aste", "iste", "an", "aban", "ían", "aran",
        "ieran", "asen", "iesen", "aron", "ieron", "ado", "ido",
        "ando", "iendo", "ió", "ar", "er", "ir", "as", "abas",
        "adas", "idas", "ías", "aras", "ieras", "ases", "ieses",
        "ís", "áis", "abais", "íais", "arais", "ierais", "aseis",
        "ieseis", "asteis", "isteis", "ados", "idos", "amos",
        "ábamos", "íamos", "imos", "áramos", "iéramos", "iésemos",
        "ásemos")
      inRvCandidates(groupA ++ groupB).foreach { suf =>
        w = w.dropRight(suf.length)
        if (groupA.contains(suf) && w.endsWith("gu")) w = w.dropRight(1)
      }
    }
    // step 3: residual suffix
    val res = Seq("os", "a", "o", "á", "í", "ó", "e", "é")
    inRvCandidates(res).foreach { suf =>
      w = w.dropRight(suf.length)
      if ((suf == "e" || suf == "é") &&
        w.endsWith("gu") && inRV(w.length - 1)) w = w.dropRight(1)
    }
    w.map(esUnaccent)
  }
  // ------------------------------------------------------------------
  // French (snowballstem.org/algorithms/french/stemmer.html) — the
  // snowball 2.x revision PostgreSQL 15 bundles, with the U/I/Y
  // hiatus markers and the He/Hi spellings of ë/ï.
  // ------------------------------------------------------------------

  private val frVowels = "aeiouyâàëéêèïîôûù".toSet

  def frenchStem(word0: String): String = {
    // prelude: mark u/i in hiatus, y next to a vowel, u after q as
    // upper-case consonants; spell ë/ï as He/Hi. Sequential scan —
    // a marked char no longer counts as a vowel for later tests.
    // ë/ï respelling wins over serving as the leading vowel of a
    // hiatus marking, and the written e/i can then head one itself
    // (live-pinned: ëui → ëu via HeUi, ïui → ïu via HiUi)
    val sb = new StringBuilder(word0)
    def isv(c: Char) = frVowels(c)
    var i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (c == 'ë') { sb.replace(i, i + 1, "He"); i += 1 }
      else if (c == 'ï') { sb.replace(i, i + 1, "Hi"); i += 1 }
      else if (isv(c) && i + 1 < sb.length) {
        val d = sb.charAt(i + 1)
        if (d == 'u' && i + 2 < sb.length && isv(sb.charAt(i + 2))) {
          sb.setCharAt(i + 1, 'U'); i += 2
        } else if (d == 'i' && i + 2 < sb.length && isv(sb.charAt(i + 2))) {
          sb.setCharAt(i + 1, 'I'); i += 2
        } else if (d == 'y') { sb.setCharAt(i + 1, 'Y'); i += 2 }
        else if (c == 'y' && isv(d)) { sb.setCharAt(i, 'Y'); i += 1 }
        else i += 1
      } else if (c == 'q' && i + 1 < sb.length && sb.charAt(i + 1) == 'u') {
        sb.setCharAt(i + 1, 'U'); i += 2
      } else i += 1
    }
    var w = sb.toString

    val isV = (c: Char) => frVowels(c)
    val rv =
      if (w.length >= 3 && (Set("par", "col", "tap").contains(w.take(3)) ||
        (isV(w(0)) && isV(w(1))))) 3
      else {
        var k = 1; while (k < w.length && !isV(w(k))) k += 1
        if (k < w.length) k + 1 else w.length
      }
    val r1 = regionAfter(w, 0, isV)
    val r2 = regionAfter(w, r1, isV)
    def inRV(pos: Int) = pos >= rv
    def inR1(pos: Int) = pos >= r1
    def inR2(pos: Int) = pos >= r2

    var doStep2a = false
    var altered = false

    // RV-limited candidate match — see the spanish note: the suffix
    // itself must lie inside RV to match at all
    def inRvCandidates(sufs: Seq[String]): Option[String] =
      sufs.filter(s => w.endsWith(s) && w.length - s.length >= rv)
        .sortBy(-_.length).headOption

    // ---- step 1: standard suffix removal (longest match) ----
    val st1: Seq[(String, Int)] = Seq(
      "ances" -> 1, "ance" -> 1, "iqUes" -> 1, "iqUe" -> 1,
      "ismes" -> 1, "isme" -> 1, "ables" -> 1, "able" -> 1,
      "istes" -> 1, "iste" -> 1, "eux" -> 1,
      "atrices" -> 2, "atrice" -> 2, "ateurs" -> 2, "ateur" -> 2,
      "ations" -> 2, "ation" -> 2,
      "logies" -> 3, "logie" -> 3,
      "usions" -> 4, "usion" -> 4, "utions" -> 4, "ution" -> 4,
      "ences" -> 5, "ence" -> 5,
      "ements" -> 6, "ement" -> 6,
      "ités" -> 7, "ité" -> 7,
      "ives" -> 8, "ive" -> 8, "ifs" -> 8, "if" -> 8,
      "eaux" -> 9, "aux" -> 10,
      "euses" -> 11, "euse" -> 11,
      "issements" -> 12, "issement" -> 12,
      "amment" -> 13, "emment" -> 14,
      "ments" -> 15, "ment" -> 15)
    val m1 = st1.filter { case (s, _) => w.endsWith(s) }
      .sortBy(-_._1.length).headOption
    m1.foreach { case (suf, act) =>
      val p = w.length - suf.length
      val before = w
      act match {
        case 1 => if (inR2(p)) w = w.dropRight(suf.length)
        case 2 => if (inR2(p)) {
          w = w.dropRight(suf.length)
          if (w.endsWith("ic")) {
            if (inR2(w.length - 2)) w = w.dropRight(2)
            else w = w.dropRight(2) + "iqU"
          }
        }
        case 3 => if (inR2(p)) w = w.dropRight(suf.length - 3) // → log
        case 4 => if (inR2(p)) w = w.substring(0, p) + "u"
        case 5 => if (inR2(p)) w = w.substring(0, p) + "ent"
        case 6 => if (inRV(p)) { // ement(s)
          w = w.dropRight(suf.length)
          if (w.endsWith("iv") && inR2(w.length - 2)) {
            w = w.dropRight(2)
            if (w.endsWith("at") && inR2(w.length - 2)) w = w.dropRight(2)
          } else if (w.endsWith("eus")) {
            if (inR2(w.length - 3)) w = w.dropRight(3)
            else if (inR1(w.length - 3)) w = w.dropRight(3) + "eux"
          } else if (w.endsWith("abl") && inR2(w.length - 3))
            w = w.dropRight(3)
          else if (w.endsWith("iqU") && inR2(w.length - 3))
            w = w.dropRight(3)
          else if (w.endsWith("ièr") && inRV(w.length - 3))
            w = w.dropRight(3) + "i"
          else if (w.endsWith("Ièr") && inRV(w.length - 3))
            w = w.dropRight(3) + "i"
        }
        case 7 => if (inR2(p)) { // ité(s)
          w = w.dropRight(suf.length)
          if (w.endsWith("abil")) {
            if (inR2(w.length - 4)) w = w.dropRight(4)
            else w = w.dropRight(4) + "abl"
          } else if (w.endsWith("ic")) {
            if (inR2(w.length - 2)) w = w.dropRight(2)
            else w = w.dropRight(2) + "iqU"
          } else if (w.endsWith("iv") && inR2(w.length - 2))
            w = w.dropRight(2)
        }
        case 8 => if (inR2(p)) { // if/ive(s)
          w = w.dropRight(suf.length)
          if (w.endsWith("at") && inR2(w.length - 2)) {
            w = w.dropRight(2)
            if (w.endsWith("ic")) {
              if (inR2(w.length - 2)) w = w.dropRight(2)
              else w = w.dropRight(2) + "iqU"
            }
          }
        }
        case 9 => w = w.dropRight(1) // eaux → eau
        case 10 => if (inR1(p)) w = w.dropRight(2) + "l" // aux → al
        case 11 => // euse(s)
          if (inR2(p)) w = w.dropRight(suf.length)
          else if (inR1(p)) w = w.substring(0, p) + "eux"
        case 12 => // issement(s): in R1, preceded by a non-vowel
          if (inR1(p) && p >= 1 && !isV(w(p - 1)))
            w = w.dropRight(suf.length)
        case 13 => // amment → ant, and fall through to step 2a
          if (inRV(p)) w = w.substring(0, p) + "ant"
          doStep2a = true
        case 14 => // emment → ent
          if (inRV(p)) w = w.substring(0, p) + "ent"
          doStep2a = true
        case 15 => // ment(s): preceded by a vowel in RV
          if (p >= 1 && isV(w(p - 1)) && inRV(p - 1))
            w = w.dropRight(suf.length)
          doStep2a = true
      }
      altered ||= w != before
    }
    if (m1.isEmpty) doStep2a = true
    else if (!altered && !doStep2a) doStep2a = true

    // ---- step 2a: verb suffixes beginning i (all tests in RV) ----
    var did2a = false
    if (doStep2a) {
      val s2a = Seq("issaIent", "issantes", "issions", "issante", "issants",
        "issait", "issais", "issant", "issiez", "issons", "irions",
        "issent", "iraIent", "isses", "irais", "irait", "irent",
        "iriez", "irons", "iront", "isses", "issez", "îtes", "îmes",
        "irai", "iras", "irez", "isse", "ies", "ira", "ît", "ie",
        "ir", "is", "it", "i")
      inRvCandidates(s2a).foreach { suf =>
        val p = w.length - suf.length
        if (p >= 1 && inRV(p - 1) && !isV(w(p - 1)) && w(p - 1) != 'H') {
          w = w.dropRight(suf.length); did2a = true; altered = true
        }
      }
      // ---- step 2b: other verb suffixes (if 2a removed nothing) ----
      if (!did2a) {
        val bIons = Seq("ions")
        val bEr = Seq("eraIent", "erions", "èrent", "erais", "erait",
          "eriez", "erons", "eront", "erai", "eras", "erez", "iez",
          "ées", "era", "ez", "ée", "és", "er", "é")
        val bA = Seq("assions", "assiez", "assent", "antes", "aIent",
          "asses", "âtes", "âmes", "ante", "ants", "asse", "ais",
          "ait", "ant", "ât", "ai", "as", "a")
        inRvCandidates(bIons ++ bEr ++ bA).foreach { suf =>
          val p = w.length - suf.length
          if (bIons.contains(suf)) {
            if (inR2(p)) { w = w.dropRight(suf.length); altered = true }
          } else if (bEr.contains(suf)) {
            w = w.dropRight(suf.length); altered = true
          } else {
            w = w.dropRight(suf.length); altered = true
            if (w.endsWith("e") && inRV(w.length - 1)) w = w.dropRight(1)
          }
        }
      }
    }

    if (altered) {
      // step 3: final Y → i, final ç → c
      if (w.endsWith("Y")) w = w.dropRight(1) + "i"
      else if (w.endsWith("ç")) w = w.dropRight(1) + "c"
    } else {
      // step 4: residual suffixes
      if (w.endsWith("s") && w.length >= 2) {
        val pre = w(w.length - 2)
        val keep = pre == 'a' || pre == 'o' || pre == 'u' || pre == 'è' ||
          pre == 's' ||
          (pre == 'i' && !(w.length >= 3 && w(w.length - 3) == 'H'))
        if (!keep) { w = w.dropRight(1) }
      }
      val s4 = Seq("Ière", "ière", "Ier", "ier", "ion", "e")
      inRvCandidates(s4).foreach { suf =>
        val p = w.length - suf.length
        suf match {
          case "ion" =>
            if (inR2(p) && p >= 1 && (w(p - 1) == 's' || w(p - 1) == 't') &&
              inRV(p - 1)) { w = w.dropRight(3); altered = true }
          case "e" => w = w.dropRight(1); altered = true
          case _ => w = w.substring(0, p) + "i"; altered = true
        }
      }
    }
    // step 5: undouble
    if (Seq("enn", "onn", "ett", "ell", "eill").exists(w.endsWith))
      w = w.dropRight(1)
    // step 6: un-accent a final é/è closed syllable (the H marker
    // counts as a skippable non-vowel here — live-pinned)
    var k = w.length - 1
    while (k >= 0 && !isV(w(k))) k -= 1
    if (k >= 0 && k < w.length - 1 && (w(k) == 'é' || w(k) == 'è'))
      w = w.substring(0, k) + "e" + w.substring(k + 1)
    // postlude: unmark; a bare H (its partner letter consumed by a
    // suffix) is deleted, as in snowball's among('H' → delete)
    w = w.replace("He", "ë").replace("Hi", "ï").replace("H", "")
      .replace("I", "i").replace("U", "u").replace("Y", "y")
    w
  }

  // ------------------------------------------------------------------
  // Italian (snowballstem.org/algorithms/italian/stemmer.html): the
  // Romance shape with the U/I hiatus markers and the qU spelling.
  // ------------------------------------------------------------------

  private val itVowels = "aeiouàèìòù".toSet

  def italianStem(word0: String): String = {
    // prelude: acute → grave; u after q → U; u/i between vowels → U/I
    var w = word0.map {
      case 'á' => 'à'; case 'é' => 'è'; case 'í' => 'ì'
      case 'ó' => 'ò'; case 'ú' => 'ù'; case c => c
    }
    val isV = (c: Char) => itVowels(c)
    locally {
      val cs = w.toCharArray
      var i = 1
      while (i < cs.length) {
        if (cs(i) == 'u' && cs(i - 1) == 'q') cs(i) = 'U'
        else if ((cs(i) == 'u' || cs(i) == 'i') && i + 1 < cs.length &&
          isV(cs(i - 1)) && isV(cs(i + 1))) cs(i) = cs(i).toUpper
        i += 1
      }
      w = new String(cs)
    }
    val rv = rvRomance(w, isV)
    val r1 = regionAfter(w, 0, isV)
    val r2 = regionAfter(w, r1, isV)
    def inRV(p: Int) = p >= rv
    def inR2(p: Int) = p >= r2
    def inRvCandidates(sufs: Seq[String]): Option[String] =
      sufs.filter(s => w.endsWith(s) && w.length - s.length >= rv)
        .sortBy(-_.length).headOption

    // step 0: attached pronoun — pronoun AND the preceding verb form
    // must both lie inside RV
    val pronouns = Seq("ci", "gli", "la", "le", "li", "lo", "mi", "ne",
      "si", "ti", "vi", "sene", "gliela", "gliele", "glieli", "glielo",
      "gliene", "mela", "mele", "meli", "melo", "mene", "tela", "tele",
      "teli", "telo", "tene", "cela", "cele", "celi", "celo", "cene",
      "vela", "vele", "veli", "velo", "vene")
    inRvCandidates(pronouns).foreach { pr =>
      val stemEnd = w.length - pr.length
      val head = w.substring(0, stemEnd)
      Seq("ando", "endo").find(h => head.endsWith(h) &&
        inRV(stemEnd - h.length)) match {
        case Some(_) => w = head
        case None =>
          Seq("ar", "er", "ir").find(h => head.endsWith(h) &&
            inRV(stemEnd - h.length)) match {
            case Some(_) => w = head + "e"
            case None =>
          }
      }
    }

    val lenBefore1 = w.length
    // step 1: standard suffixes — longest match, then the entry's rule
    val st1: Seq[(String, Int)] = Seq(
      "anza" -> 1, "anze" -> 1, "ico" -> 1, "ici" -> 1, "ica" -> 1,
      "ice" -> 1, "iche" -> 1, "ichi" -> 1, "ismo" -> 1, "ismi" -> 1,
      "abile" -> 1, "abili" -> 1, "ibile" -> 1, "ibili" -> 1,
      "ista" -> 1, "iste" -> 1, "isti" -> 1, "istà" -> 1, "istè" -> 1,
      "istì" -> 1, "oso" -> 1, "osi" -> 1, "osa" -> 1, "ose" -> 1,
      "mente" -> 1, "atrice" -> 1, "atrici" -> 1, "ante" -> 1, "anti" -> 1,
      "azione" -> 2, "azioni" -> 2, "atore" -> 2, "atori" -> 2,
      "logia" -> 3, "logie" -> 3,
      "uzione" -> 4, "uzioni" -> 4, "usione" -> 4, "usioni" -> 4,
      "enza" -> 5, "enze" -> 5,
      "amento" -> 6, "amenti" -> 6, "imento" -> 6, "imenti" -> 6,
      "amente" -> 7, "ità" -> 8,
      "ivo" -> 9, "ivi" -> 9, "iva" -> 9, "ive" -> 9)
    st1.filter { case (s, _) => w.endsWith(s) }
      .sortBy(-_._1.length).headOption.foreach { case (suf, act) =>
      val p = w.length - suf.length
      act match {
        case 1 => if (inR2(p)) w = w.dropRight(suf.length)
        case 2 => if (inR2(p)) {
          w = w.dropRight(suf.length)
          if (w.endsWith("ic") && inR2(w.length - 2)) w = w.dropRight(2)
        }
        case 3 => if (inR2(p)) w = w.dropRight(suf.length - 3) // keep log
        case 4 => if (inR2(p)) w = w.substring(0, p) + "u"
        case 5 => if (inR2(p)) w = w.substring(0, p) + "ente"
        case 6 => if (inRV(p)) w = w.dropRight(suf.length)
        case 7 => if (p >= r1) { // amente
          w = w.dropRight(6)
          if (w.endsWith("iv") && inR2(w.length - 2)) {
            w = w.dropRight(2)
            if (w.endsWith("at") && inR2(w.length - 2)) w = w.dropRight(2)
          } else Seq("abil", "os", "ic").find(w.endsWith) match {
            case Some(s2) if inR2(w.length - s2.length) =>
              w = w.dropRight(s2.length)
            case _ =>
          }
        }
        case 8 => if (inR2(p)) { // ità
          w = w.dropRight(3)
          Seq("abil", "ic", "iv").find(w.endsWith) match {
            case Some(s2) if inR2(w.length - s2.length) =>
              w = w.dropRight(s2.length)
            case _ =>
          }
        }
        case 9 => if (inR2(p)) { // iv*
          w = w.dropRight(suf.length)
          if (w.endsWith("at") && inR2(w.length - 2)) {
            w = w.dropRight(2)
            if (w.endsWith("ic") && inR2(w.length - 2)) w = w.dropRight(2)
          }
        }
      }
    }

    // step 2: verb suffixes, only if step 1 removed nothing
    if (w.length == lenBefore1) {
      val verbs = Seq("ammo", "ando", "ano", "are", "arono", "asse",
        "assero", "assi", "assimo", "ata", "ate", "ati", "ato", "ava",
        "avamo", "avano", "avate", "avi", "avo", "emmo", "enda", "ende",
        "endi", "endo", "erà", "erai", "eranno", "ere", "erebbe",
        "erebbero", "erei", "eremmo", "eremo", "ereste", "eresti",
        "erete", "erò", "erono", "essero", "ete", "eva", "evamo",
        "evano", "evate", "evi", "evo", "Yamo", "iamo", "immo", "irà",
        "irai", "iranno", "ire", "irebbe", "irebbero", "irei", "iremmo",
        "iremo", "ireste", "iresti", "irete", "irò", "irono", "isca",
        "iscano", "isce", "isci", "isco", "iscono", "issero", "ita",
        "ite", "iti", "ito", "iva", "ivamo", "ivano", "ivate", "ivi",
        "ivo", "ono", "uta", "ute", "uti", "uto", "ar", "ir")
      inRvCandidates(verbs).foreach(s => w = w.dropRight(s.length))
    }
    // step 3a: final vowel (then a preceding i), in RV
    inRvCandidates(Seq("a", "e", "i", "o", "à", "è", "ì", "ò")).foreach { s =>
      w = w.dropRight(1)
      if (w.endsWith("i") && inRV(w.length - 1)) w = w.dropRight(1)
    }
    // step 3b: ch/gh → c/g in RV
    if (w.endsWith("ch") && inRV(w.length - 2)) w = w.dropRight(1)
    else if (w.endsWith("gh") && inRV(w.length - 2)) w = w.dropRight(1)
    w.replace('U', 'u').replace('I', 'i')
  }

  // ------------------------------------------------------------------
  // Portuguese (snowballstem.org/algorithms/portuguese/stemmer.html):
  // ã/õ travel as a~/o~ through the stemmer (the Snowball spelling).
  // ------------------------------------------------------------------

  private val ptVowels = "aeiouáéíóúâêô".toSet

  def portugueseStem(word0: String): String = {
    var w = word0.replace("ã", "a~").replace("õ", "o~")
    val isV = (c: Char) => ptVowels(c)
    val rv = rvRomance(w, isV)
    val r1 = regionAfter(w, 0, isV)
    val r2 = regionAfter(w, r1, isV)
    def inRV(p: Int) = p >= rv
    def inR2(p: Int) = p >= r2
    def inRvCandidates(sufs: Seq[String]): Option[String] =
      sufs.filter(s => w.endsWith(s) && w.length - s.length >= rv)
        .sortBy(-_.length).headOption

    val lenBefore1 = w.length
    // step 1: standard suffixes — longest match, then the entry's rule
    val st1: Seq[(String, Int)] = Seq(
      "eza" -> 1, "ezas" -> 1, "ico" -> 1, "ica" -> 1, "icos" -> 1,
      "icas" -> 1, "ismo" -> 1, "ismos" -> 1, "ável" -> 1, "ível" -> 1,
      "ista" -> 1, "istas" -> 1, "oso" -> 1, "osa" -> 1, "osos" -> 1,
      "osas" -> 1, "amento" -> 1, "amentos" -> 1, "imento" -> 1,
      "imentos" -> 1, "adora" -> 1, "ador" -> 1, "aça~o" -> 1,
      "adoras" -> 1, "adores" -> 1, "aço~es" -> 1, "ante" -> 1,
      "antes" -> 1, "ância" -> 1,
      "logia" -> 2, "logias" -> 2,
      "uça~o" -> 3, "uço~es" -> 3,
      "ência" -> 4, "ências" -> 4,
      "amente" -> 5, "mente" -> 6,
      "idade" -> 7, "idades" -> 7,
      "iva" -> 8, "ivo" -> 8, "ivas" -> 8, "ivos" -> 8,
      "ira" -> 9, "iras" -> 9)
    st1.filter { case (s, _) => w.endsWith(s) }
      .sortBy(-_._1.length).headOption.foreach { case (suf, act) =>
      val p = w.length - suf.length
      act match {
        case 1 => if (inR2(p)) w = w.dropRight(suf.length)
        case 2 => if (inR2(p)) w = w.dropRight(suf.length - 3) // keep log
        case 3 => if (inR2(p)) w = w.substring(0, p) + "u"
        case 4 => if (inR2(p)) w = w.substring(0, p) + "ente"
        case 5 => if (p >= r1) { // amente
          w = w.dropRight(6)
          if (w.endsWith("iv") && inR2(w.length - 2)) {
            w = w.dropRight(2)
            if (w.endsWith("at") && inR2(w.length - 2)) w = w.dropRight(2)
          } else Seq("os", "ic", "ad").find(w.endsWith) match {
            case Some(s2) if inR2(w.length - 2) => w = w.dropRight(2)
            case _ =>
          }
        }
        case 6 => if (inR2(p)) { // mente
          w = w.dropRight(5)
          Seq("ante", "avel", "ível").find(w.endsWith) match {
            case Some(s2) if inR2(w.length - 4) => w = w.dropRight(4)
            case _ =>
          }
        }
        case 7 => if (inR2(p)) { // idade(s)
          w = w.dropRight(suf.length)
          Seq("abil", "ic", "iv").find(w.endsWith) match {
            case Some(s2) if inR2(w.length - s2.length) =>
              w = w.dropRight(s2.length)
            case _ =>
          }
        }
        case 8 => if (inR2(p)) { // iv*
          w = w.dropRight(suf.length)
          if (w.endsWith("at") && inR2(w.length - 2)) w = w.dropRight(2)
        }
        case 9 => // ira(s) → ir when in RV and preceded by e
          if (inRV(p) && p >= 1 && w(p - 1) == 'e')
            w = w.substring(0, p) + "ir"
      }
    }

    var changed = w.length != lenBefore1 || w != word0.replace("ã", "a~").replace("õ", "o~")
    // step 2: verb suffixes in RV, only if step 1 made no change
    if (!changed) {
      val lb = w.length
      val verbs = Seq("ada", "ida", "ia", "aria", "eria", "iria", "ará",
        "ara", "erá", "era", "irá", "ava", "asse", "esse", "isse",
        "aste", "este", "iste", "ei", "arei", "erei", "irei", "am",
        "iam", "ariam", "eriam", "iriam", "aram", "eram", "iram",
        "avam", "em", "arem", "erem", "irem", "assem", "essem",
        "issem", "ado", "ido", "ando", "endo", "indo", "ara~o",
        "era~o", "ira~o", "ar", "er", "ir", "as", "adas", "idas",
        "ias", "arias", "erias", "irias", "arás", "aras", "erás",
        "eras", "irás", "avas", "es", "ardes", "erdes", "irdes",
        "ares", "eres", "ires", "asses", "esses", "isses", "astes",
        "estes", "istes", "is", "ais", "iais", "ariais", "eriais",
        "iriais", "áreis", "areis", "éreis", "ereis", "íreis",
        "ireis", "ásseis", "ésseis", "ísseis", "áveis", "íeis",
        "aríeis", "eríeis", "iríeis", "eis", "ados", "idos", "ámos",
        "amos", "íamos", "aríamos", "eríamos", "iríamos", "áramos",
        "éramos", "íramos", "ávamos", "emos", "aremos", "eremos",
        "iremos", "ássemos", "êssemos", "íssemos", "imos", "armos",
        "ermos", "irmos", "eu", "iu", "ou", "ira", "iras")
      inRvCandidates(verbs).foreach(s => w = w.dropRight(s.length))
      changed = w.length != lb
    }
    // step 3: final i preceded by c (if steps 1-2 changed the word)
    if (changed) {
      if (w.endsWith("i") && inRV(w.length - 1) &&
        w.length >= 2 && w(w.length - 2) == 'c') w = w.dropRight(1)
    } else {
      // step 4: residual suffix (only when steps 1-2 did nothing)
      inRvCandidates(Seq("os", "a", "i", "o", "á", "í", "ó"))
        .foreach(s => w = w.dropRight(s.length))
    }
    // step 5: final e/é/ê in RV (+ a preceding gu/ci u/i in RV), or ç→c
    inRvCandidates(Seq("e", "é", "ê")) match {
      case Some(_) =>
        w = w.dropRight(1)
        if ((w.endsWith("gu") || w.endsWith("ci")) && inRV(w.length - 1))
          w = w.dropRight(1)
      case None =>
        if (w.endsWith("ç")) w = w.dropRight(1) + "c"
    }
    w.replace("a~", "ã").replace("o~", "õ")
  }

  // ------------------------------------------------------------------
  // Russian (snowballstem.org/algorithms/russian/stemmer.html).
  // Every step operates inside RV (Snowball's `setlimit tomark pV`
  // bounds suffix matches AND the preceding а/я group tests), with
  // longest-match-then-condition semantics: a failed group condition
  // fails the whole among, no fallback to a shorter entry.
  // ------------------------------------------------------------------

  private val ruVowels = "аеиоуыэюя".toSet

  def russianStem(word0: String): String = {
    var w = word0.replace('ё', 'е') // snowball 2.x prelude: ё ≡ е
    val isV = (c: Char) => ruVowels(c)
    // RV: after the first vowel
    val rv = {
      var i = 0; while (i < w.length && !isV(w(i))) i += 1
      if (i < w.length) i + 1 else w.length
    }
    val r1 = regionAfter(w, 0, isV)
    val r2 = regionAfter(w, r1, isV)

    // longest candidate whose MATCH (suffix only) lies inside RV
    def rvLongest(sufs: Seq[String]): Option[String] =
      sufs.filter(s => w.endsWith(s) && w.length - s.length >= rv)
        .sortBy(-_.length).headOption
    // preceded by а/я, the а/я itself inside the RV limit
    def precAYa(p: Int): Boolean =
      p - 1 >= rv && (w(p - 1) == 'а' || w(p - 1) == 'я')

    // one among over both groups: longest match wins, THEN the matched
    // entry's condition applies (g1 needs the preceding а/я; a failed
    // condition fails the whole among — no shorter-entry fallback)
    def amongAYa(g1: Seq[String], g2: Seq[String]): Boolean =
      rvLongest(g1 ++ g2) match {
        case Some(s) =>
          if (g2.contains(s) || precAYa(w.length - s.length)) {
            w = w.dropRight(s.length); true
          } else false
        case None => false
      }

    // step 1
    val pg1 = Seq("в", "вши", "вшись")
    val pg2 = Seq("ив", "ивши", "ившись", "ыв", "ывши", "ывшись")
    if (!amongAYa(pg1, pg2)) {
      // reflexive (try)
      rvLongest(Seq("ся", "сь")).foreach(s => w = w.dropRight(s.length))
      val adjective = Seq("ее", "ие", "ые", "ое", "ими", "ыми", "ей",
        "ий", "ый", "ой", "ем", "им", "ым", "ом", "его", "ого", "ему",
        "ому", "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею")
      val adjectival = rvLongest(adjective) match {
        case Some(s) =>
          w = w.dropRight(s.length)
          // try participle before the removed adjective ending
          val ptg1 = Seq("ем", "нн", "вш", "ющ", "щ")
          val ptg2 = Seq("ивш", "ывш", "ующ")
          amongAYa(ptg1, ptg2)
          true
        case None => false
      }
      if (!adjectival) {
        val vg1 = Seq("ла", "на", "ете", "йте", "ли", "й", "л", "ем",
          "н", "ло", "но", "ет", "ют", "ны", "ть", "ешь", "нно")
        val vg2 = Seq("ила", "ыла", "ена", "ейте", "уйте", "ите",
          "или", "ыли", "ей", "уй", "ил", "ыл", "им", "ым", "ен",
          "ило", "ыло", "ено", "ят", "ует", "уют", "ит", "ыт", "ены",
          "ить", "ыть", "ишь", "ую", "ю")
        if (!amongAYa(vg1, vg2)) {
          val noun = Seq("а", "ев", "ов", "ие", "ье", "е", "иями",
            "ями", "ами", "еи", "ии", "и", "ией", "ей", "ой", "ий",
            "й", "иям", "ям", "ием", "ем", "ам", "ом", "о", "у", "ах",
            "иях", "ях", "ы", "ь", "ию", "ью", "ю", "ия", "ья", "я")
          rvLongest(noun).foreach(s => w = w.dropRight(s.length))
        }
      }
    }
    // step 2: final и
    if (w.endsWith("и") && w.length - 1 >= rv) w = w.dropRight(1)
    // step 3: derivational, in R2
    rvLongest(Seq("ост", "ость")).foreach { s =>
      if (w.length - s.length >= r2) w = w.dropRight(s.length)
    }
    // step 4: tidy up
    rvLongest(Seq("нн", "ейше", "ейш", "ь")) match {
      case Some("нн") => w = w.dropRight(1)
      case Some(s @ ("ейше" | "ейш")) =>
        w = w.dropRight(s.length)
        if (w.endsWith("нн") && w.length - 2 >= rv) w = w.dropRight(1)
      case Some("ь") => w = w.dropRight(1)
      case _ =>
    }
    w
  }

  // ------------------------------------------------------------------
  // Dutch (snowballstem.org/algorithms/dutch/stemmer.html): the
  // German-family shape with the I/Y hiatus markers, the adjusted R1
  // (never before position 3), and the double-vowel undoubling.
  // ------------------------------------------------------------------

  private val nlVowels = "aeiouyè".toSet

  def dutchStem(word0: String): String = {
    // prelude: strip umlauts/acutes; mark y/i as consonantal (Y/I)
    var w = word0.map {
      case 'ä' | 'á' => 'a'; case 'ë' | 'é' => 'e'; case 'ï' | 'í' => 'i'
      case 'ö' | 'ó' => 'o'; case 'ü' | 'ú' => 'u'; case c => c
    }
    val isV = (c: Char) => nlVowels(c)
    val sb = new StringBuilder(w)
    if (sb.nonEmpty && sb(0) == 'y') sb(0) = 'Y'
    var i = 1
    while (i < sb.length) {
      if (sb(i) == 'y' && isV(sb(i - 1))) sb(i) = 'Y'
      else if (sb(i) == 'i' && i + 1 < sb.length && isV(sb(i - 1)) &&
        isV(sb(i + 1))) sb(i) = 'I'
      i += 1
    }
    w = sb.toString
    val r1raw = regionAfter(w, 0, isV)
    val r1 = math.max(r1raw, math.min(3, w.length))
    val r2 = regionAfter(w, r1raw, isV)
    def inR1(p: Int) = p >= r1
    def inR2(p: Int) = p >= r2

    def undouble(): Unit =
      if (Seq("kk", "dd", "tt").exists(w.endsWith)) w = w.dropRight(1)
    // valid s-ending: non-vowel other than j
    def validS(p: Int) = p >= 1 && !isV(w(p - 1)) && w(p - 1) != 'j'
    // valid en-ending: non-vowel and not preceded by gem
    def validEn(p: Int) = p >= 1 && !isV(w(p - 1)) &&
      !(p >= 3 && w.substring(p - 3, p) == "gem")

    // step 1: ONE among over heden/ene/en/se/s — longest match wins,
    // then only that entry's condition applies (a failed condition
    // fails the step; no fallback to a shorter suffix)
    Seq("heden", "ene", "en", "se", "s").filter(w.endsWith)
      .sortBy(-_.length).headOption match {
      case Some("heden") =>
        if (inR1(w.length - 5)) w = w.substring(0, w.length - 5) + "heid"
      case Some(s @ ("ene" | "en")) =>
        if (inR1(w.length - s.length) && validEn(w.length - s.length)) {
          w = w.dropRight(s.length); undouble()
        }
      case Some(s @ ("se" | "s")) =>
        if (inR1(w.length - s.length) && validS(w.length - s.length))
          w = w.dropRight(s.length)
      case _ =>
    }
    // step 2: final e after a non-vowel
    var eRemoved = false
    if (w.endsWith("e") && inR1(w.length - 1) &&
      w.length >= 2 && !isV(w(w.length - 2))) {
      w = w.dropRight(1); eRemoved = true; undouble()
    }
    // step 3a: heid (not preceded by c), then a preceding en as step 1
    if (w.endsWith("heid") && inR2(w.length - 4) &&
      !(w.length >= 5 && w(w.length - 5) == 'c')) {
      w = w.dropRight(4)
      if (w.endsWith("en") && inR1(w.length - 2) && validEn(w.length - 2)) {
        w = w.dropRight(2); undouble()
      }
    }
    // step 3b: derivational (longest)
    val d = Seq("lijk", "baar", "end", "ing", "bar", "ig")
      .filter(w.endsWith).sortBy(-_.length).headOption
    d match {
      case Some(s @ ("end" | "ing")) if inR2(w.length - s.length) =>
        w = w.dropRight(s.length)
        if (w.endsWith("ig") && inR2(w.length - 2) &&
          !(w.length >= 3 && w(w.length - 3) == 'e')) w = w.dropRight(2)
        else undouble()
      case Some("ig") if inR2(w.length - 2) &&
        !(w.length >= 3 && w(w.length - 3) == 'e') =>
        w = w.dropRight(2)
      case Some("lijk") if inR2(w.length - 4) =>
        w = w.dropRight(4)
        // repeat step 2
        if (w.endsWith("e") && inR1(w.length - 1) &&
          w.length >= 2 && !isV(w(w.length - 2))) {
          w = w.dropRight(1); undouble()
        }
      case Some("baar") if inR2(w.length - 4) => w = w.dropRight(4)
      case Some("bar") if inR2(w.length - 3) && eRemoved => w = w.dropRight(3)
      case _ =>
    }
    // step 4: undouble vowel — C v v C with final C ≠ I, vv ∈ aa/ee/oo/uu
    if (w.length >= 4) {
      val n = w.length
      val c2 = w(n - 1); val v2 = w(n - 2); val v1 = w(n - 3); val c1 = w(n - 4)
      if (!isV(c1) && !isV(c2) && c2 != 'I' && v1 == v2 && "aeou".contains(v1))
        w = w.substring(0, n - 2) + c2
    }
    w.replace('I', 'i').replace('Y', 'y')
  }

  // ------------------------------------------------------------------
  // Scandinavian trio (snowballstem.org/algorithms/{swedish,norwegian,
  // danish}/stemmer.html). All three share the "R1 with at least 3
  // letters before it" convention and a step-2 consonant-pair trim;
  // they differ in the suffix tables, the valid s-ending alphabets,
  // and Danish's extra undouble step.
  // ------------------------------------------------------------------

  private val svVowels = "aeiouyäåö".toSet

  /** Longest suffix of `w` from `sufs` whose start lies in R1. */
  private def longestInR1(w: String, r1: Int, sufs: Seq[String]): Option[String] =
    sufs.sortBy(-_.length).find(s => w.endsWith(s) && w.length - s.length >= r1)

  private val svStep1 = Seq("a", "arna", "erna", "heterna", "orna", "ad",
    "e", "ade", "ande", "arne", "are", "aste", "en", "anden", "aren",
    "heten", "ern", "ar", "er", "heter", "or", "as", "arnas", "ernas",
    "ornas", "es", "ades", "andes", "ens", "arens", "hetens", "erns",
    "at", "andet", "het", "ast")
  private val svSEnd = "bcdfghjklmnoprtvy".toSet

  def swedishStem(word0: String): String = {
    var w = word0
    val isV = (c: Char) => svVowels(c)
    var r1 = regionAfter(w, 0, isV)
    if (r1 < 3) r1 = 3
    // step 1: longest of the table (delete) vs bare s (delete after a
    // valid s-ending; the s-ending letter itself may sit before R1)
    longestInR1(w, r1, svStep1) match {
      case Some(suf) => w = w.dropRight(suf.length)
      case None =>
        if (w.endsWith("s") && w.length - 1 >= r1 && w.length >= 2 &&
          svSEnd(w(w.length - 2))) w = w.dropRight(1)
    }
    // step 2
    if (longestInR1(w, r1, Seq("dd", "gd", "nn", "dt", "gt", "kt", "tt")).isDefined)
      w = w.dropRight(1)
    // step 3
    longestInR1(w, r1, Seq("lig", "ig", "els", "löst", "fullt")) match {
      case Some("löst")  => w = w.dropRight(1)
      case Some("fullt") => w = w.dropRight(1)
      case Some(suf)     => w = w.dropRight(suf.length)
      case None          =>
    }
    w
  }

  private val noVowels = "aeiouyæåø".toSet

  private val noStep1 = Seq("a", "e", "ede", "ande", "ende", "ane",
    "ene", "hetene", "en", "heten", "ar", "er", "heter", "as", "es",
    "edes", "endes", "enes", "hetenes", "ens", "hetens", "ers", "ets",
    "et", "het", "ast", "s", "erte", "ert")
  private val noSEnd = "bcdfghjlmnoprtvyz".toSet

  def norwegianStem(word0: String): String = {
    var w = word0
    val isV = (c: Char) => noVowels(c)
    var r1 = regionAfter(w, 0, isV)
    if (r1 < 3) r1 = 3
    // step 1 (longest match; 's' needs a valid s-ending — plain
    // consonants, or k not preceded by a vowel; erte/ert → er)
    longestInR1(w, r1, noStep1) match {
      case Some("erte") | Some("ert") =>
        w = w.dropRight(if (w.endsWith("erte")) 4 else 3) + "er"
      case Some("s") =>
        val ok = w.length >= 2 && {
          val c = w(w.length - 2)
          noSEnd(c) || (c == 'k' && (w.length < 3 || !isV(w(w.length - 3))))
        }
        if (ok) w = w.dropRight(1)
      case Some(suf) => w = w.dropRight(suf.length)
      case None =>
    }
    // step 2: dt / vt → drop the t
    if (longestInR1(w, r1, Seq("dt", "vt")).isDefined) w = w.dropRight(1)
    // step 3
    longestInR1(w, r1, Seq("leg", "eleg", "ig", "eig", "lig", "elig",
      "els", "lov", "elov", "slov", "hetslov")) match {
      case Some(suf) => w = w.dropRight(suf.length)
      case None =>
    }
    w
  }

  private val daVowels = "aeiouyæåø".toSet

  private val daStep1 = Seq("hed", "ethed", "ered", "e", "erede",
    "ende", "erende", "ene", "erne", "ere", "en", "heden", "eren",
    "er", "heder", "erer", "heds", "es", "endes", "erendes", "enes",
    "ernes", "eres", "ens", "hedens", "erens", "ers", "ets", "erets",
    "et", "eret", "s")
  private val daSEnd = "abcdfghjklmnoprtvyzå".toSet

  def danishStem(word0: String): String = {
    var w = word0
    val isV = (c: Char) => daVowels(c)
    var r1 = regionAfter(w, 0, isV)
    if (r1 < 3) r1 = 3
    def step2(): Unit =
      if (longestInR1(w, r1, Seq("gd", "dt", "gt", "kt")).isDefined)
        w = w.dropRight(1)
    // step 1
    longestInR1(w, r1, daStep1) match {
      case Some("s") =>
        if (w.length >= 2 && daSEnd(w(w.length - 2))) w = w.dropRight(1)
      case Some(suf) => w = w.dropRight(suf.length)
      case None =>
    }
    step2()
    // step 3: igst loses its st unconditionally; then the d-suffixes
    // (re-running step 2 after a delete), and løst → løs
    if (w.endsWith("igst")) w = w.dropRight(2)
    longestInR1(w, r1, Seq("ig", "lig", "elig", "els", "løst")) match {
      case Some("løst") => w = w.dropRight(1)
      case Some(suf)    => w = w.dropRight(suf.length); step2()
      case None         =>
    }
    // step 4: undouble a final double consonant (last letter in R1)
    if (w.length >= 2 && w.length - 1 >= r1 &&
      w(w.length - 1) == w(w.length - 2) && !isV(w(w.length - 1)))
      w = w.dropRight(1)
    w
  }

  // ------------------------------------------------------------------
  // Finnish (snowballstem.org/algorithms/finnish/stemmer.html) —
  // agglutinative: particles → possessives → case endings → comparative
  // endings → i/t-plurals → tidy-up, with the case-ending step gating
  // the plural step. Verified by ts_lexize differential sweep like the
  // other ports.
  // ------------------------------------------------------------------

  private val fiVowels = "aeiouyäö".toSet
  // the restricted vowel set used by the Vi condition (no y)
  private val fiRestricted = "aeiouäö".toSet
  private val fiLongV = Set("aa", "ee", "ii", "oo", "uu", "ää", "öö")

  def finnishStem(word0: String): String = {
    var w = word0
    val isV = (c: Char) => fiVowels(c)
    val r1Start = regionAfter(w, 0, isV)
    val r2Start = regionAfter(w, r1Start, isV)
    def endsLV(s: String) =
      s.length >= 2 && fiLongV(s.substring(s.length - 2))

    /** Suffix-table matching, reverse-engineered against live pg 15
      * (sweep-31, ~16k-word differential): candidates must FIT inside
      * the region (a pattern starting left of R1 simply does not
      * participate — 'maihin' strips 'in' because 'hin' starts before
      * R1); the longest fitting pattern is tried first; a failed side
      * condition FALLS BACK to the next-shorter fitting pattern —
      * except the illative hVn class, whose vowel-harmony check
      * aborts the whole step ('aikahen' survives untouched while
      * 'aatonaattoden' falls back from 'den' to plain 'n').
      * Each candidate: (suffix, stem => Some(replacement) | None,
      * hardFail).
      */
    def applyFirst(rStart: Int,
        cands: Seq[(String, String => Option[String], Boolean)]): Boolean = {
      for ((suf, act, hard) <- cands.sortBy(-_._1.length)) {
        if (w.endsWith(suf) && w.length - suf.length >= rStart) {
          act(w.dropRight(suf.length)) match {
            case Some(res) => w = res; return true
            case None => if (hard) return false
          }
        }
      }
      false
    }
    val del = (stem: String) => Some(stem): Option[String]

    // step 1: particles (kin/kaan/… after n, t or a vowel; sti in R2)
    applyFirst(r1Start,
      Seq("kin", "kaan", "kään", "ko", "kö", "han", "hän", "pa", "pä")
        .map(suf => (suf, (stem: String) =>
          if (stem.nonEmpty && (stem.last == 'n' || stem.last == 't' ||
            isV(stem.last))) Some(stem) else None, false)) :+
      (("sti", (stem: String) =>
        if (w.length - 3 >= r2Start) Some(stem) else None, false)))

    // step 2: possessives
    applyFirst(r1Start, Seq(
      ("si", (stem: String) =>
        if (!stem.endsWith("k")) Some(stem) else None, false),
      ("ni", (stem: String) =>
        Some(if (stem.endsWith("kse")) stem.dropRight(1) + "i" else stem), false),
      ("nsa", del, false), ("nsä", del, false), ("mme", del, false),
      ("nne", del, false),
      ("an", (stem: String) =>
        if (Seq("ta", "ssa", "sta", "lla", "lta", "na").exists(stem.endsWith))
          Some(stem) else None, false),
      ("än", (stem: String) =>
        if (Seq("tä", "ssä", "stä", "llä", "ltä", "nä").exists(stem.endsWith))
          Some(stem) else None, false),
      ("en", (stem: String) =>
        if (Seq("lle", "ine").exists(stem.endsWith)) Some(stem) else None, false)))

    // step 3: case endings
    val hXn = Map("han" -> 'a', "hen" -> 'e', "hin" -> 'i', "hon" -> 'o',
      "hän" -> 'ä', "hön" -> 'ö')
    val caseRemoved = applyFirst(r1Start,
      hXn.toSeq.map { case (suf, v) => (suf, (stem: String) =>
        if (stem.nonEmpty && stem.last == v) Some(stem) else None, true) } ++
      Seq("siin", "den", "tten").map(suf => (suf, (stem: String) =>
        // Vi: i preceded by a restricted vowel
        if (stem.length >= 2 && stem.last == 'i' &&
          fiRestricted(stem(stem.length - 2))) Some(stem) else None, false)) ++
      Seq(("seen", (stem: String) =>
        if (endsLV(stem)) Some(stem) else None, false)) ++
      Seq("a", "ä").map(suf => (suf, (stem: String) =>
        // preceded by cv (consonant, then vowel)
        if (stem.length >= 2 && isV(stem.last) && !isV(stem(stem.length - 2)))
          Some(stem) else None, false)) ++
      Seq("tta", "ttä").map(suf => (suf, (stem: String) =>
        if (stem.endsWith("e")) Some(stem) else None, true)) ++
      Seq("ta", "tä", "ssa", "ssä", "sta", "stä", "lla", "llä", "lta",
        "ltä", "lle", "na", "nä", "ksi", "ine")
        .map(s0 => (s0, del, false)) ++
      Seq(("n", (stem: String) =>
        Some(if (endsLV(stem) || stem.endsWith("ie")) stem.dropRight(1)
          else stem), false)))

    // step 4: comparatives, in R2 (mpi family blocked after 'po')
    applyFirst(r2Start, Seq(
      ("impi", del, false), ("impa", del, false), ("impä", del, false),
      ("immi", del, false), ("imma", del, false), ("immä", del, false),
      ("eja", del, false), ("ejä", del, false)) ++
      Seq("mpi", "mpa", "mpä", "mmi", "mma", "mmä").map(suf =>
        (suf, (stem: String) =>
          if (!stem.endsWith("po")) Some(stem) else None, false)))

    // step 5: plurals — i/j-plural only after a removed case ending,
    // else a vowel-preceded t-plural (with a follow-up mma/imma trim)
    if (caseRemoved) {
      if ((w.endsWith("i") || w.endsWith("j")) && w.length - 1 >= r1Start)
        w = w.dropRight(1)
    } else if (w.endsWith("t") && w.length - 1 >= r1Start &&
      w.length >= 2 && isV(w(w.length - 2))) {
      w = w.dropRight(1)
      applyFirst(r2Start, Seq(
        ("imma", del, false),
        ("mma", (stem: String) =>
          if (!stem.endsWith("po")) Some(stem) else None, false)))
    }

    // step 6: tidy (live-pg-derived order — each fires at most once)
    // (a) shorten a final long vowel in R1
    if (endsLV(w) && w.length - 1 >= r1Start) w = w.dropRight(1)
    // (b) final a/ä/e/i after a consonant, in R2
    val dropV = Set('a', 'ä', 'e', 'i')
    if (w.length >= 2 && dropV(w.last) && !isV(w(w.length - 2)) &&
      w.length - 1 >= r2Start) w = w.dropRight(1)
    // (c) final a/ä/e/i after TWO consonants, in R1
    else if (w.length >= 3 && dropV(w.last) && !isV(w(w.length - 2)) &&
      !isV(w(w.length - 3)) && w.length - 1 >= r1Start) w = w.dropRight(1)
    // (d) oj / uj lose the j; jo loses the o
    // (d) oj/uj lose the j, jo loses the o — BOTH characters must sit
    //     inside R1 (snowball's backwards setlimit blocks consuming
    //     the context letter left of p1: 'jajo' keeps its o because
    //     the j is outside R1, 'ojjo' loses it)
    if ((w.endsWith("oj") || w.endsWith("uj")) && w.length - 2 >= r1Start)
      w = w.dropRight(1)
    if (w.endsWith("jo") && w.length - 2 >= r1Start) w = w.dropRight(1)
    // (e) undouble the consonant pair before any trailing vowel run.
    //     ('aatonaatto' → 'aatonaato', 'takk' → 'tak')
    var i = w.length - 1
    while (i >= 0 && isV(w(i))) i -= 1
    if (i >= 1 && !isV(w(i)) && w(i) == w(i - 1))
      w = w.substring(0, i) + w.substring(i + 1)
    w
  }

  // ------------------------------------------------------------------
  // Stop-word lists: the public Snowball project sets, as shipped in
  // PostgreSQL's tsearch_data (german.stop / french.stop /
  // spanish.stop) — part of each config, applied before stemming.
  // ------------------------------------------------------------------

  val germanStop: Set[String] = Set(
    "aber", "alle", "allem", "allen", "aller", "alles", "als",
    "also", "am", "an", "ander", "andere", "anderem", "anderen",
    "anderer", "anderes", "anderm", "andern", "anderr", "anders",
    "auch", "auf", "aus", "bei", "bin", "bis", "bist", "da",
    "damit", "dann", "der", "den", "des", "dem", "die", "das",
    "daß", "derselbe", "derselben", "denselben", "desselben",
    "demselben", "dieselbe", "dieselben", "dasselbe", "dazu",
    "dein", "deine", "deinem", "deinen", "deiner", "deines", "denn",
    "derer", "dessen", "dich", "dir", "du", "dies", "diese",
    "diesem", "diesen", "dieser", "dieses", "doch", "dort", "durch",
    "ein", "eine", "einem", "einen", "einer", "eines", "einig",
    "einige", "einigem", "einigen", "einiger", "einiges", "einmal",
    "er", "ihn", "ihm", "es", "etwas", "euer", "eure", "eurem",
    "euren", "eurer", "eures", "für", "gegen", "gewesen", "hab",
    "habe", "haben", "hat", "hatte", "hatten", "hier", "hin",
    "hinter", "ich", "mich", "mir", "ihr", "ihre", "ihrem", "ihren",
    "ihrer", "ihres", "euch", "im", "in", "indem", "ins", "ist",
    "jede", "jedem", "jeden", "jeder", "jedes", "jene", "jenem",
    "jenen", "jener", "jenes", "jetzt", "kann", "kein", "keine",
    "keinem", "keinen", "keiner", "keines", "können", "könnte",
    "machen", "man", "manche", "manchem", "manchen", "mancher",
    "manches", "mein", "meine", "meinem", "meinen", "meiner",
    "meines", "mit", "muss", "musste", "nach", "nicht", "nichts",
    "noch", "nun", "nur", "ob", "oder", "ohne", "sehr", "sein",
    "seine", "seinem", "seinen", "seiner", "seines", "selbst",
    "sich", "sie", "ihnen", "sind", "so", "solche", "solchem",
    "solchen", "solcher", "solches", "soll", "sollte", "sondern",
    "sonst", "über", "um", "und", "uns", "unse", "unsem", "unsen",
    "unser", "unses", "unter", "viel", "vom", "von", "vor",
    "während", "war", "waren", "warst", "was", "weg", "weil",
    "weiter", "welche", "welchem", "welchen", "welcher", "welches",
    "wenn", "werde", "werden", "wie", "wieder", "will", "wir",
    "wird", "wirst", "wo", "wollen", "wollte", "würde", "würden",
    "zu", "zum", "zur", "zwar", "zwischen")

  val frenchStop: Set[String] = Set(
    "au", "aux", "avec", "ce", "ces", "dans", "de", "des", "du",
    "elle", "en", "et", "eux", "il", "je", "la", "le", "leur",
    "lui", "ma", "mais", "me", "même", "mes", "moi", "mon", "ne",
    "nos", "notre", "nous", "on", "ou", "par", "pas", "pour", "qu",
    "que", "qui", "sa", "se", "ses", "son", "sur", "ta", "te",
    "tes", "toi", "ton", "tu", "un", "une", "vos", "votre", "vous",
    "c", "d", "j", "l", "à", "m", "n", "s", "t", "y", "été", "étée",
    "étées", "étés", "étant", "étante", "étants", "étantes", "suis",
    "es", "est", "sommes", "êtes", "sont", "serai", "seras", "sera",
    "serons", "serez", "seront", "serais", "serait", "serions",
    "seriez", "seraient", "étais", "était", "étions", "étiez",
    "étaient", "fus", "fut", "fûmes", "fûtes", "furent", "sois",
    "soit", "soyons", "soyez", "soient", "fusse", "fusses", "fût",
    "fussions", "fussiez", "fussent", "ayant", "ayante", "ayantes",
    "ayants", "eu", "eue", "eues", "eus", "ai", "as", "avons",
    "avez", "ont", "aurai", "auras", "aura", "aurons", "aurez",
    "auront", "aurais", "aurait", "aurions", "auriez", "auraient",
    "avais", "avait", "avions", "aviez", "avaient", "eut", "eûmes",
    "eûtes", "eurent", "aie", "aies", "ait", "ayons", "ayez",
    "aient", "eusse", "eusses", "eût", "eussions", "eussiez",
    "eussent")

  val spanishStop: Set[String] = Set(
    "de", "la", "que", "el", "en", "y", "a", "los", "del", "se",
    "las", "por", "un", "para", "con", "no", "una", "su", "al",
    "lo", "como", "más", "pero", "sus", "le", "ya", "o", "este",
    "sí", "porque", "esta", "entre", "cuando", "muy", "sin",
    "sobre", "también", "me", "hasta", "hay", "donde", "quien",
    "desde", "todo", "nos", "durante", "todos", "uno", "les", "ni",
    "contra", "otros", "ese", "eso", "ante", "ellos", "e", "esto",
    "mí", "antes", "algunos", "qué", "unos", "yo", "otro", "otras",
    "otra", "él", "tanto", "esa", "estos", "mucho", "quienes",
    "nada", "muchos", "cual", "poco", "ella", "estar", "estas",
    "algunas", "algo", "nosotros", "mi", "mis", "tú", "te", "ti",
    "tu", "tus", "ellas", "nosotras", "vosostros", "vosostras",
    "os", "mío", "mía", "míos", "mías", "tuyo", "tuya", "tuyos",
    "tuyas", "suyo", "suya", "suyos", "suyas", "nuestro", "nuestra",
    "nuestros", "nuestras", "vuestro", "vuestra", "vuestros",
    "vuestras", "esos", "esas", "estoy", "estás", "está", "estamos",
    "estáis", "están", "esté", "estés", "estemos", "estéis",
    "estén", "estaré", "estarás", "estará", "estaremos", "estaréis",
    "estarán", "estaría", "estarías", "estaríamos", "estaríais",
    "estarían", "estaba", "estabas", "estábamos", "estabais",
    "estaban", "estuve", "estuviste", "estuvo", "estuvimos",
    "estuvisteis", "estuvieron", "estuviera", "estuvieras",
    "estuviéramos", "estuvierais", "estuvieran", "estuviese",
    "estuvieses", "estuviésemos", "estuvieseis", "estuviesen",
    "estando", "estado", "estada", "estados", "estadas", "estad",
    "he", "has", "ha", "hemos", "habéis", "han", "haya", "hayas",
    "hayamos", "hayáis", "hayan", "habré", "habrás", "habrá",
    "habremos", "habréis", "habrán", "habría", "habrías",
    "habríamos", "habríais", "habrían", "había", "habías",
    "habíamos", "habíais", "habían", "hube", "hubiste", "hubo",
    "hubimos", "hubisteis", "hubieron", "hubiera", "hubieras",
    "hubiéramos", "hubierais", "hubieran", "hubiese", "hubieses",
    "hubiésemos", "hubieseis", "hubiesen", "habiendo", "habido",
    "habida", "habidos", "habidas", "soy", "eres", "es", "somos",
    "sois", "son", "sea", "seas", "seamos", "seáis", "sean", "seré",
    "serás", "será", "seremos", "seréis", "serán", "sería",
    "serías", "seríamos", "seríais", "serían", "era", "eras",
    "éramos", "erais", "eran", "fui", "fuiste", "fue", "fuimos",
    "fuisteis", "fueron", "fuera", "fueras", "fuéramos", "fuerais",
    "fueran", "fuese", "fueses", "fuésemos", "fueseis", "fuesen",
    "sintiendo", "sentido", "sentida", "sentidos", "sentidas",
    "siente", "sentid", "tengo", "tienes", "tiene", "tenemos",
    "tenéis", "tienen", "tenga", "tengas", "tengamos", "tengáis",
    "tengan", "tendré", "tendrás", "tendrá", "tendremos",
    "tendréis", "tendrán", "tendría", "tendrías", "tendríamos",
    "tendríais", "tendrían", "tenía", "tenías", "teníamos",
    "teníais", "tenían", "tuve", "tuviste", "tuvo", "tuvimos",
    "tuvisteis", "tuvieron", "tuviera", "tuvieras", "tuviéramos",
    "tuvierais", "tuvieran", "tuviese", "tuvieses", "tuviésemos",
    "tuvieseis", "tuviesen", "teniendo", "tenido", "tenida",
    "tenidos", "tenidas", "tened")


  val russianStop: Set[String] = Set(
    "и", "в", "во", "не", "что", "он", "на", "я", "с", "со", "как",
    "а", "то", "все", "она", "так", "его", "но", "да", "ты", "к",
    "у", "же", "вы", "за", "бы", "по", "только", "ее", "мне",
    "было", "вот", "от", "меня", "еще", "нет", "о", "из", "ему",
    "теперь", "когда", "даже", "ну", "вдруг", "ли", "если", "уже",
    "или", "ни", "быть", "был", "него", "до", "вас", "нибудь",
    "опять", "уж", "вам", "ведь", "там", "потом", "себя", "ничего",
    "ей", "может", "они", "тут", "где", "есть", "надо", "ней",
    "для", "мы", "тебя", "их", "чем", "была", "сам", "чтоб", "без",
    "будто", "чего", "раз", "тоже", "себе", "под", "будет", "ж",
    "тогда", "кто", "этот", "того", "потому", "этого", "какой",
    "совсем", "ним", "здесь", "этом", "один", "почти", "мой", "тем",
    "чтобы", "нее", "сейчас", "были", "куда", "зачем", "всех",
    "никогда", "можно", "при", "наконец", "два", "об", "другой",
    "хоть", "после", "над", "больше", "тот", "через", "эти", "нас",
    "про", "всего", "них", "какая", "много", "разве", "три", "эту",
    "моя", "впрочем", "хорошо", "свою", "этой", "перед", "иногда",
    "лучше", "чуть", "том", "нельзя", "такой", "им", "более",
    "всегда", "конечно", "всю", "между")

  val dutchStop: Set[String] = Set(
    "de", "en", "van", "ik", "te", "dat", "die", "in", "een", "hij",
    "het", "niet", "zijn", "is", "was", "op", "aan", "met", "als",
    "voor", "had", "er", "maar", "om", "hem", "dan", "zou", "of",
    "wat", "mijn", "men", "dit", "zo", "door", "over", "ze", "zich",
    "bij", "ook", "tot", "je", "mij", "uit", "der", "daar", "haar",
    "naar", "heb", "hoe", "heeft", "hebben", "deze", "u", "want",
    "nog", "zal", "me", "zij", "nu", "ge", "geen", "omdat", "iets",
    "worden", "toch", "al", "waren", "veel", "meer", "doen", "toen",
    "moet", "ben", "zonder", "kan", "hun", "dus", "alles", "onder",
    "ja", "eens", "hier", "wie", "werd", "altijd", "doch", "wordt",
    "wezen", "kunnen", "ons", "zelf", "tegen", "na", "reeds", "wil",
    "kon", "niets", "uw", "iemand", "geweest", "andere")

  val italianStop: Set[String] = Set(
    "ad", "al", "allo", "ai", "agli", "all", "agl", "alla", "alle",
    "con", "col", "coi", "da", "dal", "dallo", "dai", "dagli",
    "dall", "dagl", "dalla", "dalle", "di", "del", "dello", "dei",
    "degli", "dell", "degl", "della", "delle", "in", "nel", "nello",
    "nei", "negli", "nell", "negl", "nella", "nelle", "su", "sul",
    "sullo", "sui", "sugli", "sull", "sugl", "sulla", "sulle",
    "per", "tra", "contro", "io", "tu", "lui", "lei", "noi", "voi",
    "loro", "mio", "mia", "miei", "mie", "tuo", "tua", "tuoi",
    "tue", "suo", "sua", "suoi", "sue", "nostro", "nostra",
    "nostri", "nostre", "vostro", "vostra", "vostri", "vostre",
    "mi", "ti", "ci", "vi", "lo", "la", "li", "le", "gli", "ne",
    "il", "un", "uno", "una", "ma", "ed", "se", "perché", "anche",
    "come", "dov", "dove", "che", "chi", "cui", "non", "più",
    "quale", "quanto", "quanti", "quanta", "quante", "quello",
    "quelli", "quella", "quelle", "questo", "questi", "questa",
    "queste", "si", "tutto", "tutti", "a", "c", "e", "i", "l", "o",
    "ho", "hai", "ha", "abbiamo", "avete", "hanno", "abbia",
    "abbiate", "abbiano", "avrò", "avrai", "avrà", "avremo",
    "avrete", "avranno", "avrei", "avresti", "avrebbe", "avremmo",
    "avreste", "avrebbero", "avevo", "avevi", "aveva", "avevamo",
    "avevate", "avevano", "ebbi", "avesti", "ebbe", "avemmo",
    "aveste", "ebbero", "avessi", "avesse", "avessimo", "avessero",
    "avendo", "avuto", "avuta", "avuti", "avute", "sono", "sei",
    "è", "siamo", "siete", "sia", "siate", "siano", "sarò", "sarai",
    "sarà", "saremo", "sarete", "saranno", "sarei", "saresti",
    "sarebbe", "saremmo", "sareste", "sarebbero", "ero", "eri",
    "era", "eravamo", "eravate", "erano", "fui", "fosti", "fu",
    "fummo", "foste", "furono", "fossi", "fosse", "fossimo",
    "fossero", "essendo", "faccio", "fai", "facciamo", "fanno",
    "faccia", "facciate", "facciano", "farò", "farai", "farà",
    "faremo", "farete", "faranno", "farei", "faresti", "farebbe",
    "faremmo", "fareste", "farebbero", "facevo", "facevi", "faceva",
    "facevamo", "facevate", "facevano", "feci", "facesti", "fece",
    "facemmo", "faceste", "fecero", "facessi", "facesse",
    "facessimo", "facessero", "facendo", "sto", "stai", "sta",
    "stiamo", "stanno", "stia", "stiate", "stiano", "starò",
    "starai", "starà", "staremo", "starete", "staranno", "starei",
    "staresti", "starebbe", "staremmo", "stareste", "starebbero",
    "stavo", "stavi", "stava", "stavamo", "stavate", "stavano",
    "stetti", "stesti", "stette", "stemmo", "steste", "stettero",
    "stessi", "stesse", "stessimo", "stessero", "stando")

  val portugueseStop: Set[String] = Set(
    "de", "a", "o", "que", "e", "do", "da", "em", "um", "para",
    "com", "não", "uma", "os", "no", "se", "na", "por", "mais",
    "as", "dos", "como", "mas", "ao", "ele", "das", "à", "seu",
    "sua", "ou", "quando", "muito", "nos", "já", "eu", "também",
    "só", "pelo", "pela", "até", "isso", "ela", "entre", "depois",
    "sem", "mesmo", "aos", "seus", "quem", "nas", "me", "esse",
    "eles", "você", "essa", "num", "nem", "suas", "meu", "às",
    "minha", "numa", "pelos", "elas", "qual", "nós", "lhe", "deles",
    "essas", "esses", "pelas", "este", "dele", "tu", "te", "vocês",
    "vos", "lhes", "meus", "minhas", "teu", "tua", "teus", "tuas",
    "nosso", "nossa", "nossos", "nossas", "dela", "delas", "esta",
    "estes", "estas", "aquele", "aquela", "aqueles", "aquelas",
    "isto", "aquilo", "estou", "está", "estamos", "estão", "estive",
    "esteve", "estivemos", "estiveram", "estava", "estávamos",
    "estavam", "estivera", "estivéramos", "esteja", "estejamos",
    "estejam", "estivesse", "estivéssemos", "estivessem", "estiver",
    "estivermos", "estiverem", "hei", "há", "havemos", "hão",
    "houve", "houvemos", "houveram", "houvera", "houvéramos",
    "haja", "hajamos", "hajam", "houvesse", "houvéssemos",
    "houvessem", "houver", "houvermos", "houverem", "houverei",
    "houverá", "houveremos", "houverão", "houveria", "houveríamos",
    "houveriam", "sou", "somos", "são", "era", "éramos", "eram",
    "fui", "foi", "fomos", "foram", "fora", "fôramos", "seja",
    "sejamos", "sejam", "fosse", "fôssemos", "fossem", "for",
    "formos", "forem", "serei", "será", "seremos", "serão", "seria",
    "seríamos", "seriam", "tenho", "tem", "temos", "tém", "tinha",
    "tínhamos", "tinham", "tive", "teve", "tivemos", "tiveram",
    "tivera", "tivéramos", "tenha", "tenhamos", "tenham", "tivesse",
    "tivéssemos", "tivessem", "tiver", "tivermos", "tiverem",
    "terei", "terá", "teremos", "terão", "teria", "teríamos",
    "teriam")


  val swedishStop: Set[String] = Set(
    "och", "det", "att", "i", "en", "jag", "hon", "som", "han",
    "på", "den", "med", "var", "sig", "för", "så", "till", "är",
    "men", "ett", "om", "hade", "de", "av", "icke", "mig", "du",
    "henne", "då", "sin", "nu", "har", "inte", "hans", "honom",
    "skulle", "hennes", "där", "min", "man", "ej", "vid", "kunde",
    "något", "från", "ut", "när", "efter", "upp", "vi", "dem",
    "vara", "vad", "över", "än", "dig", "kan", "sina", "här",
    "ha", "mot", "alla", "under", "någon", "eller", "allt",
    "mycket", "sedan", "ju", "denna", "själv", "detta", "åt",
    "utan", "varit", "hur", "ingen", "mitt", "ni", "bli", "blev",
    "oss", "din", "dessa", "några", "deras", "blir", "mina",
    "samma", "vilken", "er", "sådan", "vår", "blivit", "dess",
    "inom", "mellan", "sådant", "varför", "varje", "vilka",
    "ditt", "vem", "vilket", "sitta", "sådana", "vart", "dina",
    "vars", "vårt", "våra", "ert", "era", "vilkas")

  val norwegianStop: Set[String] = Set(
    "og", "i", "jeg", "det", "at", "en", "et", "den", "til", "er",
    "som", "på", "de", "med", "han", "av", "ikke", "ikkje", "der",
    "så", "var", "meg", "seg", "men", "ett", "har", "om", "vi",
    "min", "mitt", "ha", "hadde", "hun", "nå", "over", "da",
    "ved", "fra", "du", "ut", "sin", "dem", "oss", "opp", "man",
    "kan", "hans", "hvor", "eller", "hva", "skal", "selv", "sjøl",
    "her", "alle", "vil", "bli", "ble", "blei", "blitt", "kunne",
    "inn", "når", "være", "kom", "noen", "noe", "ville", "dere",
    "som", "deres", "kun", "ja", "etter", "ned", "skulle",
    "denne", "for", "deg", "si", "sine", "sitt", "mot", "å",
    "meget", "hvorfor", "dette", "disse", "uten", "hvordan",
    "ingen", "din", "ditt", "blir", "samme", "hvilken", "hvilke",
    "sånn", "inni", "mellom", "vår", "hver", "hvem", "vors",
    "hvis", "både", "bare", "enn", "fordi", "før", "mange",
    "også", "slik", "vært", "være", "båe", "begge", "siden",
    "dykk", "dykkar", "dei", "deira", "deires", "deim", "di",
    "då", "eg", "ein", "eit", "eitt", "elles", "honom", "hjå",
    "ho", "hoe", "henne", "hennar", "hennes", "hoss", "hossen",
    "ikkje", "ingi", "inkje", "korleis", "korso", "kva", "kvar",
    "kvarhelst", "kven", "kvi", "kvifor", "me", "medan", "mi",
    "mine", "mykje", "no", "nokon", "noka", "nokor", "noko",
    "nokre", "si", "sia", "sidan", "so", "somt", "somme", "um",
    "upp", "vere", "vore", "verte", "vort", "varte", "vart")

  val danishStop: Set[String] = Set(
    "og", "i", "jeg", "det", "at", "en", "den", "til", "er",
    "som", "på", "de", "med", "han", "af", "for", "ikke", "der",
    "var", "mig", "sig", "men", "et", "har", "om", "vi", "min",
    "havde", "ham", "hun", "nu", "over", "da", "fra", "du", "ud",
    "sin", "dem", "os", "op", "man", "hans", "hvor", "eller",
    "hvad", "skal", "selv", "her", "alle", "vil", "blev", "kunne",
    "ind", "når", "være", "dog", "noget", "ville", "jo", "deres",
    "efter", "ned", "skulle", "denne", "end", "dette", "mit",
    "også", "under", "have", "dig", "anden", "hende", "mine",
    "alt", "meget", "sit", "sine", "vor", "mod", "disse", "hvis",
    "din", "nogle", "hos", "blive", "mange", "ad", "bliver",
    "hendes", "været", "thi", "jer", "sådan")


  val finnishStop: Set[String] = Set(
    "olla", "olen", "olet", "on", "olemme", "olette", "ovat",
    "ole", "oli", "olisi", "olisit", "olisin", "olisimme",
    "olisitte", "olisivat", "olit", "olin", "olimme", "olitte",
    "olivat", "ollut", "olleet", "en", "et", "ei", "emme", "ette",
    "eivät", "minä", "minun", "minut", "minua", "minussa",
    "minusta", "minuun", "minulla", "minulta", "minulle", "sinä",
    "sinun", "sinut", "sinua", "sinussa", "sinusta", "sinuun",
    "sinulla", "sinulta", "sinulle", "hän", "hänen", "hänet",
    "häntä", "hänessä", "hänestä", "häneen", "hänellä", "häneltä",
    "hänelle", "me", "meidän", "meidät", "meitä", "meissä",
    "meistä", "meihin", "meillä", "meiltä", "meille", "te",
    "teidän", "teidät", "teitä", "teissä", "teistä", "teihin",
    "teillä", "teiltä", "teille", "he", "heidän", "heidät",
    "heitä", "heissä", "heistä", "heihin", "heillä", "heiltä",
    "heille", "tämä", "tämän", "tätä", "tässä", "tästä", "tähän",
    "tallä", "tältä", "tälle", "tänä", "täksi", "tuo", "tuon",
    "tuotä", "tuossa", "tuosta", "tuohon", "tuolla", "tuolta",
    "tuolle", "tuona", "tuoksi", "se", "sen", "sitä", "siinä",
    "siitä", "siihen", "sillä", "siltä", "sille", "sinä", "siksi",
    "nämä", "näiden", "näitä", "näissä", "näistä", "näihin",
    "näillä", "näiltä", "näille", "näinä", "näiksi", "nuo",
    "noiden", "noita", "noissa", "noista", "noihin", "noilla",
    "noilta", "noille", "noina", "noiksi", "ne", "niiden",
    "niitä", "niissä", "niistä", "niihin", "niillä", "niiltä",
    "niille", "niinä", "niiksi", "kuka", "kenen", "kenet", "ketä",
    "kenessä", "kenestä", "keneen", "kenellä", "keneltä",
    "kenelle", "kenenä", "keneksi", "ketkä", "keiden", "ketkä",
    "keitä", "keissä", "keistä", "keihin", "keillä", "keiltä",
    "keille", "keinä", "keiksi", "mikä", "minkä", "minkä", "mitä",
    "missä", "mistä", "mihin", "millä", "miltä", "mille", "minä",
    "miksi", "mitkä", "joka", "jonka", "jota", "jossa", "josta",
    "johon", "jolla", "jolta", "jolle", "jona", "joksi", "jotka",
    "joiden", "joita", "joissa", "joista", "joihin", "joilla",
    "joilta", "joille", "joina", "joiksi", "että", "ja", "jos",
    "koska", "kuin", "mutta", "niin", "sekä", "sillä", "tai",
    "vaan", "vai", "vaikka", "kanssa", "mukaan", "noin", "poikki",
    "yli", "kun", "niin", "nyt", "itse")

  /** config-name → (stop words, stemmer); the text-search engine
    * dispatches every non-english config through this. */
  // ---- romanian -----------------------------------------------------------
  // Snowball romanian (snowballstem.org/algorithms/romanian/stemmer.html),
  // cedilla forms ş (U+015F) / ţ (U+0163) as shipped in pg 15's
  // dict_snowball; verified 0-diff against live pg 15 ts_lexize
  // (sweep-35). The comma-below forms ș/ț are ordinary consonants to
  // the algorithm, matching pg.

  private val roVowels = "aăâeiîou".toSet

  def romanianStem(word0: String): String = {
    // prelude: i/u between vowels become consonantal I/U
    val cs = word0.toCharArray
    var k = 1
    while (k < cs.length - 1) {
      val c = cs(k)
      if ((c == 'i' || c == 'u') && roVowels(cs(k - 1)) && roVowels(cs(k + 1)))
        cs(k) = if (c == 'i') 'I' else 'U'
      k += 1
    }
    var w = new String(cs)
    val isV = (c: Char) => roVowels(c)
    val rv = rvRomance(w, isV)
    val r1 = regionAfter(w, 0, isV)
    val r2 = regionAfter(w, r1, isV)
    // snowball `among` semantics: the LONGEST textual match wins and
    // its region test decides — a failed test does NOT fall back to a
    // shorter suffix
    def at(sufs: Seq[String], region: Int): Option[String] =
      sufs.filter(w.endsWith).sortBy(-_.length).headOption
        .filter(s => w.length - s.length >= region)

    // step 0: removal of plurals and articles (R1)
    at(Seq("ul", "ului", "aua", "ea", "ele", "elor", "ii", "iua", "iei",
      "iile", "iilor", "ilor", "ile", "atei", "aţie", "aţia"), r1)
      .foreach {
        case s @ ("ul" | "ului") => w = w.dropRight(s.length)
        case "aua" => w = w.dropRight(3) + "a"
        case s @ ("ea" | "ele" | "elor") => w = w.dropRight(s.length) + "e"
        case s @ ("ii" | "iua" | "iei" | "iile" | "iilor" | "ilor") =>
          w = w.dropRight(s.length) + "i"
        case "ile" =>
          if (!w.dropRight(3).endsWith("ab")) w = w.dropRight(3) + "i"
        case "atei" => w = w.dropRight(4) + "at"
        case s @ ("aţie" | "aţia") => w = w.dropRight(s.length) + "aţi"
        case _ =>
      }

    // step 1: reduction of combining suffixes (R1), repeated
    var standardRemoved = false
    var changed = true
    while (changed) {
      changed = false
      at(Seq("abilitate", "abilitati", "abilităi", "abilităţi",
        "ibilitate",
        "ivitate", "ivitati", "ivităi", "ivităţi",
        "icitate", "icitati", "icităi", "icităţi", "icator", "icatori",
        "iciv", "iciva", "icive", "icivi", "icivă",
        "ical", "icala", "icale", "icali", "icală",
        "ativ", "ativa", "ative", "ativi", "ativă", "aţiune",
        "atoare", "ator", "atori", "ătoare", "ător", "ători",
        "itiv", "itiva", "itive", "itivi", "itivă", "iţiune",
        "itoare", "itor", "itori"), r1).foreach { s =>
        val repl =
          if (s.startsWith("abilit")) "abil"
          else if (s == "ibilitate") "ibil"
          else if (s.startsWith("ivit")) "iv"
          else if (s.startsWith("icit") || s.startsWith("icat") ||
            s.startsWith("iciv") || s.startsWith("ical")) "ic"
          else if (s.startsWith("ativ") || s == "aţiune" ||
            s.startsWith("atoare") || s.startsWith("ator") ||
            s.startsWith("ătoare") || s.startsWith("ător")) "at"
          else "it"
        w = w.dropRight(s.length) + repl
        changed = true
        standardRemoved = true
      }
    }

    // step 2: standard suffixes (R2)
    at(Seq("at", "ata", "ată", "ati", "ate", "ut", "uta", "ută", "uti",
      "ute", "it", "ita", "ită", "iti", "ite", "ic", "ica", "ice", "ici",
      "ică", "abil", "abila", "abile", "abili", "abilă", "ibil", "ibila",
      "ibile", "ibili", "ibilă", "oasa", "oasă", "oase", "os", "osi",
      "oşi", "ant", "anta", "ante", "anti", "antă", "ator", "atori",
      "itate", "itati", "ităi", "ităţi", "iv", "iva", "ive", "ivi",
      "ivă", "iune", "iuni", "ism", "isme", "ist", "ista", "iste",
      "isti", "istă", "işti"), r2).foreach { s =>
      s match {
        case "iune" | "iuni" =>
          // delete only after ţ, which reverts to t
          if (w.dropRight(s.length).endsWith("ţ")) {
            w = w.dropRight(s.length + 1) + "t"
            standardRemoved = true
          }
        case "ism" | "isme" | "ist" | "ista" | "iste" | "isti" | "istă" |
            "işti" =>
          w = w.dropRight(s.length) + "ist"
          standardRemoved = true
        case _ =>
          w = w.dropRight(s.length)
          standardRemoved = true
      }
    }

    // step 3: verb suffixes (RV) — only when steps 1-2 removed nothing
    if (!standardRemoved) {
      val groupA = Seq("are", "ere", "ire", "âre", "ind", "ând", "indu",
        "ându", "eze", "ească", "ez", "ezi", "ează", "esc", "eşti",
        "eşte", "ăsc", "ăşti", "ăşte", "am", "ai", "au", "eam", "eai",
        "ea", "eaţi", "eau", "iam", "iai", "ia", "iaţi", "iau", "ui",
        "aşi", "arăm", "arăţi", "ară", "uşi", "urăm", "urăţi", "ură",
        "işi", "irăm", "irăţi", "iră", "âi", "âşi", "ârăm", "ârăţi",
        "âră", "asem", "aseşi", "ase", "aserăm", "aserăţi", "aseră",
        "isem", "iseşi", "ise", "iserăm", "iserăţi", "iseră", "âsem",
        "âseşi", "âse", "âserăm", "âserăţi", "âseră", "usem", "useşi",
        "use", "userăm", "userăţi", "useră")
      val groupB = Seq("ăm", "aţi", "em", "eţi",
        "im", "iţi", "âm", "âţi", "seşi", "serăm", "serăţi", "seră",
        "sei", "se", "sesem", "seseşi", "sese", "seserăm", "seserăţi",
        "seseră")
      // the verb step is `setlimit tomark pV`: matching itself is
      // CLIPPED to the RV window (a suffix reaching before RV is not
      // even a candidate), unlike the longest-then-test steps above
      val all = (groupA.map(_ -> true) ++ groupB.map(_ -> false))
        .filter { case (s, _) => w.endsWith(s) && w.length - s.length >= rv }
        .sortBy(-_._1.length)
      all.headOption.foreach { case (s, isA) =>
        if (isA) {
          val p = w.length - s.length - 1
          if (p >= rv &&
            (!roVowels(w.charAt(p)) || w.charAt(p) == 'u' ||
              w.charAt(p) == 'U' || w.charAt(p) == 'I'))
            w = w.dropRight(s.length)
        } else w = w.dropRight(s.length)
      }
    }

    // step 4: final vowel (RV)
    at(Seq("a", "e", "i", "ă", "ie"), rv).foreach(s => w = w.dropRight(s.length))

    w.replace('I', 'i').replace('U', 'u')
  }

  // ---- hungarian -----------------------------------------------------------
  // Snowball hungarian (snowballstem.org/algorithms/hungarian/stemmer.html);
  // verified 0-diff against live pg 15 ts_lexize (sweep-35).

  private val huVowels = "aáeéiíoóöőuúüű".toSet
  private val huDigraphs = Seq("dzs", "cs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")
  private val huDoubles = Seq("ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs",
    "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn", "pp", "rr",
    "ss", "tt", "vv", "zz")

  /** Hungarian R1: word starts with a vowel → after the first consonant
    * or digraph; starts with a consonant → after the first vowel. */
  private def huR1(w: String): Int = {
    if (w.isEmpty) return 0
    if (huVowels(w.charAt(0))) {
      var i = 1
      while (i < w.length && huVowels(w.charAt(i))) i += 1
      if (i >= w.length) w.length
      else i + huDigraphs.find(d => w.startsWith(d, i)).map(_.length).getOrElse(1)
    } else {
      var i = 1
      while (i < w.length && !huVowels(w.charAt(i))) i += 1
      if (i >= w.length) w.length else i + 1
    }
  }

  /** pg's tsearch_data/hungarian.stop (199 words). */
  val hungarianStop: Set[String] = Set(
    "a", "ahogy", "ahol", "aki", "akik", "akkor", "alatt", "által",
    "általában", "amely", "amelyek", "amelyekben", "amelyeket", "amelyet",
    "amelynek", "ami", "amit", "amolyan", "amíg", "amikor", "át", "abban",
    "ahhoz", "annak", "arra", "arról", "az", "azok", "azon", "azt",
    "azzal", "azért", "aztán", "azután", "azonban", "bár", "be", "belül",
    "benne", "cikk", "cikkek", "cikkeket", "csak", "de", "e", "eddig",
    "egész", "egy", "egyes", "egyetlen", "egyéb", "egyik", "egyre",
    "ekkor", "el", "elég", "ellen", "elő", "először", "előtt", "első",
    "én", "éppen", "ebben", "ehhez", "emilyen", "ennek", "erre", "ez",
    "ezt", "ezek", "ezen", "ezzel", "ezért", "és", "fel", "felé", "hanem",
    "hiszen", "hogy", "hogyan", "igen", "így", "illetve", "ill.", "ill",
    "ilyen", "ilyenkor", "ison", "ismét", "itt", "jó", "jól", "jobban",
    "kell", "kellett", "keresztül", "keressünk", "ki", "kívül", "között",
    "közül", "legalább", "lehet", "lehetett", "legyen", "lenne", "lenni",
    "lesz", "lett", "maga", "magát", "majd", "majd", "már", "más", "másik",
    "meg", "még", "mellett", "mert", "mely", "melyek", "mi", "mit", "míg",
    "miért", "milyen", "mikor", "minden", "mindent", "mindenki", "mindig",
    "mint", "mintha", "mivel", "most", "nagy", "nagyobb", "nagyon", "ne",
    "néha", "nekem", "neki", "nem", "néhány", "nélkül", "nincs", "olyan",
    "ott", "össze", "ő", "ők", "őket", "pedig", "persze", "rá", "s",
    "saját", "sem", "semmi", "sok", "sokat", "sokkal", "számára",
    "szemben", "szerint", "szinte", "talán", "tehát", "teljes", "tovább",
    "továbbá", "több", "úgy", "ugyanis", "új", "újabb", "újra", "után",
    "utána", "utolsó", "vagy", "vagyis", "valaki", "valami", "valamint",
    "való", "vagyok", "van", "vannak", "volt", "voltam", "voltak",
    "voltunk", "vissza", "vele", "viszont", "volna")

  def hungarianStem(word0: String): String = {
    var w = word0
    val r1 = huR1(w)
    def inR1(sufLen: Int): Boolean = w.length - sufLen >= r1
    // longest textual match, then the R1 test decides (no fallback)
    def pick(sufs: Seq[String]): Option[String] =
      sufs.filter(w.endsWith).sortBy(-_.length).headOption
        .filter(s => inR1(s.length))
    def endsDouble(stemEnd: Int): Option[String] =
      huDoubles.find(d => stemEnd >= d.length &&
        w.regionMatches(stemEnd - d.length, d, 0, d.length))
    def vEnding(): Unit = {
      if (w.endsWith("á") && w.length - 1 >= r1) w = w.dropRight(1) + "a"
      else if (w.endsWith("é") && w.length - 1 >= r1) w = w.dropRight(1) + "e"
    }

    // 1. instrumental case: al/el after a double consonant, undoubled
    // (a doubled digraph sheds its FIRST letter: nny → ny)
    pick(Seq("al", "el")).foreach { s =>
      val stemEnd = w.length - s.length
      endsDouble(stemEnd).foreach { d =>
        w = w.substring(0, stemEnd - d.length) + d.tail + w.substring(stemEnd)
        w = w.dropRight(s.length)
      }
    }
    // 2. case endings
    pick(Seq("ban", "ben", "ba", "be", "ra", "re", "nak", "nek", "val",
      "vel", "tól", "től", "ról", "ről", "ból", "ből", "hoz", "hez",
      "höz", "nál", "nél", "ig", "at", "et", "ot", "öt", "ért", "képp",
      "képpen", "kor", "ul", "ül", "vá", "vé", "onként", "enként",
      "anként", "ként", "en", "on", "an", "ön", "n", "t")).foreach { s =>
      w = w.dropRight(s.length)
      vEnding()
    }
    // 3. special cases
    pick(Seq("én", "án", "ánként")).foreach {
      case "én" => w = w.dropRight(2) + "e"
      case "án" => w = w.dropRight(2) + "a"
      case "ánként" => w = w.dropRight(6) + "a"
      case _ =>
    }
    // 4. other cases
    pick(Seq("astul", "estül", "stul", "stül", "ástul", "éstül")).foreach {
      case "ástul" => w = w.dropRight(5) + "a"
      case "éstül" => w = w.dropRight(5) + "e"
      case s => w = w.dropRight(s.length)
    }
    // 5. factive case: á/é after a double consonant, undoubled
    pick(Seq("á", "é")).foreach { s =>
      val stemEnd = w.length - s.length
      endsDouble(stemEnd).foreach { d =>
        w = w.substring(0, stemEnd - d.length) + d.tail + w.substring(stemEnd)
        w = w.dropRight(s.length)
      }
    }
    // 6. owned
    pick(Seq("oké", "öké", "aké", "eké", "ké", "éi", "áéi", "ééi", "é",
      "éé", "áké", "éké")).foreach {
      case "áké" | "áéi" => w = w.dropRight(3) + "a"
      case "éké" | "ééi" => w = w.dropRight(3) + "e"
      case "éé" => w = w.dropRight(2) + "e"
      case s => w = w.dropRight(s.length)
    }
    // 7. singular owner suffixes
    pick(Seq("ünk", "unk", "nk", "juk", "jük", "uk", "ük", "em", "om",
      "am", "m", "od", "ed", "ad", "öd", "d", "ja", "je", "a", "e", "o",
      "ánk", "ájuk", "ám", "ád", "á", "énk", "éjük", "ém", "éd", "é"))
      .foreach {
        case "ánk" => w = w.dropRight(3) + "a"
        case "énk" => w = w.dropRight(3) + "e"
        case "ájuk" => w = w.dropRight(4) + "a"
        case "éjük" => w = w.dropRight(4) + "e"
        case "ám" | "ád" => w = w.dropRight(2) + "a"
        case "ém" | "éd" => w = w.dropRight(2) + "e"
        case "á" => w = w.dropRight(1) + "a"
        case "é" => w = w.dropRight(1) + "e"
        case s => w = w.dropRight(s.length)
      }
    // 8. plural owner suffixes
    pick(Seq("jaim", "jeim", "aim", "eim", "im", "jaid", "jeid", "aid",
      "eid", "id", "jai", "jei", "ai", "ei", "i", "jaink", "jeink",
      "eink", "aink", "ink", "jaitok", "jeitek", "aitok", "eitek",
      "itek", "jeik", "jaik", "aik", "eik", "ik", "áim", "áid", "ái",
      "áink", "áitok", "áik", "éim", "éid", "éi", "éink", "éitek",
      "éik")).foreach { s =>
      if (s.startsWith("á")) w = w.dropRight(s.length) + "a"
      else if (s.startsWith("é")) w = w.dropRight(s.length) + "e"
      else w = w.dropRight(s.length)
    }
    // 9. plural
    pick(Seq("ák", "ék", "ök", "ok", "ek", "ak", "k")).foreach {
      case "ák" => w = w.dropRight(2) + "a"
      case "ék" => w = w.dropRight(2) + "e"
      case s => w = w.dropRight(s.length)
    }
    w
  }

  // ---- indonesian ----------------------------------------------------------
  // Snowball indonesian (snowballstem.org/algorithms/indonesian/stemmer.html),
  // reverse-engineered rule-for-rule against live pg 15 ts_lexize and
  // verified 0-diff over 6,300 captured pairs (sweep-35): measure =
  // vowel count, gates every removal at > 2; particles kah/lah/pun and
  // possessives ku/mu/nya come off first; then ONE first-order prefix
  // (me-/pe- nasal families with their sound restorations: men+y+V →
  // s, mem+V → p; di/ke/ter; pe/per/pelajar) which records a prefix
  // CLASS driving the suffix flags (kan barred after classes 2-3, an
  // after 1, i after >2 or an 's'); then one suffix; then ONE
  // second-order prefix (ber/bel-ajar/be-C-er, per/pel-ajar) — matched
  // AFTER any restored substitution letter, which is why "memekoran" →
  // pekoran keeps its restored p but "memperbaiki" strips per. With no
  // first-order prefix the order flips: second-order prefix first,
  // then suffix.

  private val idVowels = "aeiou".toSet

  def indonesianStem(word0: String): String = {
    var w = word0
    def m: Int = w.count(idVowels)
    if (m > 2) {
      Seq("kah", "lah", "pun").find(w.endsWith).foreach(p =>
        w = w.dropRight(p.length))
    }
    if (m > 2) {
      Seq("nya", "ku", "mu").find(w.endsWith).foreach(p =>
        w = w.dropRight(p.length))
    }
    var prefixClass = 0
    // suffix flags: kan barred after ke(3)/pe-nasal(3)/pe-per(2);
    // an barred after the verbal class (1); i barred after class > 2
    // or when an 's' precedes it
    def removeSuffix(): Unit = {
      if (w.endsWith("kan") && prefixClass != 2 && prefixClass != 3)
        w = w.dropRight(3)
      else if (w.endsWith("an") && prefixClass != 1)
        w = w.dropRight(2)
      else if (w.endsWith("i") && prefixClass <= 2 && !w.endsWith("si"))
        w = w.dropRight(1)
    }
    // second-order prefix, matched at `off` (after a restored letter)
    def removeSecondOrder(off: Int): Unit = {
      val x = w.substring(off)
      if (x.startsWith("belajar")) {
        w = w.substring(0, off) + "ajar" + x.substring(7); prefixClass = 4
      } else if (x.startsWith("ber")) {
        w = w.substring(0, off) + x.substring(3); prefixClass = 4
      } else if (x.startsWith("be") && x.length > 4 &&
        !idVowels(x.charAt(2)) && x.startsWith("er", 3)) {
        w = w.substring(0, off) + x.substring(2); prefixClass = 4
      } else if (x.startsWith("pelajar")) {
        w = w.substring(0, off) + "ajar" + x.substring(7)
      } else if (x.startsWith("per")) {
        w = w.substring(0, off) + x.substring(3)
      }
    }
    if (m > 2) {
      val firstOrder = Seq("meng", "men", "mem", "me", "peng", "pen",
        "pem", "pelajar", "per", "pe", "di", "ke", "ter")
        .filter(w.startsWith).sortBy(-_.length).headOption
      firstOrder match {
        case Some(p) =>
          val rest = w.substring(p.length)
          var off = 0
          p match {
            case "men" | "pen" if rest.startsWith("y") &&
                rest.length > 1 && idVowels(rest.charAt(1)) =>
              w = "s" + rest.substring(1); off = 1
              prefixClass = if (p == "men") 1 else 3
            case "mem" | "pem" if rest.nonEmpty && idVowels(rest.charAt(0)) =>
              w = "p" + rest; off = 1
              prefixClass = if (p == "mem") 1 else 3
            case "meng" | "men" | "mem" | "me" => w = rest; prefixClass = 1
            case "peng" | "pen" | "pem" => w = rest; prefixClass = 3
            case "pelajar" => w = "ajar" + rest // class stays 0
            case "pe" | "per" => w = rest; prefixClass = 2
            case "di" | "ter" => w = rest; prefixClass = 1
            case "ke" => w = rest; prefixClass = 3
            case _ =>
          }
          if (m > 2) removeSuffix()
          if (m > 2) removeSecondOrder(off)
        case None =>
          if (m > 2) removeSecondOrder(0)
          if (m > 2) removeSuffix()
      }
    }
    w
  }


  // ------------------------------------------------------------------
  // Turkish (snowballstem.org/algorithms/turkish/stemmer.html)
  //
  // Ported from the PUBLIC Snowball turkish algorithm, reconstructed
  // by black-box differential probing: verified to 0 diffs against
  // BOTH live pg 15 ts_lexize('turkish_stem', w) (27,980 words:
  // the 7,980-word morphological cross-product sweep + a 20,000-word
  // random-string sweep) AND libstemmer 2.2 (190,308 additional
  // random/adversarial words) — sweep-41. Suffix-rich Turkish needs
  // the full Snowball slice machinery: the nDA/nA branches MARK the
  // case suffix and let an inner ki-chain delete from the MIDDLE of
  // the word (baysininkinda → baysinda), the only mid-word deletion
  // in the 17-config family.
  // ------------------------------------------------------------------

  val turkishStop: Set[String] = Set(
    "acaba",
    "ama",
    "aslında",
    "az",
    "bazı",
    "belki",
    "biri",
    "birkaç",
    "birşey",
    "biz",
    "bu",
    "çok",
    "çünkü",
    "da",
    "daha",
    "de",
    "defa",
    "diye",
    "eğer",
    "en",
    "gibi",
    "hem",
    "hep",
    "hepsi",
    "her",
    "hiç",
    "için",
    "ile",
    "ise",
    "kez",
    "ki",
    "kim",
    "mı",
    "mu",
    "mü",
    "nasıl",
    "ne",
    "neden",
    "nerde",
    "nerede",
    "nereye",
    "niçin",
    "niye",
    "o",
    "sanki",
    "şey",
    "siz",
    "şu",
    "tüm",
    "ve",
    "veya",
    "ya",
    "yani")


  private val tr_vowels = Set('a', 'e', 'ı', 'i', 'o', 'ö', 'u', 'ü')
  private val tr_uVow = Set('ı', 'i', 'u', 'ü')

  private def tr_partners(c: Char): String = c match {
    case 'a' => "aıou"
    case 'e' => "eiöü"
    case 'ı' => "aı"
    case 'i' => "ei"
    case 'o' => "ou"
    case 'ö' => "öü"
    case 'u' => "ou"
    case 'ü' => "öü"
    case _ => ""
  }

  /** check_vowel_harmony over s[0,end): the last vowel must have a
    * partner ANYWHERE to its left (Snowball goto — non-tr_vowels never
    * block). */
  private def tr_harmony(s: String, end: Int): Boolean = {
    var v = end - 1
    while (v >= 0 && !tr_vowels(s(v))) v -= 1
    if (v < 0) return false
    val p = tr_partners(s(v))
    var j = 0
    while (j < v) {
      if (p.indexOf(s(j).toInt) >= 0) return true
      j += 1
    }
    false
  }

  /** Optional-letter rule ((y)/(n)/(U) suffixes): the char at p-2 must
    * satisfy T whether or not the optional letter is present; when
    * s(p-1) is the letter it joins the suffix. Returns the suffix
    * start or -1. */
  private def tr_optLetter(s: String, p: Int, isL: Char => Boolean,
      isT: Char => Boolean): Int =
    if (p >= 2 && isT(s(p - 2))) { if (isL(s(p - 1))) p - 1 else p }
    else -1

  private def tr_optY(s: String, p: Int): Int =
    tr_optLetter(s, p, _ == 'y', tr_vowels)
  private def tr_optN(s: String, p: Int): Int =
    tr_optLetter(s, p, _ == 'n', tr_vowels)
  private def tr_optU(s: String, p: Int): Int =
    tr_optLetter(s, p, tr_uVow, c => !tr_vowels(c))
  /** (s)U: the full optional-letter shape (probe: sorunca strips the
    * exposed u, altınca keeps its ı — the no-s variant needs a vowel
    * two back, like (y)). */
  private def tr_optS(s: String, p: Int): Int =
    tr_optLetter(s, p, _ == 's', tr_vowels)

  /** longest form of `forms` ending at `end`, as its start index. */
  private def tr_among(s: String, end: Int, forms: Seq[String]): Int = {
    var best = -1
    forms.foreach { f =>
      if (f.length <= end && best < f.length &&
        s.regionMatches(end - f.length, f, 0, f.length))
        best = f.length
    }
    if (best < 0) -1 else end - best
  }

  // ---- mark routines: Option[suffix start] given current end -------------

  private val tr_larF = Seq("lar", "ler")
  private val tr_durF = Seq("dır", "dir", "dur", "dür", "tır", "tir", "tur", "tür")
  private val tr_yduF = Seq("dı", "di", "du", "dü", "tı", "ti", "tu", "tü")
  private val tr_ysaF = Seq("sa", "se")
  private val tr_ymusF = Seq("mış", "miş", "muş", "müş")
  private val tr_sunuzF = Seq("sınız", "siniz", "sunuz", "sünüz")
  private val tr_yuzF = Seq("ız", "iz", "uz", "üz")
  private val tr_sunF = Seq("sın", "sin", "sun", "sün")
  private val tr_yumF = Seq("ım", "im", "um", "üm")
  private val tr_nuzF = Seq("nız", "niz", "nuz", "nüz")
  private val tr_lariF = Seq("ları", "leri")
  private val tr_nuF = Seq("nı", "ni", "nu", "nü")
  private val tr_naF = Seq("na", "ne")
  private val tr_danF = Seq("dan", "den", "tan", "ten")
  private val tr_daF = Seq("da", "de", "ta", "te")
  // only the voiced d-forms exist for the marked n-case branches
  // (güneınısınte routes through DA + the n chain, never a mark)
  private val tr_ndanF = Seq("ndan", "nden")
  private val tr_ndaF = Seq("nda", "nde")
  private val tr_nunF = Seq("ın", "in", "un", "ün")
  private val tr_ncaF = Seq("ca", "ce")
  private val tr_ylaF = Seq("la", "le")
  private val tr_uF = Seq("ı", "i", "u", "ü")
  private val tr_muzF = Seq("mız", "miz", "muz", "müz")

  private def tr_mLar(s: String, e: Int): Int =
    if (tr_harmony(s, e)) tr_among(s, e, tr_larF) else -1
  private def tr_mDur(s: String, e: Int): Int =
    if (tr_harmony(s, e)) tr_among(s, e, tr_durF) else -1
  private def tr_mYdu(s: String, e: Int): Int =
    if (!tr_harmony(s, e)) -1
    else { val p = tr_among(s, e, tr_yduF); if (p < 0) -1 else tr_optY(s, p) }
  private def tr_mYsa(s: String, e: Int): Int = {
    val p = tr_among(s, e, tr_ysaF); if (p < 0) -1 else tr_optY(s, p)
  }
  private def tr_mYmus(s: String, e: Int): Int =
    if (!tr_harmony(s, e)) -1
    else { val p = tr_among(s, e, tr_ymusF); if (p < 0) -1 else tr_optY(s, p) }
  private def tr_mYken(s: String, e: Int): Int = {
    val p = tr_among(s, e, Seq("ken")); if (p < 0) -1 else tr_optY(s, p)
  }
  private def tr_mSunuz(s: String, e: Int): Int =
    if (tr_harmony(s, e)) tr_among(s, e, tr_sunuzF) else -1
  private def tr_mYuz(s: String, e: Int): Int =
    if (!tr_harmony(s, e)) -1
    else { val p = tr_among(s, e, tr_yuzF); if (p < 0) -1 else tr_optY(s, p) }
  private def tr_mSun(s: String, e: Int): Int =
    if (tr_harmony(s, e)) tr_among(s, e, tr_sunF) else -1
  private def tr_mYum(s: String, e: Int): Int =
    if (!tr_harmony(s, e)) -1
    else { val p = tr_among(s, e, tr_yumF); if (p < 0) -1 else tr_optY(s, p) }
  private def tr_mNuz(s: String, e: Int): Int =
    if (tr_harmony(s, e)) tr_among(s, e, tr_nuzF) else -1
  private def tr_mLari(s: String, e: Int): Int =
    if (tr_harmony(s, e)) tr_among(s, e, tr_lariF) else -1
  /** the n-case family (nDAn/nDA/nU/nA) requires a vowel immediately
    * before the suffix AND a consonant before that (probe-derived:
    * ablanda/tapına strip, ablaunda/aileinda/ablaina do not). */
  private def tr_cvBefore(s: String, p: Int): Int =
    if (p >= 2 && tr_vowels(s(p - 1)) && !tr_vowels(s(p - 2))) p else -1
  private def tr_mNu(s: String, e: Int): Int =
    if (!tr_harmony(s, e)) -1
    else { val p = tr_among(s, e, tr_nuF); if (p < 0) -1 else tr_cvBefore(s, p) }
  private def tr_mNa(s: String, e: Int): Int =
    if (!tr_harmony(s, e)) -1
    else { val p = tr_among(s, e, tr_naF); if (p < 0) -1 else tr_cvBefore(s, p) }
  private def tr_mDan(s: String, e: Int): Int =
    if (tr_harmony(s, e)) tr_among(s, e, tr_danF) else -1
  private def tr_mDa(s: String, e: Int): Int =
    if (tr_harmony(s, e)) tr_among(s, e, tr_daF) else -1
  private def tr_mNdan(s: String, e: Int): Int =
    if (!tr_harmony(s, e)) -1
    else { val p = tr_among(s, e, tr_ndanF); if (p < 0) -1 else tr_cvBefore(s, p) }
  private def tr_mNda(s: String, e: Int): Int =
    if (!tr_harmony(s, e)) -1
    else { val p = tr_among(s, e, tr_ndaF); if (p < 0) -1 else tr_cvBefore(s, p) }
  private def tr_mNun(s: String, e: Int): Int =
    if (!tr_harmony(s, e)) -1
    else { val p = tr_among(s, e, tr_nunF); if (p < 0) -1 else tr_optN(s, p) }
  private def tr_mNca(s: String, e: Int): Int =
    if (!tr_harmony(s, e)) -1
    else { val p = tr_among(s, e, tr_ncaF); if (p < 0) -1 else tr_optN(s, p) }
  private def tr_mYla(s: String, e: Int): Int =
    if (!tr_harmony(s, e)) -1
    else { val p = tr_among(s, e, tr_ylaF); if (p < 0) -1 else tr_optY(s, p) }
  private def tr_mKi(s: String, e: Int): Int = tr_among(s, e, Seq("ki"))
  private def tr_mYu(s: String, e: Int): Int =
    if (!tr_harmony(s, e)) -1
    else { val p = tr_among(s, e, tr_uF); if (p < 0) -1 else tr_optY(s, p) }
  private def tr_mSu(s: String, e: Int): Int =
    if (!tr_harmony(s, e)) -1
    else { val p = tr_among(s, e, tr_uF); if (p < 0) -1 else tr_optS(s, p) }
  /** unconstrained trailing U — the fallback the n-case continuations
    * use when sU fails (probe: adlesü→adles against tr_harmony). */
  private def tr_mBareU(s: String, e: Int): Int = tr_among(s, e, tr_uF)
  // possessives carry NO tr_harmony check (probe: ablamiz→abla strips
  // against tr_harmony); validation is the optional-U shape
  private def tr_mMuz(s: String, e: Int): Int = {
    val p = tr_among(s, e, tr_muzF); if (p < 0) -1 else tr_optU(s, p)
  }
  private def tr_mNuzPoss(s: String, e: Int): Int = {
    val p = tr_among(s, e, tr_nuzF); if (p < 0) -1 else tr_optU(s, p)
  }
  private def tr_mM(s: String, e: Int): Int =
    if (e >= 1 && s(e - 1) == 'm') tr_optU(s, e - 1) else -1
  /** possessive n: validated like (U)n but strips ONLY the n — the
    * exposed U then chains (kartın→kartı→kar). Returns e-1 or -1. */
  private def mN(s: String, e: Int): Int =
    if (e >= 1 && s(e - 1) == 'n' && tr_optU(s, e - 1) >= 0) e - 1 else -1

  // ---- stemming ----------------------------------------------------------

  // ---- stemming ----------------------------------------------------------

  /** U-variant-only possessives: the exposed 'Um'/'UmUz'/'UnUz'
    * units — bare forms stay (jikgmnız keeps its m, höpımüzler sheds
    * ımüz, çocuzinsunuzlerle its unuz). */
  private def tr_mMuzU(s: String, e: Int): Int = {
    val p = tr_among(s, e, tr_muzF)
    if (p < 0) -1
    else {
      val q = tr_optU(s, p)
      if (q == p - 1) q else -1
    }
  }
  private def tr_mNuzU(s: String, e: Int): Int = {
    val p = tr_among(s, e, tr_nuzF)
    if (p < 0) -1
    else {
      val q = tr_optU(s, p)
      if (q == p - 1) q else -1
    }
  }
  private def tr_mMU(s: String, e: Int): Int =
    if (e >= 1 && s(e - 1) == 'm') {
      val q = tr_optU(s, e - 1)
      if (q == e - 2) q else -1
    } else -1

  private def tr_hasVowel(s: String, e: Int): Boolean = {
    var j = 0
    while (j < e) { if (tr_vowels(s(j))) return true; j += 1 }
    false
  }

  /** default lAr retry: lAr strips, then only a ki-chain may follow
    * (babsınızlarından keeps its ınız, cöğabılarunuz its ı). */
  private def tr_tryLarKi(s: String, e0: Int): Int = {
    val c = tr_mLar(s, e0)
    if (c < 0) return e0
    val k = tr_kiChain(s, c, gated = false)
    if (k >= 0) k else c
  }

  /** the ylA continuation's direct lAr arm: ki | U-unit possessives |
    * n-chain | yU (joşularla→joş, höpımüzlerle→höp,
    * çocuzinsunuzlerle→çocuzins). */
  private def tr_tryLarFull(s: String, e0: Int): Int = {
    val c = tr_mLar(s, e0)
    if (c < 0) return e0
    val k = tr_kiChain(s, c, gated = false)
    if (k >= 0) return k
    val a = tr_mMuzU(s, c)
    if (a >= 0) return a
    val a2 = tr_mNuzU(s, c)
    if (a2 >= 0) return a2
    val b = tr_mMU(s, c)
    if (b >= 0) return b
    val pN = tr_nChain(s, c, allowYdu = false)
    if (pN >= 0) return pN
    val u = tr_mYu(s, c)
    if (u >= 0) return u
    c
  }

  /** the genitive chain's lAr retry: possessives (guarded — a strip
    * leaving no vowel backtracks: junuz stays junuz), the n-chain,
    * ki, then yU with another lAr round (yakilarılarınız→yaki). */
  private def tr_tryLarPoss(s: String, e0: Int): Int = {
    val c = tr_mLar(s, e0)
    if (c < 0) return e0
    val a = tr_possAt(s, c)
    if (a >= 0 && tr_hasVowel(s, a)) return tr_tryLarPoss(s, a)
    val pN = tr_nChain(s, c, allowYdu = false)
    if (pN >= 0) return pN
    val k = tr_kiChain(s, c, gated = false)
    if (k >= 0) return k
    val u = tr_mYu(s, c)
    if (u >= 0) return tr_tryLarPoss(s, u)
    c
  }

  /** ki-chain: strip 'ki' only when a DA / nUn chain follows to the
    * left. The mark-branch (mid-deleting) flavor gates its DA on
    * tr_harmony AND the absence of e/i anywhere in the prefix (probe
    * matrix: taldakina→talna but hitodakina→hitodak — an e/i poisons
    * the chain); suffix-context chains are ungated (beredödekilerinden
    * sheds deki). Returns the new end or -1. */
  private def tr_kiChain(s: String, e0: Int, gated: Boolean): Int = {
    val pKi = tr_mKi(s, e0)
    if (pKi < 0) return -1
    // DA branch
    val pDa = tr_mDa(s, pKi)
    if (pDa >= 0) {
      val poisoned = gated && {
        var j = 0; var bad = false
        while (j < pKi && !bad) {
          if (s(j) == 'e' || s(j) == 'i') bad = true
          j += 1
        }
        bad
      }
      if (!poisoned) return tr_contKiDa(s, pDa)
    }
    // nUn branch: possessive/sU continuation only (pudlarunki keeps
    // its lar)
    val pNun = tr_mNun(s, pKi)
    if (pNun >= 0) {
      val a = tr_possAt(s, pNun)
      if (a >= 0) return a
      val su = tr_mSu(s, pNun)
      if (su >= 0) return su
      return pNun
    }
    -1
  }

  /** after a DA inside the ki-chain: poss | n(drop-U only) | lAr→ki —
    * no trailing ki retry (bofölleridakidaki keeps its second daki). */
  private def tr_contKiDa(s: String, e0: Int): Int = {
    var e = e0
    val a = tr_possAt(s, e)
    if (a >= 0) return tr_tryLarKi(s, a)
    val pN = mN(s, e)
    if (pN >= 0) {
      e = pN
      if (e >= 1 && tr_uVow(s(e - 1))) e -= 1 // drop-U only, never sU here
      return tr_tryLarKi(s, e)
    }
    val c = tr_mLar(s, e)
    if (c >= 0) {
      val k = tr_kiChain(s, c, gated = false)
      return if (k >= 0) k else c
    }
    e
  }

  /** inner sU of the nDA/nA mark branches: s-PRESENT only, with
    * tr_harmony (ablasında → abla; goşndakine routes through ki
    * instead). */
  private def tr_suSpanS(s: String, e: Int): Int = {
    val p = tr_among(s, e, tr_uF)
    if (p < 0) return -1
    if (p >= 1 && s(p - 1) == 's' && tr_harmony(s, e) &&
      p >= 2 && tr_vowels(s(p - 2))) p - 1
    else -1
  }

  /** inner sU of the nDAn/nU mark branches: the full optional-s shape,
    * the bare variant without tr_harmony (becömişlarından strips ı+ndan
    * against tr_harmony). */
  private def tr_suSpanFull(s: String, e: Int): Int = {
    val p = tr_among(s, e, tr_uF)
    if (p < 0) return -1
    if (p >= 1 && s(p - 1) == 's') {
      if (tr_harmony(s, e) && p >= 2 && tr_vowels(s(p - 2))) p - 1 else -1
    } else {
      if (p >= 2 && tr_vowels(s(p - 2))) p else -1
    }
  }

  /** possessives at end: mUz | nUz | (U)m — n is handled by tr_nChain. */
  private def tr_possAt(s: String, e: Int): Int = {
    val a = tr_mMuz(s, e); if (a >= 0) return a
    val b = tr_mNuzPoss(s, e); if (b >= 0) return b
    val c = tr_mM(s, e); if (c >= 0) return c
    -1
  }

  /** possessive n chain: strip the bare n, then the exposed U — a
    * yDU/ysA hop only at the ORIGINAL word end (kartın→kar,
    * giysen→gi, but altınla→alt), else the exposed U drops
    * (unconditionally, except the ncA continuation checks the
    * two-back vowel: altınca keeps altı, sorunca ends sor) and lAr
    * retries (evlerin: n, i, ler). */
  private def tr_nChain(s: String, e0: Int, allowYdu: Boolean,
      checkedDrop: Boolean = false): Int = {
    val pN = mN(s, e0)
    if (pN < 0) return -1
    var e = pN
    if (allowYdu) {
      val a = tr_mYdu(s, e)
      if (a >= 0) return a
      val b = tr_mYsa(s, e)
      if (b >= 0) return b
    }
    if (e >= 1 && tr_uVow(s(e - 1)) &&
      (!checkedDrop || (e >= 2 && tr_vowels(s(e - 2))))) e -= 1
    tr_tryLarKi(s, e)
  }

  /** continuation after nUn: poss | sU | lAr→(poss|n) | ki. */
  private def tr_contNun(s: String, e0: Int): Int = {
    val a = tr_possAt(s, e0)
    if (a >= 0) return tr_tryLarPoss(s, a)
    val su = tr_mSu(s, e0)
    if (su >= 0) return tr_tryLarPoss(s, su)
    val c = tr_tryLarPoss(s, e0)
    if (c != e0) return c
    val k = tr_kiChain(s, e0, gated = false)
    if (k >= 0) return k
    e0
  }

  /** continuation after DA/DAn: poss | n-chain | lAr→ki; DAn also
    * retries ki directly (dukühındakidan sheds daki, but
    * cihügcdekidekite keeps its dekis after DA). */
  private def tr_contDa(s: String, e0: Int, withKi: Boolean): Int = {
    val a = tr_possAt(s, e0)
    if (a >= 0) return tr_tryLarKi(s, a)
    val pN = tr_nChain(s, e0, allowYdu = false)
    if (pN >= 0) return pN
    val c = tr_mLar(s, e0)
    if (c >= 0) {
      val k = tr_kiChain(s, c, gated = false)
      return if (k >= 0) k else c
    }
    if (withKi) {
      val k = tr_kiChain(s, e0, gated = false)
      if (k >= 0) return k
    }
    e0
  }

  /** continuation after ncA: lArI | poss | n-chain(checked drop) |
    * sU→lAr — no trailing ki (busndakinca keeps its daki). */
  private def tr_contCa(s: String, e0: Int): Int = {
    val l = tr_mLari(s, e0)
    if (l >= 0) return l
    val a = tr_possAt(s, e0)
    if (a >= 0) return tr_tryLarKi(s, a)
    val pN = tr_nChain(s, e0, allowYdu = false, checkedDrop = true)
    if (pN >= 0) return pN
    val su = tr_mSu(s, e0)
    if (su >= 0) return tr_tryLarKi(s, su)
    tr_tryLarKi(s, e0)
  }

  /** continuation after ylA: poss | n-chain | sU→lAr | lAr-chain | ki. */
  private def tr_contYla(s: String, e0: Int): Int = {
    val a = tr_possAt(s, e0)
    if (a >= 0) return tr_tryLarKi(s, a)
    val pN = tr_nChain(s, e0, allowYdu = false)
    if (pN >= 0) return pN
    val su = tr_mSu(s, e0)
    if (su >= 0) return tr_tryLarKi(s, su)
    val t = tr_tryLarFull(s, e0)
    if (t != e0) return t
    val k = tr_kiChain(s, e0, gated = false)
    if (k >= 0) return k
    e0
  }

  private def tr_nominalVerb(s: String, e0: Int): (Int, Boolean) = {
    var e = e0
    // cAsInA -> [sUnUz|lAr|yUm|sUn|yUz] -> REQUIRED ymUs, atomic
    val pCas = tr_among(s, e, Seq("casına", "cesine"))
    if (pCas >= 0) {
      val mid = Seq(tr_mSunuz(s, pCas), tr_mLar(s, pCas), tr_mYum(s, pCas),
        tr_mSun(s, pCas), tr_mYuz(s, pCas)).find(_ >= 0).getOrElse(pCas)
      val q = tr_mYmus(s, mid)
      if (q >= 0) return (q, true)
    }
    // ymUs | yDU | ysA | yken
    val p1 = tr_mYmus(s, e)
    if (p1 >= 0) return (p1, true)
    val p2 = tr_mYdu(s, e)
    if (p2 >= 0) return (p2, true)
    val p3 = tr_mYsa(s, e)
    if (p3 >= 0) return (p3, true)
    val p4 = tr_mYken(s, e)
    if (p4 >= 0) return (p4, true)
    // lAr -> try([opt poss-n] (DUr | yDU | ysA | ymUs)), continue=false
    val pLar = tr_mLar(s, e)
    if (pLar >= 0) {
      e = pLar
      def verbAt(x: Int): Int =
        Seq(tr_mDur(s, x), tr_mYdu(s, x), tr_mYsa(s, x), tr_mYmus(s, x)).find(_ >= 0)
          .getOrElse(-1)
      val direct = verbAt(e)
      if (direct >= 0) e = direct
      else {
        val pN = mN(s, e)
        if (pN >= 0) {
          val afterN = verbAt(pN)
          if (afterN >= 0) e = afterN
        }
      }
      return (e, false)
    }
    // nUz REQUIRES a following yDU | ysA, possibly via an atomic
    // possessive-n hop (altinniz)
    val pNuz = tr_mNuz(s, e)
    if (pNuz >= 0) {
      e = pNuz
      val direct = Seq(tr_mYdu(s, e), tr_mYsa(s, e)).find(_ >= 0)
      direct match {
        case Some(x) => return (x, true)
        case None =>
          val pN = mN(s, e)
          if (pN >= 0) {
            val after = Seq(tr_mYdu(s, pN), tr_mYsa(s, pN)).find(_ >= 0)
            if (after.isDefined) return (after.get, true)
          }
          e = e0
      }
    }
    // bare possessive m|n (or the 1pl k) + REQUIRED (yDU | ysA),
    // atomic (kartın→kar, giysen→gi, tapsak→tap, mbkğeodum→mbkğeo;
    // babam keeps its m — no verb after)
    if (e0 >= 1 && (s(e0 - 1) == 'm' || s(e0 - 1) == 'n' || s(e0 - 1) == 'k')) {
      val hop = Seq(tr_mYdu(s, e0 - 1), tr_mYsa(s, e0 - 1)).find(_ >= 0)
      if (hop.isDefined) return (hop.get, true)
    }
    // (sUnUz | yUz | sUn | yUm) -> try ymUs
    val pPers = Seq(tr_mSunuz(s, e), tr_mYuz(s, e), tr_mSun(s, e), tr_mYum(s, e)).find(_ >= 0)
    if (pPers.isDefined) {
      e = pPers.get
      val q = tr_mYmus(s, e)
      if (q >= 0) e = q
      return (e, true)
    }
    // DUr -> try((sUnUz | lAr | yUm | sUn | yUz | eps) ymUs)
    val pDur = tr_mDur(s, e)
    if (pDur >= 0) {
      e = pDur
      val mid = Seq(tr_mSunuz(s, e), tr_mLar(s, e), tr_mYum(s, e), tr_mSun(s, e), tr_mYuz(s, e))
        .find(_ >= 0)
      val base = mid.getOrElse(e)
      val q = tr_mYmus(s, base)
      if (q >= 0) e = q
      return (e, true)
    }
    (e, true)
  }

  /** noun phase. Returns the RESULT STRING: the nDA/nA mark-only
    * branch deletes ki-chain material from the MIDDLE, keeping the
    * marked case suffix in place (baysininkinda -> baysinda). */
  private def tr_nounPhase(s: String, atWordEnd: Boolean): String = {
    val e = s.length
    // lArI
    val pLari = tr_mLari(s, e)
    if (pLari >= 0) return s.substring(0, pLari)
    // ncA
    val pNca = tr_mNca(s, e)
    if (pNca >= 0) return s.substring(0, tr_contCa(s, pNca))
    // [nDA | nA marked]: lArI / s-present sU extend the slice leftward
    // and the whole span deletes (evlerinde → ev, ailecasına →
    // aileca); the ki-chain instead deletes from the MIDDLE, keeping
    // the marked suffix in place (baysininkinda → baysinda)
    val pMark = {
      val a = tr_mNda(s, e); if (a >= 0) a else tr_mNa(s, e)
    }
    if (pMark >= 0) {
      val pLariIn = tr_mLari(s, pMark)
      if (pLariIn >= 0) return s.substring(0, pLariIn)
      val pSuIn = tr_suSpanS(s, pMark)
      if (pSuIn >= 0) {
        val t = tr_mLar(s, pSuIn)
        if (t >= 0) {
          val k = tr_kiChain(s, t, gated = false)
          return s.substring(0, if (k >= 0) k else t)
        }
        return s.substring(0, pSuIn)
      }
      val k = tr_kiChain(s, pMark, gated = true)
      if (k >= 0) return s.substring(0, k) + s.substring(pMark, e)
    }
    // [nDAn | nU marked]: full sU span only — no lArI (becömişlarından
    // keeps its lar), no ki-mid (okuldakinden strips plainly)
    val pMark2 = {
      val a = tr_mNdan(s, e); if (a >= 0) a else tr_mNu(s, e)
    }
    if (pMark2 >= 0) {
      val pSuIn = tr_suSpanFull(s, pMark2)
      if (pSuIn >= 0) {
        val t = tr_mLar(s, pSuIn)
        if (t >= 0) {
          val k = tr_kiChain(s, t, gated = false)
          return s.substring(0, if (k >= 0) k else t)
        }
        return s.substring(0, pSuIn)
      }
    }
    // DAn | DA
    val pDanK = tr_mDan(s, e)
    if (pDanK >= 0) return s.substring(0, tr_contDa(s, pDanK, withKi = true))
    val pDa0 = tr_mDa(s, e)
    if (pDa0 >= 0) return s.substring(0, tr_contDa(s, pDa0, withKi = false))
    // ylA
    val pYla = tr_mYla(s, e)
    if (pYla >= 0) return s.substring(0, tr_contYla(s, pYla))
    // nUn
    val pNun = tr_mNun(s, e)
    if (pNun >= 0) return s.substring(0, tr_contNun(s, pNun))
    // ki-chain directly
    val k0 = tr_kiChain(s, e, gated = false)
    if (k0 >= 0) return s.substring(0, k0)
    // lAr -> ki
    val pLar = tr_mLar(s, e)
    if (pLar >= 0) {
      val k = tr_kiChain(s, pLar, gated = false)
      if (k >= 0) return s.substring(0, k)
      return s.substring(0, pLar)
    }
    // possessives: nUz continues into a genitive or the singular m;
    // mUz/m stop; all retry lAr
    val pNuzP = tr_mNuzPoss(s, e)
    if (pNuzP >= 0) {
      // the genitive retry needs a vowel directly before (ülkeaün
      // sheds ün; pipısın and külesin keep theirs)
      val g = tr_mNun(s, pNuzP)
      if (g >= 0 && pNuzP - g == 2 && g >= 1 && tr_vowels(s(g - 1)))
        return s.substring(0, tr_contNun(s, g))
      // a second mUz round only when lAr follows it (junuzlarımızınız
      // sheds larımız whole; böcövumuzınız keeps its umuz)
      val muz2 = tr_mMuz(s, pNuzP)
      if (muz2 >= 0) {
        val l2 = tr_mLar(s, muz2)
        if (l2 >= 0) {
          val k = tr_kiChain(s, l2, gated = false)
          return s.substring(0, if (k >= 0) k else l2)
        }
      }
      return s.substring(0, tr_tryLarKi(s, pNuzP))
    }
    val pPoss = tr_possAt(s, e)
    if (pPoss >= 0) {
      // a word-final singular m may expose one UnUz unit
      // (tujibucımunuzım sheds ım then unuz and stops; after a
      // phase-1 strip the m stops the chain)
      if (atWordEnd && e >= 1 && s(e - 1) == 'm') {
        val n2 = tr_mNuzU(s, pPoss)
        // only when the unit exposes another possessive m
        // (tujibucımunuzım → tujibucım; möykensunuzım keeps sunuz)
        if (n2 >= 1 && s(n2 - 1) == 'm') return s.substring(0, n2)
      }
      return s.substring(0, tr_tryLarKi(s, pPoss))
    }
    // possessive-n chain (yDU hop only at the original word end)
    val pN = tr_nChain(s, e, allowYdu = atWordEnd)
    if (pN >= 0) return s.substring(0, pN)
    // yU -> (lAr | poss/n | nUn)
    val pYu = tr_mYu(s, e)
    if (pYu >= 0) {
      val a = tr_mLar(s, pYu)
      if (a >= 0) {
        val k = tr_kiChain(s, a, gated = false)
        return s.substring(0, if (k >= 0) k else a)
      }
      val b = tr_possAt(s, pYu)
      if (b >= 0) return s.substring(0, tr_tryLarKi(s, b))
      val c = tr_nChain(s, pYu, allowYdu = false)
      if (c >= 0) return s.substring(0, c)
      val g = tr_mNun(s, pYu)
      if (g >= 0) return s.substring(0, tr_contNun(s, g))
      return s.substring(0, pYu)
    }
    // yA -> (lAr->ki | poss/n | nUn)
    val pYa = { val p = tr_among(s, e, Seq("a", "e"))
      if (p < 0 || !tr_harmony(s, e)) -1 else tr_optY(s, p) }
    if (pYa >= 0) {
      val a = tr_mLar(s, pYa)
      if (a >= 0) {
        val k = tr_kiChain(s, a, gated = false)
        return s.substring(0, if (k >= 0) k else a)
      }
      val b = tr_possAt(s, pYa)
      if (b >= 0) return s.substring(0, tr_tryLarKi(s, b))
      val c = tr_nChain(s, pYa, allowYdu = false)
      if (c >= 0) return s.substring(0, c)
      val g = tr_mNun(s, pYa)
      if (g >= 0) return s.substring(0, tr_contNun(s, g))
      return s.substring(0, pYa)
    }
    s
  }

  private def tr_postProcess(s: String): String = {
    if (s.isEmpty) return s
    val last = s.last match {
      case 'b' => 'p'
      case 'c' => 'ç'
      case 'd' => 't'
      case 'ğ' => 'k'
      case other => other
    }
    s.substring(0, s.length - 1) + last
  }

  private val tr_reserved = Set("ad", "soyad")

  private def tr_appendU(s: String): String = {
    if (s.isEmpty) return s
    val c = s.last
    if (c != 'd' && c != 'g') return s
    var v = s.length - 1
    while (v >= 0 && !tr_vowels(s(v))) v -= 1
    if (v < 0) return s
    val u = s(v) match {
      case 'a' | 'ı' => 'ı'
      case 'e' | 'i' => 'i'
      case 'o' | 'u' => 'u'
      case 'ö' | 'ü' => 'ü'
      case _ => return s
    }
    s + u
  }

  def turkishStem(word: String): String = {
    val s = word
    if (s.count(tr_vowels) <= 1) return s
    val (e1, cont) = tr_nominalVerb(s, s.length)
    var out = s.substring(0, e1)
    if (cont) {
      out = tr_nounPhase(out, atWordEnd = e1 == s.length)
      // tr_reserved stems skip the whole postlude (addan → ad, never at)
      if (!tr_reserved(out)) {
        // append-U FIRST: a d-final turkishStem that takes the vowel escapes
        // the devoicing (dadla → dadı, but dumla → t)
        out = tr_appendU(out)
        out = tr_postProcess(out)
      }
    }
    out
  }

  def byConfig(name: String): Option[(Set[String], String => String)] =
    name match {
      case "german" => Some((germanStop, germanStem))
      case "spanish" => Some((spanishStop, spanishStem))
      case "french" => Some((frenchStop, frenchStem))
      case "russian" => Some((russianStop, russianStem))
      case "dutch" => Some((dutchStop, dutchStem))
      case "italian" => Some((italianStop, italianStem))
      case "portuguese" => Some((portugueseStop, portugueseStem))
      case "swedish" => Some((swedishStop, swedishStem))
      case "norwegian" => Some((norwegianStop, norwegianStem))
      case "danish" => Some((danishStop, danishStem))
      case "finnish" => Some((finnishStop, finnishStem))
      case "romanian" => Some((Set.empty[String], romanianStem))
      case "hungarian" => Some((hungarianStop, hungarianStem))
      case "indonesian" => Some((Set.empty[String], indonesianStem))
      case "turkish" => Some((turkishStop, turkishStem))
      case _ => None
    }
}
