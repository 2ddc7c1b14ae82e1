package graft.operators

/** Hand-rolled scanners for [[Curation.pipelinePiiScrub]]'s three PII
  * patterns — the round-17 replacement for six java.util.regex passes
  * per document (3 `regexp_count` on the seeded text + 3 chained
  * `regexp_replace`). Each scanner reproduces java.util.regex's
  * leftmost-first, greedy-with-backtracking semantics for its pattern
  * EXACTLY (the DuckDB oracle still runs the regexes, so every sweep
  * re-attests the equivalence; PropertySpec pins it against
  * java.util.regex directly on generated inputs):
  *
  *  - email `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}` — every
  *    match anchors an '@' (neither side's class contains one), the
  *    leftmost viable start is the maximal local-class run ending at the
  *    '@' (clamped at the previous match's end, where find() resumes),
  *    and domain-greedy backtracking reduces to: take the RIGHTMOST '.'
  *    inside the maximal domain-class run that has ≥1 domain char before
  *    it and ≥2 letters after it; the match ends after the maximal
  *    letter run following that dot.
  *  - ip `\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b` — octet lengths are
  *    forced (digits can't be dots, so `\d{1,3}\.` matches iff the next
  *    '.' sits 1-3 chars ahead through digits); the final octet is a
  *    1-3 digit run whose following char is a non-word (\w = [A-Za-z0-9_])
  *    or end — a longer digit run fails outright, backtracking can't
  *    create a boundary between two digits.
  *  - phone `\b\d{3}-\d{4}\b` — fixed lengths, boundaries as above.
  *
  * Counts are taken on the SEEDED text for all three patterns while
  * replacements chain (emails replaced first, then IPs on that result,
  * then phones) — exactly the shipped Column semantics. */
private[graft] object PiiScan {

  @inline private def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isLocal(c: Char): Boolean =
    isLetter(c) || isDigit(c) || c == '.' || c == '_' || c == '%' || c == '+' || c == '-'
  @inline private def isDomain(c: Char): Boolean =
    isLetter(c) || isDigit(c) || c == '.' || c == '-'

  /** Non-overlapping (start, end) matches, leftmost-first — the find()
    * sequence of the email pattern. */
  private[graft] def emailMatches(s: String): List[(Int, Int)] = {
    val n = s.length
    var out = List.newBuilder[(Int, Int)]
    var p = 0 // scan resumption point (end of previous match)
    var q = s.indexOf('@')
    while (q >= 0) {
      if (q >= p + 1) {
        // maximal local-class run ending at q, clamped at p
        var ls = q
        while (ls > p && isLocal(s.charAt(ls - 1))) ls -= 1
        if (ls < q) {
          // maximal domain-class run after '@'
          var de = q + 1
          while (de < n && isDomain(s.charAt(de))) de += 1
          if (de > q + 1) {
            // rightmost '.' with >=1 domain char before it and >=2 letters after
            var dp = -1
            var i = de - 1
            while (i >= q + 2 && dp < 0) {
              if (s.charAt(i) == '.' && i + 2 < n &&
                  isLetter(s.charAt(i + 1)) && isLetter(s.charAt(i + 2))) dp = i
              i -= 1
            }
            if (dp >= 0) {
              var e = dp + 3
              while (e < n && isLetter(s.charAt(e))) e += 1
              out += ((ls, e))
              p = e
              q = s.indexOf('@', e)
            } else q = s.indexOf('@', q + 1)
          } else q = s.indexOf('@', q + 1)
        } else q = s.indexOf('@', q + 1)
      } else q = s.indexOf('@', q + 1)
    }
    out.result()
  }

  /** Octet helper: if a 1-3 digit run starting at `x` is immediately
    * followed by '.', returns the index AFTER that dot, else -1. */
  @inline private def octetDot(s: String, x: Int): Int = {
    val n = s.length
    var i = x
    val lim = math.min(n, x + 3)
    while (i < lim && isDigit(s.charAt(i))) i += 1
    if (i > x && i < n && s.charAt(i) == '.') i + 1 else -1
  }

  /** Non-overlapping (start, end) matches of the IPv4 pattern. */
  private[graft] def ipMatches(s: String): List[(Int, Int)] = {
    val n = s.length
    var out = List.newBuilder[(Int, Int)]
    var x = 0
    while (x < n) {
      if (isDigit(s.charAt(x)) && (x == 0 || !isWord(s.charAt(x - 1)))) {
        val a = octetDot(s, x)
        val b = if (a > 0) octetDot(s, a) else -1
        val c = if (b > 0) octetDot(s, b) else -1
        if (c > 0) {
          // final octet: 1-3 digits then word boundary
          var i = c
          val lim = math.min(n, c + 3)
          while (i < lim && isDigit(s.charAt(i))) i += 1
          if (i > c && (i == n || !isWord(s.charAt(i)))) {
            out += ((x, i))
            x = i
          } else x += 1
        } else x += 1
      } else x += 1
    }
    out.result()
  }

  /** Non-overlapping (start, end) matches of the phone pattern. */
  private[graft] def phoneMatches(s: String): List[(Int, Int)] = {
    val n = s.length
    var out = List.newBuilder[(Int, Int)]
    var x = 0
    while (x + 8 <= n) {
      if (isDigit(s.charAt(x)) && (x == 0 || !isWord(s.charAt(x - 1))) &&
          isDigit(s.charAt(x + 1)) && isDigit(s.charAt(x + 2)) &&
          s.charAt(x + 3) == '-' &&
          isDigit(s.charAt(x + 4)) && isDigit(s.charAt(x + 5)) &&
          isDigit(s.charAt(x + 6)) && isDigit(s.charAt(x + 7)) &&
          (x + 8 == n || !isWord(s.charAt(x + 8)))) {
        out += ((x, x + 8))
        x += 8
      } else x += 1
    }
    out.result()
  }

  /** Splice `repl` over each (start, end) span of `s` (spans ascending,
    * non-overlapping — the find() output shape). */
  private[graft] def replaceSpans(s: String, spans: List[(Int, Int)], repl: String): String = {
    if (spans.isEmpty) return s
    val sb = new java.lang.StringBuilder(s.length)
    var p = 0
    spans.foreach { case (a, b) =>
      sb.append(s, p, a).append(repl)
      p = b
    }
    sb.append(s, p, s.length)
    sb.toString
  }

  /** The full scrub: counts on the seeded text, chained replaces.
    * Returns (nEmails, nIps, nPhones, cleaned). */
  private[graft] def scrub(seeded: String): (Int, Int, Int, String) = {
    val emails = emailMatches(seeded)
    val e1 = replaceSpans(seeded, emails, "[EMAIL]")
    val nIps = ipMatches(seeded).size
    val e2 = replaceSpans(e1, ipMatches(e1), "[IP]")
    val nPhones = phoneMatches(seeded).size
    val e3 = replaceSpans(e2, phoneMatches(e2), "[PHONE]")
    (emails.size, nIps, nPhones, e3)
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Lowercase hex MD5 of the UTF-8 bytes — `functions.md5` semantics. */
  private[graft] def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < d.length) {
      out(i * 2) = HexDigits((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = HexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
