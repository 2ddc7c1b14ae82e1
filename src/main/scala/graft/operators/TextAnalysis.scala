package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Text-analysis operators for training-data pipelines over `documents`.
  *
  * Everything is built from codegen'd collection/string expressions
  * (`split`, higher-order `transform`/`filter`/`aggregate`, `regexp_*`) —
  * no UDFs, so the hot path stays inside whole-stage codegen and the
  * operators are a narrow map over the corpus: zero shuffles, trivially
  * linear at 100 TB.
  */
object TextAnalysis {

  /** Unsigned lexicographic order over UTF-8 byte arrays — the binary
    * string collation both Spark and DuckDB sort by. Used wherever a
    * JVM-side token sort must agree with an engine-side `sort`/`list_sort`
    * (JVM String ordering is UTF-16 code units, which disagrees for
    * supplementary characters). */
  val utf8ByteOrder: java.util.Comparator[Array[Byte]] =
    new java.util.Comparator[Array[Byte]] {
      override def compare(a: Array[Byte], b: Array[Byte]): Int = {
        val n = math.min(a.length, b.length)
        var i = 0
        while (i < n) {
          val c = (a(i) & 0xff) - (b(i) & 0xff)
          if (c != 0) return c
          i += 1
        }
        a.length - b.length
      }
    }

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** Whitespace tokens of the lower-cased text. */
  def tokens(text: Column): Column = split(lower(text), " ")

  private val stopwords = Seq("the", "a", "of", "and", "is", "to", "in")

  private def stopArray: Column = array(stopwords.map(lit): _*)

  /** Fused single-pass counter scan over the (already lowercased) text —
    * the kernel behind [[textTokens]]. Returns
    * (nTokens, nDistinct, nWords, nBpeChunks) with zero per-token
    * allocation:
    *  - nTokens   — `split(" ", -1)` semantics: count(' ') + 1, empties
    *    included.
    *  - nDistinct — distinct split tokens via an open-addressing table of
    *    packed (start << 32 | end) ranges into the text (no token Strings
    *    materialized; equality is a char compare, hash is String.hashCode
    *    over the range so equal tokens always collide into one slot).
    *  - nWords    — matches of `[a-z0-9]+` = transitions into word-char
    *    runs.
    *  - nBpeChunks — matches of the GPT-2-ish pre-tokenizer alternation
    *    `" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"` reduced to its leftmost-first
    *    state machine: a chunk is an optional single space plus a maximal
    *    run of ONE class (letter / digit / other-non-space); a space NOT
    *    followed by a run char matches no alternative and is skipped —
    *    exactly java.util.regex's behavior on this pattern (runs of one
    *    class can't backtrack into each other, so greedy = maximal run).
    *
    * Replaced the two java.util.regex scans + split + HashSet kernel in
    * round 17: the regex engine's per-char alternation bookkeeping was
    * 20x this loop at sf10 (44-60 s vs 1.5-2.8 s, identical counters on
    * the full corpus — PLANS.md r17). Surrogate pairs are counted per
    * UTF-16 unit, which agrees with the regex on every counter because
    * adjacent non-class units merge into the same run either way. */
  private[graft] def scanCounts(text: String): (Int, Int, Int, Int) = {
    val n = text.length
    var nTokens = 1
    var nWords = 0
    var nBpe = 0
    var cap = 64
    var table = new Array[Long](cap)
    java.util.Arrays.fill(table, -1L)
    var used = 0
    def tokenEquals(s1: Int, e1: Int, s2: Int, e2: Int): Boolean = {
      if (e1 - s1 != e2 - s2) return false
      var i = s1; var j = s2
      while (i < e1) {
        if (text.charAt(i) != text.charAt(j)) return false
        i += 1; j += 1
      }
      true
    }
    def grow(): Unit = {
      val old = table
      cap <<= 1
      table = new Array[Long](cap)
      java.util.Arrays.fill(table, -1L)
      var i = 0
      while (i < old.length) {
        val p = old(i)
        if (p != -1L) {
          val s = (p >>> 32).toInt; val e = (p & 0xffffffffL).toInt
          var h = 1; var k = s
          while (k < e) { h = h * 31 + text.charAt(k); k += 1 }
          var slot = h & (cap - 1)
          while (table(slot) != -1L) slot = (slot + 1) & (cap - 1)
          table(slot) = p
        }
        i += 1
      }
    }
    def addToken(s: Int, e: Int): Unit = {
      if ((used + 1) * 2 > cap) grow()
      var h = 1; var k = s
      while (k < e) { h = h * 31 + text.charAt(k); k += 1 }
      var slot = h & (cap - 1)
      var p = table(slot)
      while (p != -1L) {
        val s2 = (p >>> 32).toInt; val e2 = (p & 0xffffffffL).toInt
        if (tokenEquals(s, e, s2, e2)) return
        slot = (slot + 1) & (cap - 1)
        p = table(slot)
      }
      table(slot) = (s.toLong << 32) | (e.toLong & 0xffffffffL)
      used += 1
    }
    var tokStart = 0
    var inWord = false
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == ' ') {
        nTokens += 1
        addToken(tokStart, i)
        tokStart = i + 1
        inWord = false
      } else {
        val w = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        if (w && !inWord) nWords += 1
        inWord = w
      }
      i += 1
    }
    addToken(tokStart, n)
    // class: 0 = [a-z], 1 = [0-9], 2 = other non-space, 3 = space
    def cls(c: Char): Int =
      if (c >= 'a' && c <= 'z') 0
      else if (c >= '0' && c <= '9') 1
      else if (c == ' ') 3
      else 2
    i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == ' ') {
        if (i + 1 < n && text.charAt(i + 1) != ' ') {
          val k = cls(text.charAt(i + 1))
          var j = i + 2
          while (j < n && cls(text.charAt(j)) == k) j += 1
          nBpe += 1
          i = j
        } else i += 1
      } else {
        val k = cls(c)
        var j = i + 1
        while (j < n && cls(text.charAt(j)) == k) j += 1
        nBpe += 1
        i = j
      }
    }
    (nTokens, used, nWords, nBpe)
  }

  /** Token counting: whitespace tokens, regex word tokens, distinct tokens. */
  val textTokens: QueryDef = QueryDef(
    "text_tokens",
    (s, d) => {
      // ONE typed pass per document computing all four counters in a
      // fused char scan ([[scanCounts]]) — the round-17 replacement for
      // the regex kernel this lane shipped with (two java.util.regex
      // scans + split + HashSet), which was the #1 covered sf10 lane at
      // 29 s; the fused scan is ~20x (PLANS.md r17) with counters proven
      // identical on the full corpus and property-checked against the
      // regex definition in PropertySpec. The DuckDB oracle still runs
      // the regexes, so the scanner's equivalence is re-attested by
      // every sweep. n_bpe_chunks counts BPE-ish pre-tokenizer chunks
      // (GPT-2-style: space-prefixed letter runs, digit runs,
      // punctuation runs) — the unit LLM token counts are estimated
      // from.
      import s.implicits._
      docs(s, d)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (id, raw) =>
            val text = raw.toLowerCase(java.util.Locale.ROOT)
            val (t, dc, w, b) = scanCounts(text)
            (id, t, dc, w, b)
          }
        }
        .toDF("doc_id", "n_tokens", "n_distinct", "n_words", "n_bpe_chunks")
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             len(string_split(lower(text), ' ')) AS n_tokens,
             len(list_distinct(string_split(lower(text), ' '))) AS n_distinct,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_words,
             len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')) AS n_bpe_chunks
      FROM documents
      ORDER BY doc_id
    """.stripMargin.trim)
  )

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean token
    * length, and a logistic quality score over those signals.
    *
    * The integer counters come from ONE typed map per document (a single
    * pass over the text): the HOF formulation —
    * `filter(toks, array_contains)` + `aggregate(transform(toks, length))`
    * — evaluates interpreted per element (the measured §3 pitfall) and was
    * the whole cost of this operator. The ratios/rounding/logistic stay as
    * Column expressions over those counters, bit-identical to the oracle. */
  val textQuality: QueryDef = QueryDef(
    "text_quality",
    (s, d) => {
      import s.implicits._
      val stopSet = stopwords.toSet
      val stats = docs(s, d)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val low = text.toLowerCase(java.util.Locale.ROOT)
          val toks = low.split(" ", -1)
          var nStop = 0
          var sumLen = 0L
          toks.foreach { t => if (stopSet(t)) nStop += 1; sumLen += t.length }
          var nPunct = 0
          low.foreach { c =>
            if (!(c >= 'a' && c <= 'z') && !(c >= '0' && c <= '9') && c != ' ') nPunct += 1
          }
          (id, text.length, toks.length, nStop, nPunct, sumLen)
        }
        .toDF("doc_id", "n_chars", "n_tok", "n_stop", "n_punct", "sum_len")
      stats
        .select(
          col("doc_id"),
          col("n_chars"),
          col("n_tok").as("n_tokens"),
          round(col("n_stop").cast("double") / col("n_tok"), 4).as("stopword_ratio"),
          round(col("n_punct").cast("double") / col("n_chars"), 4).as("punct_ratio"),
          round(col("sum_len").cast("double") / col("n_tok"), 4).as("avg_token_len"),
          round(
            lit(1.0) / (lit(1.0) +
              exp(-(lit(0.002) * col("n_chars") + lit(2.0) * col("n_stop").cast("double") / col("n_tok")
                - lit(5.0) * col("n_punct").cast("double") / col("n_chars") - lit(1.0)))),
            4
          ).as("quality_score")
        )
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             length(text) AS n_chars,
             len(toks) AS n_tokens,
             round(n_stop::DOUBLE / len(toks), 4) AS stopword_ratio,
             round(n_punct::DOUBLE / length(text), 4) AS punct_ratio,
             round(list_sum(list_transform(toks, t -> length(t)))::DOUBLE / len(toks), 4) AS avg_token_len,
             round(1.0 / (1.0 + exp(-(0.002 * length(text) + 2.0 * n_stop::DOUBLE / len(toks)
                   - 5.0 * n_punct::DOUBLE / length(text) - 1.0))), 4) AS quality_score
      FROM (
        SELECT doc_id, text,
               string_split(lower(text), ' ') AS toks,
               len(list_filter(string_split(lower(text), ' '),
                   t -> t IN ('the', 'a', 'of', 'and', 'is', 'to', 'in'))) AS n_stop,
               len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS n_punct
        FROM documents)
      ORDER BY doc_id
    """.stripMargin.trim)
  )

  /** Stopword-profile language ID: score the token stream against small
    * per-language profiles; argmax with a fixed priority tie-break.
    * All four profile scores come from ONE typed map per document (single
    * tokenize pass) — four interpreted `filter` HOFs per row was the
    * measured cost of this operator. */
  val textLangid: QueryDef = QueryDef(
    "text_langid",
    (s, d) => {
      import s.implicits._
      val profiles: Array[Set[String]] = Array(
        Set("the", "a", "of", "and", "is"),
        Set("le", "la", "de", "et", "un"),
        Set("el", "los", "de", "y", "un"),
        Set("der", "die", "das", "und", "ein"))
      docs(s, d)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val toks = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
          val sc = new Array[Int](profiles.length)
          toks.foreach { t =>
            var i = 0
            while (i < profiles.length) { if (profiles(i)(t)) sc(i) += 1; i += 1 }
          }
          (id, sc(0), sc(1), sc(2), sc(3))
        }
        .toDF("doc_id", "s_en", "s_fr", "s_es", "s_de")
        .withColumn(
          "pred_lang",
          when(col("s_en") >= greatest(col("s_fr"), col("s_es"), col("s_de")), "en")
            .when(col("s_fr") >= greatest(col("s_es"), col("s_de")), "fr")
            .when(col("s_es") >= col("s_de"), "es")
            .otherwise("de")
        )
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, s_en, s_fr, s_es, s_de,
             CASE WHEN s_en >= greatest(s_fr, s_es, s_de) THEN 'en'
                  WHEN s_fr >= greatest(s_es, s_de) THEN 'fr'
                  WHEN s_es >= s_de THEN 'es'
                  ELSE 'de' END AS pred_lang
      FROM (
        SELECT doc_id,
               len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'is'))) AS s_en,
               len(list_filter(toks, t -> t IN ('le', 'la', 'de', 'et', 'un'))) AS s_fr,
               len(list_filter(toks, t -> t IN ('el', 'los', 'de', 'y', 'un'))) AS s_es,
               len(list_filter(toks, t -> t IN ('der', 'die', 'das', 'und', 'ein'))) AS s_de
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents))
      ORDER BY doc_id
    """.stripMargin.trim)
  )

  /** Canonical document fingerprint: md5 of the sorted distinct token set —
    * an order-insensitive content identity for shuffle-free grouping. */
  val textFingerprint: QueryDef = QueryDef(
    "text_fingerprint",
    (s, d) => {
      // Typed map, not md5(array_join(array_sort(array_distinct(...)))):
      // array_sort is a higher-order expression evaluated interpreted and
      // the chain allocates three intermediate arrays per row — measured
      // ~2.3 s of the 2.8 s bench time at sf0.1. One tight loop per doc
      // does tokenize→distinct→sort→join→md5 with zero Catalyst
      // allocations. Tokens sort by UNSIGNED UTF-8 BYTE order — the same
      // binary collation DuckDB's list_sort and Spark's string sort use —
      // not JVM String.sorted (UTF-16 code units), which would diverge for
      // supplementary characters vs U+E000–U+FFFF; the fingerprint is thus
      // corpus-independent rather than ASCII-only.
      import s.implicits._
      docs(s, d)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val toks: Array[Array[Byte]] = text.toLowerCase(java.util.Locale.ROOT)
            .split(" ", -1).distinct
            .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          java.util.Arrays.sort(toks, TextAnalysis.utf8ByteOrder)
          val md = java.security.MessageDigest.getInstance("MD5")
          var i = 0
          while (i < toks.length) {
            if (i > 0) md.update(' '.toByte)
            md.update(toks(i))
            i += 1
          }
          val sb = new StringBuilder(32)
          md.digest().foreach(b => sb.append("%02x".format(b & 0xff)))
          (id, sb.toString)
        }
        .toDF("doc_id", "fingerprint")
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fingerprint
      FROM documents
      ORDER BY doc_id
    """.stripMargin.trim)
  )

  /** Order-sensitive rolling-hash fingerprint: Horner fold of per-token
    * md5-derived hashes, `h = (h*31 + H(tok)) mod (2^31-1)` left-to-right —
    * unlike [[textFingerprint]] this distinguishes permutations of the same
    * token set. Identical fold in both engines (Spark `aggregate` / DuckDB
    * `list_reduce`). */
  val textRollingHash: QueryDef = QueryDef(
    "text_rolling_hash",
    (s, d) => {
      // Typed map, not transform+aggregate: higher-order functions evaluate
      // INTERPRETED (per-element md5 through the expression interpreter was
      // ~3 s at sf0.1 — the same pitfall text_fingerprint hit). One JVM
      // loop per doc: md5 the token bytes, take the first 15 hex nibbles
      // (= 60 bits: 7 full bytes << 4 | high nibble of byte 7 — exactly
      // `conv(substr(md5(t),1,15),16,10)`), Horner-fold mod 2^31-1.
      // acc < 2^31 and h < 2^60, so acc*31 + h stays well inside a Long.
      import s.implicits._
      docs(s, d)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          var acc = 0L
          text.toLowerCase(java.util.Locale.ROOT).split(" ", -1).foreach { t =>
            val dig = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            var h = 0L
            var i = 0
            while (i < 7) { h = (h << 8) | (dig(i) & 0xffL); i += 1 }
            h = (h << 4) | ((dig(7) & 0xf0L) >> 4)
            acc = (acc * 31 + h) % 2147483647L
          }
          (id, acc)
        }
        .toDF("doc_id", "rolling_hash")
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             list_reduce(
               [0]::BIGINT[] || list_transform(string_split(lower(text), ' '),
                 x -> ('0x' || substr(md5(x), 1, 15))::BIGINT),
               (acc, x) -> (acc * 31 + x) % 2147483647) AS rolling_hash
      FROM documents
      ORDER BY doc_id
    """.stripMargin.trim)
  )

  /** Corpus-level word-bigram frequencies: the vocabulary-building /
    * n-gram-LM shape. Top-20 bigrams with deterministic tie-break. One
    * explode-free flatMap + one partial-aggregated shuffle. */
  val textBigramFreq: QueryDef = QueryDef(
    "text_bigram_freq",
    (s, d) => {
      import s.implicits._
      val bigrams = docs(s, d)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (_, text) =>
          val t = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
          (0 until math.max(0, t.length - 1)).iterator.map(i => t(i) + " " + t(i + 1))
        }
        .toDF("bigram")
      bigrams
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(20)
    },
    Some("""
      SELECT bigram, count(*) AS n
      FROM (
        SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i+1])) AS bigram
        FROM (SELECT string_split(lower(text), ' ') AS t FROM documents))
      GROUP BY bigram
      ORDER BY n DESC, bigram
      LIMIT 20
    """.stripMargin.trim)
  )

  /** Conditional bigram probabilities — the n-gram LM ESTIMATION step on
    * top of [[textBigramFreq]]'s raw counts: P(w2|w1) in exact permille,
    * where the prefix total n1 = Σ_w2 n12 comes from a window over the
    * ALREADY-AGGREGATED bigram table (no second corpus pass — the count
    * table is vocab²-bounded, orders smaller than the corpus). Top-20 by
    * count with a full deterministic tie-break. */
  val textBigramLm: QueryDef = QueryDef(
    "text_bigram_lm",
    (s, d) => {
      import s.implicits._
      val pairs = docs(s, d)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (_, text) =>
          val t = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
          (0 until math.max(0, t.length - 1)).iterator.map(i => (t(i), t(i + 1)))
        }
        .toDF("w1", "w2")
      val w = Window.partitionBy(col("w1"))
      pairs
        .groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("n12"))
        .withColumn("n1", sum(col("n12")).over(w))
        .withColumn("cond_pm", expr("(10000 * n12) div n1"))
        .orderBy(col("n12").desc, col("w1"), col("w2"))
        .limit(20)
    },
    Some("""
      WITH b AS (
        SELECT unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i])) AS w1,
               unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i+1])) AS w2
        FROM (SELECT string_split(lower(text), ' ') AS t FROM documents)
      ), c AS (
        SELECT w1, w2, count(*) AS n12 FROM b GROUP BY w1, w2
      )
      SELECT w1, w2, n12, sum(n12) OVER (PARTITION BY w1)::BIGINT AS n1,
             ((10000 * n12) // (sum(n12) OVER (PARTITION BY w1)))::BIGINT AS cond_pm
      FROM c
      ORDER BY n12 DESC, w1, w2
      LIMIT 20
    """.stripMargin.trim)
  )

  /** Per-document LM quality score — the CCNet-style filter signal: how
    * typical each doc's word transitions are under the corpus-trained
    * bigram LM ([[textBigramLm]]'s estimation, un-truncated to the full
    * table). Per doc: the mean and minimum conditional permille of its
    * bigram occurrences — low mean ⇒ atypical text (the mass real
    * pipelines route to the LM-perplexity cut), min ⇒ the single most
    * surprising transition. All-integer arithmetic (truncating div both
    * engines), so scores are engine-exact.
    *
    * Scale shape: the bigram stream is a typed flatMap computed twice —
    * once aggregated into the vocab²-bounded LM table, once joined against
    * it (deliberate: caching the full token stream is what does NOT scale
    * at 100 TB, same trade as sketch_topk_tokens); the join is keyed on
    * (w1, w2) — broadcastable while the LM fits, a plain shuffled
    * equi-join beyond. Docs with <2 tokens have no bigrams and drop out on
    * both engines. */
  val textLmScore: QueryDef = QueryDef(
    "text_lm_score",
    (s, d) => {
      import s.implicits._
      def pairs = docs(s, d)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          val t = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
          (0 until math.max(0, t.length - 1)).iterator.map(i => (id, t(i), t(i + 1)))
        }
        .toDF("doc_id", "w1", "w2")
      val w = Window.partitionBy(col("w1"))
      val lm = pairs
        .groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("n12"))
        .withColumn("n1", sum(col("n12")).over(w))
        .select(col("w1"), col("w2"), expr("(10000 * n12) div n1").as("cond_pm"))
      pairs
        .join(lm, Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("cond_pm")).as("s_pm"),
          min(col("cond_pm")).as("min_pm"))
        .select(col("doc_id"), col("n_bigrams"),
          expr("s_pm div n_bigrams").as("avg_pm"), col("min_pm"))
        .orderBy("doc_id")
    },
    Some("""
      WITH b AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i])) AS w1,
               unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i+1])) AS w2
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)
      ), c AS (
        SELECT w1, w2, count(*) AS n12 FROM b GROUP BY w1, w2
      ), lm AS (
        SELECT w1, w2,
               ((10000 * n12) // (sum(n12) OVER (PARTITION BY w1)))::BIGINT AS cond_pm
        FROM c
      )
      SELECT doc_id, count(*) AS n_bigrams,
             (sum(cond_pm) // count(*))::BIGINT AS avg_pm,
             min(cond_pm) AS min_pm
      FROM b JOIN lm USING (w1, w2)
      GROUP BY doc_id
      ORDER BY doc_id
    """.stripMargin.trim)
  )

  /** Vocabulary statistics: corpus document frequency per token (IDF
    * inputs). Top-30 tokens by doc frequency with tie-break. */
  val textVocab: QueryDef = QueryDef(
    "text_vocab",
    (s, d) => {
      import s.implicits._
      val docTokens = docs(s, d)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          text.toLowerCase(java.util.Locale.ROOT).split(" ", -1).distinct.iterator.map(t => (id, t))
        }
        .toDF("doc_id", "token")
      docTokens
        .groupBy(col("token"))
        .agg(countDistinct(col("doc_id")).as("doc_freq"))
        .orderBy(col("doc_freq").desc, col("token"))
        .limit(30)
    },
    Some("""
      SELECT token, count(DISTINCT doc_id) AS doc_freq
      FROM (
        SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS token
        FROM documents)
      GROUP BY token
      ORDER BY doc_freq DESC, token
      LIMIT 30
    """.stripMargin.trim)
  )

  /** TF-IDF feature extraction: top-3 tokens per document by
    * tf * ln(N/df). The doc-frequency table is vocabulary-sized (unbounded
    * under Heaps' law), so its join is AQE's call — broadcast while small;
    * term frequencies come off the token stream with one shuffle. */
  val textTfidf: QueryDef = QueryDef(
    "text_tfidf",
    (s, d) => {
      import s.implicits._
      val tokens = docs(s, d)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          text.toLowerCase(java.util.Locale.ROOT).split(" ", -1).iterator.map(t => (id, t))
        }
        .toDF("doc_id", "token")
      // Corpus size N stays IN the plan as a broadcast scalar — a driver
      // .count() here would run an extra eager corpus pass per query build.
      val n = broadcast(docs(s, d).agg(count(lit(1)).cast("double").as("n_docs")))
      val tf = tokens.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      // doc frequency DERIVED from tf (one row per (doc, token) already),
      // not a second aggregation over the raw token stream
      val df = tf.groupBy(col("token")).agg(count(lit(1)).as("doc_freq"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("token"))
      // df is vocabulary-sized (grows with the corpus by Heaps' law) — no
      // broadcast hint; AQE broadcasts it while it fits, shuffles beyond.
      tf.join(df, "token")
        .crossJoin(n)
        .withColumn("tfidf", round(col("tf") * log(col("n_docs") / col("doc_freq")), 4))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("rn"), col("token"), col("tf"), col("doc_freq"), col("tfidf"))
        .orderBy("doc_id", "rn")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
      ), df AS (
        SELECT token, count(DISTINCT doc_id) AS doc_freq FROM toks GROUP BY token
      ), tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token
      ), scored AS (
        SELECT tf.doc_id, tf.token, tf.tf, df.doc_freq,
               round(tf.tf * ln((SELECT count(*) FROM documents)::DOUBLE / df.doc_freq), 4) AS tfidf
        FROM tf JOIN df USING (token)
      )
      SELECT doc_id, rn, token, tf, doc_freq, tfidf
      FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
            FROM scored)
      WHERE rn <= 3
      ORDER BY doc_id, rn
    """.stripMargin.trim)
  )

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1): per-doc
    * duplicate-token fraction and top n-gram fraction, the filters real
    * pretraining pipelines apply before dedup. All ratios are exact
    * integer per-mille (truncating div — both engines truncate toward
    * zero on positives, settled round 4), so the repetitive flag cannot
    * float-diverge between engines.
    *
    * Scale: each doc scores independently in ONE typed map (per-doc
    * hash counting in JVM code — per-element HOF math would run
    * interpreted; see the `spark-perf-pitfalls` rule) — a narrow pass,
    * zero exchanges before the output ORDER BY, trivially linear at
    * 100 TB. Thresholds (60‰ top-bigram, 600‰ dup-token) sit at ~p85 of
    * this corpus so the flag genuinely splits it. */
  val textRepetition: QueryDef = QueryDef(
    "text_repetition",
    (s, d) => {
      import s.implicits._
      docs(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          val t = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
          val n = t.length.toLong
          val nd = t.distinct.length.toLong
          var topBg = 0L
          if (n >= 2) {
            val counts = new java.util.HashMap[String, Int]()
            var i = 0
            while (i < t.length - 1) {
              val k = t(i) + " " + t(i + 1)
              val c = counts.merge(k, 1, Integer.sum)
              if (c > topBg) topBg = c
              i += 1
            }
          }
          val dupPm = if (n > 0) (1000L * (n - nd)) / n else 0L
          val topPm = if (n >= 2) (1000L * topBg) / (n - 1) else 0L
          (id, n, nd, dupPm, topBg, topPm, topPm >= 60 || dupPm >= 600)
        }
        .toDF("doc_id", "n_tokens", "n_distinct", "dup_token_pm",
          "top_bigram_n", "top_bigram_pm", "repetitive")
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      base AS (SELECT doc_id, len(t) AS n, len(list_distinct(t)) AS nd FROM t),
      bg AS (
        SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i+1])) AS b
        FROM t
      ), bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
      topb AS (SELECT doc_id, max(c) AS top FROM bc GROUP BY doc_id),
      m AS (
        SELECT base.doc_id, n, nd,
               CASE WHEN n > 0 THEN (1000 * (n - nd)) // n ELSE 0 END AS dup_pm,
               coalesce(top, 0) AS topn,
               CASE WHEN n >= 2 THEN (1000 * coalesce(top, 0)) // (n - 1) ELSE 0 END AS top_pm
        FROM base LEFT JOIN topb ON base.doc_id = topb.doc_id
      )
      SELECT doc_id, n::BIGINT AS n_tokens, nd::BIGINT AS n_distinct,
             dup_pm::BIGINT AS dup_token_pm, topn::BIGINT AS top_bigram_n,
             top_pm::BIGINT AS top_bigram_pm,
             (top_pm >= 60 OR dup_pm >= 600) AS repetitive
      FROM m
      ORDER BY doc_id
    """.stripMargin.trim)
  )

  /** Zipf rank–frequency diagnostic: the least-squares slope of
    * ln(freq) ~ ln(rank) over the corpus vocabulary (natural text ≈ −1;
    * this synthetic word-soup corpus is near-uniform, slope ≈ 0 — itself
    * the diagnostic: a corpus whose slope is far from −1 isn't
    * distributionally natural). One token exchange for the counts; the
    * ranking window and the regression run over the VOCABULARY-sized
    * aggregate (tiny — `Registry.wholeFrameKey` per the WindowExec rule),
    * never the corpus.
    *
    * Parity: regr_slope/intercept/r2 are float sums over vocab-count
    * points; both engines compute the same closed form and outputs round
    * to 4 dp (the text_tfidf ln-precedent). */
  val qZipfSlope: QueryDef = QueryDef(
    "q_zipf_slope",
    (s, d) => {
      import s.implicits._
      val tokens = docs(s, d)
        .select(col("text"))
        .as[String]
        .flatMap(t => t.toLowerCase(java.util.Locale.ROOT).split(" ", -1).iterator)
        .toDF("token")
      val ranked = tokens
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(graft.Registry.wholeFrameKey(col("n")))
            .orderBy(col("n").desc, col("token"))))
      ranked.agg(
        count(lit(1)).as("n_types"),
        sum(col("n")).as("n_tokens"),
        round(expr("regr_slope(ln(n), ln(rank))"), 4).as("zipf_slope"),
        round(expr("regr_intercept(ln(n), ln(rank))"), 4).as("zipf_intercept"),
        round(expr("regr_r2(ln(n), ln(rank))"), 4).as("zipf_r2"))
    },
    Some("""
      WITH f AS (
        SELECT token, count(*) AS n
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
        GROUP BY token
      ), r AS (
        SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rank FROM f
      )
      SELECT count(*) AS n_types, sum(n)::BIGINT AS n_tokens,
             round(regr_slope(ln(n), ln(rank)), 4) AS zipf_slope,
             round(regr_intercept(ln(n), ln(rank)), 4) AS zipf_intercept,
             round(regr_r2(ln(n), ln(rank)), 4) AS zipf_r2
      FROM r
    """.stripMargin.trim)
  )

  /** Language-ID evaluation: confusion matrix of [[textLangid]]'s
    * stopword-profile prediction against the corpus's labeled `lang`
    * column, with per-true-language recall in exact integer per-mille —
    * the classifier-eval op every filtering pipeline needs before trusting
    * a heuristic gate (zh has no profile here, so its row is all
    * off-diagonal: the eval SURFACES the heuristic's blind spot rather
    * than hiding it). Composes the langid operator's own output
    * (operators are ordinary DataFrames, so they compose); the matrix
    * aggregate and recall window run over the ≤langs² cells. */
  val textLangidEval: QueryDef = QueryDef(
    "text_langid_eval",
    (s, d) => {
      val pred = textLangid.fn(s, d).select(col("doc_id"), col("pred_lang"))
      val cells = docs(s, d).select(col("doc_id"), col("lang"))
        .join(pred, "doc_id")
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
      cells
        .withColumn("lang_total",
          sum(col("n_docs")).over(Window.partitionBy(col("lang"))))
        .select(col("lang"), col("pred_lang"), col("n_docs"),
          when(col("lang") === col("pred_lang"),
            expr("(1000 * n_docs) div lang_total")).otherwise(0L).as("recall_pm"))
        .orderBy("lang", "pred_lang")
    },
    Some("""
      WITH p AS (
        SELECT doc_id,
               CASE WHEN s_en >= greatest(s_fr, s_es, s_de) THEN 'en'
                    WHEN s_fr >= greatest(s_es, s_de) THEN 'fr'
                    WHEN s_es >= s_de THEN 'es'
                    ELSE 'de' END AS pred_lang
        FROM (
          SELECT doc_id,
                 len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'is'))) AS s_en,
                 len(list_filter(toks, t -> t IN ('le', 'la', 'de', 'et', 'un'))) AS s_fr,
                 len(list_filter(toks, t -> t IN ('el', 'los', 'de', 'y', 'un'))) AS s_es,
                 len(list_filter(toks, t -> t IN ('der', 'die', 'das', 'und', 'ein'))) AS s_de
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents))
      ), cells AS (
        SELECT d.lang, p.pred_lang, count(*) AS n_docs
        FROM documents d JOIN p USING (doc_id)
        GROUP BY d.lang, p.pred_lang
      )
      SELECT lang, pred_lang, n_docs,
             (CASE WHEN lang = pred_lang
                   THEN (1000 * n_docs) // (sum(n_docs) OVER (PARTITION BY lang))
                   ELSE 0 END)::BIGINT AS recall_pm
      FROM cells
      ORDER BY lang, pred_lang
    """.stripMargin.trim)
  )

  /** Per-document n-gram novelty — the RefinedWeb/C4 "duplicate text
    * fraction" quality signal: what share of a doc's distinct word
    * 3-gram shingles also occur in at least one OTHER document. High
    * shared fraction = boilerplate/templated content even when no single
    * whole-doc duplicate exists; pipelines threshold on it between the
    * exact and fuzzy dedup passes. Exact integer per-mille.
    *
    * Scale: the [[Dedup.shingleTokens]] typed flatMap (distinct shingles
    * per doc, one pass), a corpus-wide count over the shingle exchange,
    * and the per-doc re-aggregate — two linear exchanges of 8-byte-ish
    * rows, never doc×doc. Docs under 3 tokens carry no shingles and are
    * absent by construction on both engines. */
  val textNgramNovelty: QueryDef = QueryDef(
    "text_ngram_novelty",
    (s, d) => {
      val wTok = Window.partitionBy(col("tok"))
      Dedup.shingleTokens(s, d)
        .withColumn("docs_with", count(lit(1)).over(wTok))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_shingles"),
          sum(when(col("docs_with") > 1, 1L).otherwise(0L)).as("n_shared"))
        .select(col("doc_id"), col("n_shingles"), col("n_shared"),
          expr("(1000 * (n_shingles - n_shared)) div n_shingles").as("novelty_pm"))
        .orderBy("doc_id")
    },
    Some("""
      WITH w AS (
        SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
      ), sh AS (
        SELECT DISTINCT doc_id, w[i] || '_' || w[i+1] || '_' || w[i+2] AS tok
        FROM w, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) t
        WHERE len(w) >= 3
      ), c AS (
        SELECT doc_id, count(*) OVER (PARTITION BY tok) AS docs_with FROM sh
      )
      SELECT doc_id, n_shingles, n_shared,
             (1000 * (n_shingles - n_shared)) // n_shingles AS novelty_pm
      FROM (
        SELECT doc_id, count(*) AS n_shingles,
               sum(CASE WHEN docs_with > 1 THEN 1 ELSE 0 END)::BIGINT AS n_shared
        FROM c GROUP BY doc_id)
      ORDER BY doc_id
    """.stripMargin.trim)
  )

  /** Per-document token Shannon entropy — the lexical-diversity quality
    * signal (low entropy = repetitive/templated text, the same family as
    * [[textRepetition]] but distribution-shaped rather than top-k):
    * H = ln(n) − (Σ cᵢ·ln cᵢ)/n over the doc's token counts, plus the
    * type-normalized H/ln(types) ∈ [0,1]. One typed map per doc — zero
    * exchanges before the output sort, trivially linear.
    *
    * Parity: both engines sum ≤types ln-terms in doubles (≤1e-13 relative
    * divergence) and round to 4 dp — the text_tfidf/zipf ln precedent. */
  val textEntropy: QueryDef = QueryDef(
    "text_entropy",
    (s, d) => {
      import s.implicits._
      docs(s, d)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val toks = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
          val counts = scala.collection.mutable.HashMap.empty[String, Long]
          toks.foreach(t => counts.update(t, counts.getOrElse(t, 0L) + 1L))
          val n = toks.length.toDouble
          var slnc = 0.0
          counts.values.foreach(c => slnc += c * math.log(c.toDouble))
          val h = math.log(n) - slnc / n
          val types = counts.size
          val norm = if (types > 1) h / math.log(types.toDouble) else 0.0
          (id, toks.length.toLong, types.toLong, h, norm)
        }
        .toDF("doc_id", "n_tokens", "n_types", "h", "norm")
        .select(col("doc_id"), col("n_tokens"), col("n_types"),
          round(col("h"), 4).as("token_entropy"),
          round(col("norm"), 4).as("norm_entropy"))
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents
      ), c AS (
        SELECT doc_id, tok, count(*) AS c FROM t GROUP BY doc_id, tok
      ), agg AS (
        SELECT doc_id, sum(c)::BIGINT AS n, count(*) AS types,
               sum(c * ln(c)) AS s
        FROM c GROUP BY doc_id
      )
      SELECT doc_id, n AS n_tokens, types AS n_types,
             round(ln(n) - s / n, 4) AS token_entropy,
             round(CASE WHEN types > 1 THEN (ln(n) - s / n) / ln(types)
                        ELSE 0.0 END, 4) AS norm_entropy
      FROM agg
      ORDER BY doc_id
    """.stripMargin.trim)
  )

  /** First BPE ITERATION statistics (Sennrich et al. 2016): corpus-wide
    * frequencies of adjacent character pairs within whitespace words — the
    * exact count table the first merge step of byte-pair-encoding
    * tokenizer training maximizes over. Top-40 pairs, count desc / pair
    * asc (a total deterministic order, so the LIMIT is oracle-exact).
    *
    * Scale shape: one typed flatMap (the Generate pitfall rule) into a
    * ≤charset²-key partial-aggregated count — map-side combine collapses
    * the pair stream before its single tiny exchange; iterating merges
    * (real BPE training) repeats this same linear pass with the merge
    * table as a plan constant. */
  val textBpePairs: QueryDef = QueryDef(
    "text_bpe_pairs",
    (s, d) => {
      import s.implicits._
      docs(s, d)
        .select(col("text"))
        .as[String]
        .flatMap { t =>
          t.split(" ", -1).iterator.flatMap { w =>
            (0 until w.length - 1).iterator.map(i => w.substring(i, i + 2))
          }
        }
        .toDF("pair")
        .groupBy(col("pair"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(40)
    },
    Some("""
      WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
      ), pairs AS (
        SELECT substr(w, i, 2) AS pair
        FROM words, LATERAL (
          SELECT unnest(range(1, length(w))) AS i) t
        WHERE length(w) >= 2
      )
      SELECT pair, count(*) AS n
      FROM pairs
      GROUP BY pair
      ORDER BY n DESC, pair
      LIMIT 40
    """.stripMargin.trim)
  )

  /** BM25 retrieval scoring (Robertson/Spärck Jones; k1=1.2, b=0.75) —
    * the ranking function every corpus-search / relevance-sampling lane
    * runs. The "query" is self-contained and deterministic: the 3 most
    * common informative tokens (highest doc-freq among tokens appearing
    * in ≤ half the corpus, token tie-break) — the same seed both engines
    * derive. Emits the top-20 docs by score.
    *
    * Float discipline: every constant is written as the SAME decimal
    * literal in both engines ((1.2+1) computed in binary is NOT the
    * double literal 2.2 — off by 1 ulp, enough to flip a 4-dp rounding
    * boundary); idf keeps one ln per (token) row (the text_tfidf ln
    * precedent) and scores round to 4 dp BEFORE the rank.
    *
    * Scale: token stream is a typed flatMap; tf is the one data-sized
    * exchange (shared shape with text_tfidf); dl/df/stats/query all
    * derive from tf; stats and the 3-term query BROADCAST, so scoring is
    * a narrow map over the tf rows of the query terms only; top-20 is
    * TakeOrdered (per-partition heaps), never a whole-frame sort. */
  val textBm25: QueryDef = QueryDef(
    "text_bm25",
    (s, d) => {
      import s.implicits._
      val tokens = docs(s, d)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          text.toLowerCase(java.util.Locale.ROOT).split(" ", -1).iterator.map(t => (id, t))
        }
        .toDF("doc_id", "token")
      val tf = tokens.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      // avg over exact integer dl — the long sum is exact, so the double
      // division is order-independent (no float-summation divergence)
      val stats = broadcast(dl.agg(
        count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl")))
      val dfT = tf.groupBy(col("token")).agg(count(lit(1)).as("doc_freq"))
      val q = broadcast(dfT.crossJoin(stats)
        .filter(col("doc_freq") <= col("n_docs") / 2)
        .orderBy(col("doc_freq").desc, col("token"))
        .limit(3)
        .select(col("token"), col("doc_freq")))
      tf.join(q, "token")
        .join(dl, "doc_id")
        .crossJoin(stats)
        .withColumn("contrib",
          log(lit(1.0) + (col("n_docs") - col("doc_freq") + lit(0.5)) / (col("doc_freq") + lit(0.5))) *
            (col("tf") * lit(2.2)) /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
        .groupBy(col("doc_id"))
        .agg(round(sum(col("contrib")), 4).as("bm25"), count(lit(1)).as("n_terms_hit"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(20)
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
      ), tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2
      ), dl AS (
        SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1
      ), stats AS (
        SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl
      ), dft AS (
        SELECT token, count(*) AS doc_freq FROM tf GROUP BY 1
      ), q AS (
        SELECT token, doc_freq FROM dft, stats
        WHERE doc_freq <= n_docs / 2
        ORDER BY doc_freq DESC, token LIMIT 3
      ), scored AS (
        SELECT tf.doc_id,
               ln(1.0 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5)) *
                 (tf.tf * 2.2) /
                 (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl)) AS contrib
        FROM tf JOIN q USING (token) JOIN dl USING (doc_id), stats
      )
      SELECT doc_id, round(sum(contrib), 4) AS bm25, count(*) AS n_terms_hit
      FROM scored
      GROUP BY doc_id
      ORDER BY bm25 DESC, doc_id
      LIMIT 20
    """.stripMargin.trim)
  )

  /** Number of BPE merge rounds [[textBpeTrain]] learns. Small by design:
    * each round is one tiny vocabulary-table job, and 12 rounds is enough
    * to exercise multi-character merges (merges of earlier merges). */
  private[graft] val BpeMerges = 12

  /** FULL iterative BPE training (Sennrich et al. 2016) — the tokenizer-
    * training loop itself, not just one pair census ([[textBpePairs]] is
    * the single-round version). The classic two-level shape keeps it
    * linear: the corpus is read ONCE into a word-frequency table (Zipf:
    * vocabulary-sized, orders of magnitude smaller than the corpus —
    * this is why HF/SentencePiece trainers all start here), and every
    * merge round runs on that table only: adjacent-symbol pair counts
    * weighted by word freq (one tiny exchange), argmax with a TOTAL
    * deterministic order (count desc, then left/right symbol asc), then
    * a greedy left-to-right non-overlapping merge rewrite of the symbol
    * sequences. Each round localCheckpoints the (tiny) vocab so the
    * typed-map lineage never deepens. At 100 TB the corpus pass
    * dominates and parallelizes; rounds cost O(vocab) each — the same
    * sequential-by-nature loop real trainers run. The driver holds only
    * the merge table (rows = [[BpeMerges]]).
    *
    * Rows-only by design (SQL cannot express the iteration); the spec
    * replays an INDEPENDENT single-node scala implementation of the
    * textbook algorithm and asserts the merge tables identical. */
  /** Session-scoped memo of the learned merge table per (session, corpus)
    * — the shared-LSH-memo precedent (Dedup.scala): training is
    * deterministic, so the first caller (train or apply) pays the 12
    * rounds and later callers read 12 cached rows. A real deployment
    * persists the table instead (the ann_index pattern).
    *
    * Keyed by `sessionUUID + dir` — a STRING, never the SparkSession
    * itself, so the memo cannot pin a stopped session (and its merge
    * tables) for the JVM lifetime. Bounded at [[BpeMemoCap]] entries
    * (clear-on-overflow: correctness never depends on a hit), and the
    * training job runs OUTSIDE any map lock — `computeIfAbsent` would
    * hold its bin lock across the whole 12-round Spark job, blocking any
    * unrelated key that hashes to the same bin. */
  /** Guaranteed-unique session-stable string key ([[graft.Registry
    * .sessionToken]]'s per-session UUID) — never the session OBJECT, so
    * the memo can't pin a stopped session, and never appId+identityHash,
    * which collides across newSession() siblings / GC'd sessions. */
  private def sessionKey(s: SparkSession): String = graft.Registry.sessionToken(s)

  private val BpeMemoCap = 64
  private val bpeMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Int, String, String, Long)]]()

  private def bpeMerges(s: SparkSession, d: String): Seq[(Int, String, String, Long)] = {
    // dirFingerprint: a same-session corpus regeneration retrains instead
    // of silently reusing the stale merge table (Guards memo contract)
    val key = sessionKey(s) + "|" + d + "|" + graft.Registry.dirFingerprint(d)
    val hit = bpeMemo.get(key)
    if (hit != null) hit
    else {
      val trained = trainBpe(s, d) // outside the map: no bin lock held
      if (bpeMemo.size >= BpeMemoCap) bpeMemo.clear()
      val prev = bpeMemo.putIfAbsent(key, trained)
      if (prev != null) prev else trained
    }
  }

  private def trainBpe(s: SparkSession, d: String): Seq[(Int, String, String, Long)] = {
      import s.implicits._
      val words = docs(s, d).select(col("text")).as[String]
        .flatMap(_.split(" ", -1).iterator.filter(_.nonEmpty))
        .toDF("w").groupBy(col("w")).agg(count(lit(1)).as("freq"))
      var vocab = words.as[(String, Long)]
        .map { case (w, f) => (w.map(_.toString).toList, f) }
        .localCheckpoint()
      val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
      for (r <- 1 to BpeMerges) {
        val best = vocab
          .flatMap { case (syms, f) =>
            (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1), f))
          }
          .toDF("l", "r", "f")
          .groupBy(col("l"), col("r")).agg(sum(col("f")).as("pair_count"))
          .orderBy(col("pair_count").desc, col("l"), col("r"))
          .as[(String, String, Long)].head()
        merges += ((r, best._1, best._2, best._3))
        val (bl, br) = (best._1, best._2)
        val prev = vocab
        vocab = vocab.map { case (syms, f) =>
          (bpeMergeOnce(syms.toArray, bl, br).toList, f)
        }.localCheckpoint()
        prev.unpersist()
      }
      vocab.unpersist()
      merges.toSeq
  }

  val textBpeTrain: QueryDef = QueryDef(
    "text_bpe_train",
    (s, d) => {
      import s.implicits._
      bpeMerges(s, d).toDF("merge_rank", "left", "right", "pair_count")
        .orderBy("merge_rank")
    },
    None // iterative training loop: rows-only; spec replays an
    //      independent local implementation and asserts identity
  )

  /** The greedy left-to-right non-overlapping single-merge rewrite both
    * the trainer and the encoder share — one (left, right) pair folded
    * into a symbol array. */
  private[graft] def bpeMergeOnce(syms: Array[String], bl: String, br: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == bl && syms(i + 1) == br) {
        out += (bl + br); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** BPE ENCODE — the apply half of the tokenizer pair ([[textBpeTrain]]
    * is the train half): every document is segmented with the LEARNED
    * merge table by replaying the merges in rank order through the same
    * greedy left-to-right kernel the trainer used (so corpus-wide token
    * counts equal the trainer's own final vocabulary arithmetic — the
    * property the spec asserts against the independent local BPE). The
    * merge table is deterministic, so it recomputes identically here and
    * rides into the encode map as a broadcast constant (12 rows; a real
    * deployment reads the persisted table — the ann_index pattern).
    * Report per language: chars in, tokens out, and the compression in
    * per-mille — the number a tokenizer-budget planner consumes. ONE
    * narrow typed map over the corpus after the vocabulary-sized
    * training jobs. Rows-only (iterative; no SQL oracle). */
  val textBpeApply: QueryDef = QueryDef(
    "text_bpe_apply",
    (s, d) => {
      import s.implicits._
      val merges: Seq[(String, String)] =
        bpeMerges(s, d).sortBy(_._1).map(t => (t._2, t._3))
      val mergesB = s.sparkContext.broadcast(merges)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"))
        .as[(Long, String, String)]
        .map { case (_, lang, text) =>
          var nChars = 0L
          var nToks = 0L
          text.split(" ", -1).foreach { w =>
            if (w.nonEmpty) {
              var syms = w.map(_.toString).toArray
              mergesB.value.foreach { case (bl, br) =>
                syms = bpeMergeOnce(syms, bl, br)
              }
              nChars += w.length
              nToks += syms.length
            }
          }
          (lang, nChars, nToks)
        }
        .toDF("lang", "n_chars", "n_toks")
        .groupBy(col("lang"))
        .agg(
          sum(col("n_chars")).as("chars_in"),
          sum(col("n_toks")).as("tokens_out"),
          expr("(1000 * sum(n_toks)) div sum(n_chars)").as("compression_pm"))
        .orderBy("lang")
    },
    None // iterative encode: rows-only; spec ties totals to the
    //      independent local BPE's final vocabulary arithmetic
  )

  val all: Seq[QueryDef] = Seq(
    textTokens, textQuality, textLangid, textFingerprint, textRollingHash,
    textBigramFreq, textBigramLm, textLmScore, textVocab, textTfidf,
    textRepetition, qZipfSlope, textLangidEval, textNgramNovelty, textEntropy,
    textBpePairs, textBm25, textBpeTrain, textBpeApply
  )
}
