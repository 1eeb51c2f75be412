package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines: token
  * counting, quality scoring, language-ID heuristics, fingerprinting.
  *
  * Everything here is a pure `Column` expression built from Spark
  * built-ins (codegen'd, whole-stage-compatible — no UDFs), so at 100 TB
  * these run inside the scan's projection with columns pruned to `text`.
  * The quality/langid formulas are deliberately expressible in ANSI SQL
  * so the DuckDB oracle can replicate them term-for-term.
  */
object TextFunctions {

  /** Language stopword sets for the ID heuristic (public common words). */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "dans"),
    "es" -> Seq("el", "la", "los", "de", "y", "un", "una", "es", "que", "en"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"))

  /** Whitespace tokens of lower-cased text. */
  def words(text: Column): Column = split(lower(trim(text)), " +")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(words(text))

  /** Word n-grams as space-joined strings (empty array when fewer
    * than n tokens) — the unit of n-gram-overlap decontamination.
    * String grams keep the result oracle-checkable; at corpus scale
    * hash them ([[graft.functions.ShingleHashes]] is this exact map
    * with 8-byte outputs) so shuffles never carry gram text. */
  def ngrams(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(1), size(tokens) - (n - 1)),
        i => array_join(slice(tokens, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** BPE-ish subword token count: alpha runs, digit runs, and single
    * non-alphanumeric marks each count as one token. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Punctuation-character ratio over total length (0 for empty). */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      size(regexp_extract_all(text, lit("[^a-zA-Z0-9 ]"), lit(0)))
        .cast("double") / length(text).cast("double"))
      .otherwise(lit(0.0))

  /** Count of tokens found in `set`. */
  def stopwordCount(text: Column, set: Seq[String]): Column =
    size(filter(words(text), w => w.isin(set: _*)))

  /** Stopword ratio against the English set. */
  def stopwordRatio(text: Column): Column =
    when(tokenCount(text) > 0,
      stopwordCount(text, Stopwords("en")).cast("double") / tokenCount(text).cast("double"))
      .otherwise(lit(0.0))

  /** Composite document quality score in [0,1]:
    * 0.4·length-saturation(100 tokens) + 0.3·(1 − 5·punct ratio, floored)
    * + 0.3·stopword-presence saturation. A cheap, fully-columnar quality
    * gate of the kind used to filter web-scale training corpora. */
  def qualityScore(text: Column): Column = {
    val lenTerm = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val punctTerm = greatest(lit(1.0) - punctRatio(text) * 5.0, lit(0.0))
    val stopTerm = least(stopwordRatio(text) * 10.0, lit(1.0))
    // no rounding: the raw IEEE expression is bit-identical across engines
    lenTerm * 0.4 + punctTerm * 0.3 + stopTerm * 0.3
  }

  /** Stopword-vote language ID over the SQL-safe subset (en/fr/es/de;
    * ties and no-votes → "und"). The chain is deterministic and mirrors
    * the oracle SQL CASE exactly. */
  def langIdStopwords(text: Column): Column = {
    val en = stopwordCount(text, Stopwords("en"))
    val fr = stopwordCount(text, Stopwords("fr"))
    val es = stopwordCount(text, Stopwords("es"))
    val de = stopwordCount(text, Stopwords("de"))
    when(en + fr + es + de === 0, lit("und"))
      .when(en >= fr && en >= es && en >= de, lit("en"))
      .when(fr >= es && fr >= de, lit("fr"))
      .when(es >= de, lit("es"))
      .otherwise(lit("de"))
  }

  /** Full language ID: CJK-character detection first (n-gram heuristics
    * are useless across scripts), then the stopword vote. */
  def langId(text: Column): Column =
    when(text.rlike("[\\x{4e00}-\\x{9fff}]"), lit("zh"))
      .otherwise(langIdStopwords(text))

  /** 64-bit exact-content fingerprint of normalized text. */
  def fingerprint(text: Column): Column =
    xxhash64(concat_ws(" ", words(text)))

  /** Rolling polynomial fingerprints of k-word windows (document
    * fingerprinting à la winnowing): hash of each k-shingle. */
  def shingleFingerprints(text: Column, k: Int): Column = {
    val w = words(text)
    when(size(w) >= k,
      transform(sequence(lit(1), size(w) - (k - 1)),
        i => xxhash64(concat_ws(" ", (0 until k).map(j => element_at(w, i + j)): _*))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** k-word shingle strings (distinct), the unit for Jaccard/MinHash. */
  def shingles(text: Column, k: Int): Column = {
    val w = words(text)
    array_distinct(
      when(size(w) >= k,
        transform(sequence(lit(1), size(w) - (k - 1)),
          i => concat_ws(" ", (0 until k).map(j => element_at(w, i + j)): _*)))
        .otherwise(array().cast("array<string>")))
  }

  // ------------------------------------------------- repetition signals

  /** (top_token, top_token_n) as a struct: the most frequent token and
    * its count, via ONE linear fold over the sorted token array (equal
    * tokens are adjacent after the sort, so a run-length scan finds the
    * mode). Ties break to the smallest token — ascending order means
    * the earliest max run keeps the crown under a strictly-greater
    * comparison. O(n log n) per row, no explode, no shuffle.
    *
    * Higher-order functions are interpreted (not codegen'd), so the
    * per-row cost model matters: a nested formulation that re-counts
    * inside a lambda is O(distinct²·n) interpreted steps per row and
    * measured 60× slower than this fold at bench scale. */
  def topTokenStats(tokens: Column): Column = {
    val sorted = array_sort(tokens)
    val init = struct(
      lit(null).cast("string").as("prev"), lit(0).as("run"),
      lit(null).cast("string").as("best"), lit(0).as("bn"))
    // finish-lambda form: projecting fields out of a separately-built
    // struct would copy the whole fold once per field
    aggregate(sorted, init, (st, x) => {
      val run = when(st.getField("prev") === x, st.getField("run") + 1)
        .otherwise(lit(1))
      val better = run > st.getField("bn")
      struct(x.as("prev"), run.as("run"),
        when(better, x).otherwise(st.getField("best")).as("best"),
        when(better, run).otherwise(st.getField("bn")).as("bn"))
    }, st => struct(st.getField("best").as("top_token"),
      st.getField("bn").as("top_token_n")))
  }

  /** Count of the single most frequent token — the numerator of the
    * Gopher-style "fraction of tokens in the most common word"
    * repetition filter. */
  def topTokenCount(tokens: Column): Column =
    topTokenStats(tokens).getField("top_token_n")

  /** The most frequent token itself; ties break to the smallest token
    * so the value is deterministic and oracle-checkable. */
  def topToken(tokens: Column): Column =
    topTokenStats(tokens).getField("top_token")

  /** Duplicate n-gram count (total minus distinct): the intra-document
    * repeated-phrase mass behind "fraction of duplicate n-grams"
    * repetition filters. Same sorted-adjacency trick as
    * [[topTokenStats]]: duplicates = positions whose sorted neighbor is
    * equal. Scan-side like everything above. */
  def dupNgramCount(tokens: Column, n: Int): Column = {
    val g = array_sort(ngrams(tokens, n))
    aggregate(g,
      struct(lit(null).cast("string").as("prev"), lit(0).as("d")),
      (st, x) => struct(x.as("prev"),
        (st.getField("d") +
          when(st.getField("prev") === x, 1).otherwise(0)).as("d")))
      .getField("d")
  }

  // ------------------------------------------------------ PII redaction

  /** Detection patterns restricted to constructs whose leftmost-greedy
    * semantics agree between Java regex (Spark) and RE2 (DuckDB), so
    * redacted output is hash-checkable across engines: explicit char
    * classes, no \d / \w, no backreferences, no lookaround.
    *
    * Known, accepted imprecision (the price of the no-lookaround
    * discipline): the patterns are unanchored, so PhoneRe can match
    * INSIDE a longer digit run (`2024-555-12345` partially redacts its
    * middle) and a phone-shaped substring of an email's local part is
    * counted by piiPhoneCount even though the email pass consumes it
    * first during redaction — i.e. the counts are per-pattern over the
    * RAW text, not a census of what redactPii replaced. Both engines
    * compute the identical imprecision, so cross-engine parity holds;
    * a production scrub wanting boundary precision would add
    * `(^|[^0-9-])`-style guard groups with capture rewrites, at the
    * cost of a second rewrite pass. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Number of email / phone / IPv4 matches in `text` (per-pattern on
    * raw text — see the imprecision note above). */
  def piiEmailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0)))
  def piiPhoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhoneRe), lit(0)))
  def piiIpv4Count(text: Column): Column =
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0)))

  /** Masks all emails, then phones, then IPv4s (the order matters and
    * is part of the contract: an email's digits are consumed before the
    * phone/IP passes can see them). Pure per-row projection — at 100 TB
    * PII scrubbing is a map over the scan, nothing shuffles. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  // ----------------------------------------------------- URL filtering

  /** First URL host in `text` (empty string when none) — the C4-style
    * domain signal for blocklist filtering. Same Java/RE2-agreeing
    * construct discipline as the PII patterns. Skips an optional
    * userinfo segment (`user@host` must not yield `user`) and the
    * label structure forbids leading/trailing dots, so a blocklist
    * match cannot be evaded with `anything@host` or `host.` spellings. */
  val UrlHostRe = "https?://(?:[^/@ ]*@)?([A-Za-z0-9-]+(?:\\.[A-Za-z0-9-]+)*)"
  def extractDomain(text: Column): Column =
    regexp_extract(text, UrlHostRe, 1)

  /** Canonical form of a crawled URL — the revisit-dedup key: the same
    * page fetched as `HTTPS://Site.ORG:443/p?id=1&utm_source=feed#top`
    * and `https://site.org/p?id=1` must collapse to one document.
    * Rules, applied in order (each a codegen'd built-in regexp — no
    * UDF — and each mirrored op-for-op by the q98 oracle):
    *   1. fragment stripped (`#…` is client-side only);
    *   2. tracking parameters removed (`utm_*`, `gclid`, `fbclid` —
    *      matched as `&param=…`, i.e. never the FIRST query param:
    *      crawl URLs carry the real resource params first; a
    *      tracking-only query string is out of the supported shape);
    *   3. scheme+host lowercased (the path stays case-sensitive per
    *      RFC 3986 — only the authority is case-insensitive);
    *   4. default ports (:80, :443) dropped — ANCHORED to the
    *      authority (a port-lookalike in a path segment or an embedded
    *      URL in a query param must survive), and matched whether the
    *      port is followed by a path, a query, or nothing at all
    *      (`https://h.org:443?p=1` and bare `https://h.org:80` both
    *      canonicalize).
    * Scan-side projection: the 100 TB crawl canonicalizes during
    * ingest, then revisit-dedup is a plain groupBy on the key. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val noTrack = regexp_replace(noFrag,
      "&(utm_[a-z]+|gclid|fbclid)=[^&]*", "")
    val hostRe = "^[a-zA-Z]+://[^/]*"
    val lowered = concat(
      lower(regexp_extract(noTrack, hostRe, 0)),
      regexp_replace(noTrack, hostRe, ""))
    // the scheme is already lowered here, so [a-z]+ suffices; [^/:?#]*
    // stops the host at the port/path/query boundary
    regexp_replace(lowered, "^([a-z]+://[^/:?#]*):(80|443)([/?#]|$)", "$1$3")
  }

  /** Column API for [[HtmlMainContent]]: HTML → content-dense plain
    * text (nav/footer/aside and link-farm blocks removed) — the
    * boilerplate-aware sibling of `html_text`. */
  def mainContent(html: Column): Column = HtmlMainContent(html)
}
