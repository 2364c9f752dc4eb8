package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.ScalarFns.strip

/** Markup / web-provenance operators for training-data pipelines
  * (SURVEY.md §2.10): HTML boilerplate stripping and URL→domain
  * extraction with blocklist filtering — the first stages any web-crawl
  * corpus (C4, RefinedWeb) runs before the text-quality gates.
  *
  * Everything here is a pure codegen'd projection (regexp chains + array
  * HOFs) — embarrassingly parallel, no shuffle, full column pruning; cost
  * at 100 TB is one pass over the `text` column.
  *
  * Determinism: every pattern is RE2-safe (no backrefs/lookahead, inline
  * `(?is)` flags instead of engine-specific option arguments) so Java
  * regex here and RE2 in the DuckDB oracle match identical spans.
  */
object Markup {

  /** `<script>`/`<style>` blocks are removed CONTENT AND ALL (their text
    * is code, not prose); non-greedy `.*?` stops at the first close tag
    * so two adjacent blocks cannot merge into one span. */
  val scriptPattern = "(?is)<script[^>]*>.*?</script>"
  val stylePattern = "(?is)<style[^>]*>.*?</style>"

  /** Any remaining tag — opening, closing, self-closing, comment-free. */
  val tagPattern = "<[^>]*>"

  /** Minimal entity table in DECODE ORDER: `&amp;` must come last or
    * `&amp;lt;` would double-decode to `<` (the standard single-pass
    * rule). Replacement text contains no `$`/`\`, so Java and RE2
    * replacement semantics agree. */
  val htmlEntities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&amp;" -> "&")

  /** Strip HTML to whitespace-normalized text: script/style blocks out,
    * tags → spaces (so `a</p><p>b` keeps its word boundary), entities
    * decoded, whitespace collapsed, ends trimmed. */
  def stripHtml(text: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(text, scriptPattern, " "), stylePattern, " ")
    val noTags = regexp_replace(noBlocks, tagPattern, " ")
    val decoded = htmlEntities.foldLeft(noTags) { case (c, (ent, repl)) =>
      regexp_replace(c, ent, repl)
    }
    strip(regexp_replace(decoded, "\\s+", " "))
  }

  /** URL host extraction: group 1 of the scheme+host pattern, lowercased.
    * Hosts keep any port suffix; path/query/fragment are excluded by the
    * `[^/\s?#]` class, and quote chars are excluded so an
    * attribute-delimited `href="https://x.com"` yields `x.com`, not
    * `x.com"` — the pattern must work on RAW markup (provenance gating
    * runs before [[stripHtml]], which erases hrefs with their tags). */
  val urlHostPattern = "https?://([^/\\s?#\"']+)"

  def urlHosts(text: Column): Column =
    transform(
      regexp_extract_all(text, lit(urlHostPattern), lit(1)),
      h => lower(h))

  /** Per-document web-provenance report: URL count, distinct-domain
    * count, blocked-URL count against a blocklist, and the resulting
    * keep flag (a doc linking ANY blocked domain is dropped — the C4
    * badwords-domain rule shape). Flags surface as INT 0/1 so the frame
    * hash-compares across engines. */
  def domainReport(docs: DataFrame, textCol: String, idCol: String,
      blocklist: Seq[String]): DataFrame = {
    val hosts = urlHosts(col(textCol))
    val blocked = filter(hosts, h => h.isin(blocklist: _*))
    docs.select(
      col(idCol),
      size(hosts).as("n_urls"),
      size(array_distinct(hosts)).as("n_domains"),
      size(blocked).as("n_blocked"),
      (size(blocked) === 0).cast("int").as("keep"))
  }

  /** Boolean form of the blocklist verdict for pipeline gating: true iff
    * the doc links NO blocked domain. */
  def domainKeep(text: Column, blocklist: Seq[String]): Column =
    size(filter(urlHosts(text), h => h.isin(blocklist: _*))) === 0

  /** All dot-suffixes of a host, longest first: `a.b.c` →
    * [`a.b.c`, `b.c`, `c`] — the candidate set a registrable-domain
    * blocklist entry can match (entry `b.c` blocks `a.b.c` and `b.c`
    * but never `xb.c`). Bounded by the host's label count. */
  def hostSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels) - i + 1), "."))
  }

  /** Subdomain-aware blocklist report — [[domainReport]]'s exact-match
    * `IN` misses `cdn7.ads.tracker.net` when the list carries
    * `tracker.net`; real crawl blocklists name REGISTRABLE domains and
    * expect every subdomain blocked. A host is blocked iff any of its
    * dot-suffixes equals a blocklist entry.
    *
    * Scale: the host's suffix set is label-count-bounded, so the match
    * is `arrays_overlap` against the (bounded, broadcast-literal)
    * blocklist — a pure codegen projection, no join, no per-entry
    * `LIKE '%.entry'` scan over the corpus. A million-entry blocklist
    * swaps the literal for a broadcast equi-join on the exploded
    * suffix — same candidate set, same semantics, hash lookup instead
    * of the O(|hosts|·|list|) suffix LIKE. */
  def suffixBlocklistReport(docs: DataFrame, textCol: String,
      idCol: String, blocklist: Seq[String]): DataFrame = {
    val hosts = urlHosts(col(textCol))
    val entries = typedLit(blocklist)
    val blocked = filter(hosts,
      h => arrays_overlap(hostSuffixes(h), entries))
    docs.select(
      col(idCol),
      size(hosts).as("n_urls"),
      size(blocked).as("n_blocked"),
      (size(blocked) === 0).cast("int").as("keep"))
  }

  /** Query parameters that carry no content identity — standard crawl
    * canonicalization set (Google/Facebook click ids + utm campaign
    * tags). A param is dropped when its NAME matches; `utm_` is a
    * prefix class. */
  val trackingParamPattern = "^(utm_[^=]*|gclid|fbclid|ref)(=.*)?$"

  /** Canonical URL for URL-level deduplication (the step web-crawl
    * pipelines run BEFORE fetching/content-dedup: two raw URLs that
    * canonicalize equal are the same page):
    *
    *   1. fragment stripped (`#...` is client-side only),
    *   2. scheme+host lowercased (case-insensitive per RFC 3986) — the
    *      path keeps its case (it is case-sensitive),
    *   3. tracking params removed ([[trackingParamPattern]]), remaining
    *      params kept IN ORDER (reordering would conflate genuinely
    *      different server semantics), `?` dropped when none survive,
    *   4. trailing `/` runs trimmed from the path.
    *
    * Pure codegen regexp/HOF chain — no shuffle; at 100 TB this is a
    * projection ahead of one dedup aggregate. Every pattern is RE2-safe
    * so the DuckDB oracle matches identical spans.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val base = regexp_replace(noFrag, "\\?.*$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val schemeHost = lower(regexp_extract(base, "^(https?://[^/]*)", 1))
    val path = regexp_replace(
      regexp_replace(base, "^https?://[^/]*", ""), "/+$", "")
    val kept = filter(split(query, "&"),
      p => !p.rlike(trackingParamPattern) && p =!= "")
    concat(schemeHost, path,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
  }

  /** C0/C1-ish control characters (minus \t \n \r, which are legitimate
    * whitespace) plus DEL — bytes that survive bad decoding and break
    * downstream tokenizers. */
  val controlCharPattern = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Unicode replacement char — its presence means the original bytes
    * were NOT valid in the decode encoding (the C4 bad-unicode signal). */
  val replacementChar = "\uFFFD"

  /** Control-character scrub + decode-health signals: cleaned text with
    * control chars removed, how many were removed, and how many U+FFFD
    * replacement chars remain (those are evidence of upstream decode
    * corruption — the usual policy is to DROP such docs, not patch them,
    * so they are counted, not scrubbed). Pure codegen projection. */
  def scrubControlChars(docs: DataFrame, textCol: String, idCol: String)
      : DataFrame = {
    val cleaned = regexp_replace(col(textCol), controlCharPattern, "")
    val nBad = length(col(textCol)) -
      length(regexp_replace(col(textCol), replacementChar, ""))
    docs.select(
      col(idCol),
      cleaned.as("text_clean"),
      (length(col(textCol)) - length(cleaned)).as("n_ctrl_removed"),
      nBad.as("n_replacement"),
      (nBad === 0).cast("int").as("keep"))
  }

  /** URL-level dedup: group documents by [[canonicalizeUrl]], keep the
    * lowest id as representative. `n_raw_forms` counts DISTINCT raw
    * spellings collapsed into the group — direct evidence the
    * canonicalization (not mere string equality) did the work.
    *
    * One hash shuffle on the canonical string (high cardinality, no
    * skew); the map side is the pure projection above. */
  def urlDedup(docs: DataFrame, urlCol: String, idCol: String): DataFrame =
    docs.select(col(idCol), col(urlCol),
      canonicalizeUrl(col(urlCol)).as("url_canon"))
      .groupBy(col("url_canon"))
      .agg(
        min(col(idCol)).as("representative_id"),
        count(lit(1)).as("n_copies"),
        countDistinct(col(urlCol)).as("n_raw_forms"))
}
