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
}
