package graft

/** LLM-data-pipeline extension queries (dedup / similarity / text analysis /
  * multimodal) — SURVEY.md §2.10. */
object ExtQueries {
  def all: Seq[Q] = Seq()
}
