package graft

/** Reference-parity operator queries (SURVEY.md §2) — filled in per operator
  * as each lands with its ScalaTest spec. */
object ParityQueries {
  def all: Seq[Q] = Seq()
}
