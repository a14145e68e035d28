package graft.queries

object DedupQueries {
  val all: Seq[Q] = Seq()
}
