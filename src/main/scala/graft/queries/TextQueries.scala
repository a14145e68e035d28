package graft.queries

object TextQueries {
  val all: Seq[Q] = Seq()
}
