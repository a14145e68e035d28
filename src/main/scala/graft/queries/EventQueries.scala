package graft.queries

object EventQueries {
  val all: Seq[Q] = Seq()
}
