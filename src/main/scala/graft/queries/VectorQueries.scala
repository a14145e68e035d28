package graft.queries

object VectorQueries {
  val all: Seq[Q] = Seq()
}
