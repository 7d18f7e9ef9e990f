package graft.queries

object TextQ {
  val queries: Seq[GQuery] = Seq()
}
