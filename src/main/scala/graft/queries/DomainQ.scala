package graft.queries

object DomainQ {
  val queries: Seq[GQuery] = Seq()
}
