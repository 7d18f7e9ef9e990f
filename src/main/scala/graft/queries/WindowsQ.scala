package graft.queries

object WindowsQ {
  val queries: Seq[GQuery] = Seq()
}
