package graft.queries

object TimeSeriesQ {
  val queries: Seq[GQuery] = Seq()
}
