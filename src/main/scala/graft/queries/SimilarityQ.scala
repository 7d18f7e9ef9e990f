package graft.queries

object SimilarityQ {
  val queries: Seq[GQuery] = Seq()
}
