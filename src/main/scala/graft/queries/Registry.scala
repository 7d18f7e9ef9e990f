package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark implementation plus (when SQL-expressible)
  * a DuckDB oracle equivalent. Column names of the two sides must match —
  * the driver's compare sorts columns by name before hashing.
  */
final case class GQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** SURVEY.md §2 operator ids this query exercises. */
    tags: Seq[String] = Nil)

object Registry {
  lazy val all: Seq[GQuery] =
    Relational.queries ++ WindowsQ.queries ++ TimeSeriesQ.queries ++
      TextQ.queries ++ SimilarityQ.queries ++ DomainQ.queries ++
      DomainQ2.queries ++ ScaleQ.queries ++ FitQ.queries ++ CurationQ.queries ++
      CurationQ2.queries ++ CurationQ3.queries ++ CurationQ4.queries ++
      CurationQ5.queries ++ CurationQ6.queries ++ CurationQ7.queries ++
      CurationQ8.queries ++ CurationQ9.queries

  lazy val byName: Map[String, GQuery] = all.map(q => q.name -> q).toMap
}
