package graft.queries

/** Scratch plan dumper: `Test/runMain graft.queries.ExplainTool q77 [sfDir]`
  * prints the formatted physical plan of a registry query — the
  * `.explain("formatted")` loop the build discipline calls for. */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q01")
    val sf = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.all.filter(_.name.contains(name)).foreach { q =>
      println(s"==== ${q.name}")
      q.run(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
