package graft

/** Local smoke: every harness table loads and counts. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.get()
    Tables.names.foreach { n =>
      val df = if (n == "events") Tables.events(spark, dir) else Tables.load(spark, dir, n)
      println(s"[smoke] $n count=${df.count()} schema=${df.schema.simpleString}")
    }
    spark.stop()
  }
}
