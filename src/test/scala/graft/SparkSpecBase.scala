package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test run (Spark boot ≈ 10 s;
  * per-suite sessions would dominate test time). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession
      .builder(master = "local[4]", shufflePartitions = 4)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

object SparkSpecBase {
  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
    ()
  }
}

abstract class SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  /** Unique-per-run suffix for names that land in SHARED state (the
    * warehouse, managed table names): parallel suite execution or an
    * aborted run must not collide with a fixed name left behind. */
  protected def runTag: String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(8)

  /** Temp directory registered for recursive deletion at JVM exit —
    * specs that write index / checkpoint / sink layouts must not leak
    * them past the test run. */
  protected def tempDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      SparkSpecBase.deleteRecursively(dir)))
    dir.toString
  }
}
