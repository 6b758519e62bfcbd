package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Shared local SparkSession + temp-dir helpers for all suites. */
trait SparkSuite extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.enable(
    GraftSession.configure(
      SparkSession.builder()
        .master("local[4]")
        .appName(getClass.getSimpleName)
        .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate())

  def tmpDir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  /** A fresh subdirectory path (not yet created) for a lake table. */
  def tablePath(name: String): String =
    tmpDir("graft-test") + "/" + name

  override def afterAll(): Unit = {
    // One session is shared across suites in a forked test JVM; don't stop.
    super.afterAll()
  }
}
