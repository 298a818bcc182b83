package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared spark session for all suites (getOrCreate reuses one JVM-wide). */
trait SparkSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.core.GraftSession.local("graft-test", cores = 4)

  private val specTempDirs = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]

  /** Suite-scoped temp dir, removed in afterAll. Specs must use this
    * instead of a bare `Files.createTempDirectory` — the operators clean
    * every temp tree they create (EventsOpsSpec's leak test enforces it),
    * and the suites should hold themselves to the same bar rather than
    * littering /tmp with store roots on every run. */
  def tempDir(prefix: String): java.nio.file.Path = synchronized {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    specTempDirs += p
    p
  }

  override def afterAll(): Unit =
    try specTempDirs.foreach(graft.operators.EventsOps.rmTree)
    finally super.afterAll()
}
