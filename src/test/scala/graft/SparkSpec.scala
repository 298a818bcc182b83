package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared spark session for all suites (getOrCreate reuses one JVM-wide). */
trait SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = graft.core.GraftSession.local("graft-test", cores = 4)
}
