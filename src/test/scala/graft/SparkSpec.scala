package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session keeps `sbt
  * test` fast).
  */
object TestSession {
  lazy val spark: SparkSession = Engine.session("local[4]", "graft-test")
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
}
