package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared SparkSession across all suites (single JVM under sbt test). */
object TestSession {
  lazy val spark: SparkSession = {
    val s = graft.core.GraftSession.builder("local[8]", 8, "graft-test").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  val sf0001 = "/root/testdata/sf0.001"
}
