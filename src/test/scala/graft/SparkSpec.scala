package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session keeps the suite
  * wall-clock dominated by logic, not session startup).
  */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.builder(2)
    .config("spark.sql.shuffle.partitions", "2")
    .appName("graft-test")
    .getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = TestSpark.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
