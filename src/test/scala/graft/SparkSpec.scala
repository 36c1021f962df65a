package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for specs (small core count: test data is tiny). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.shared
  val sf: String = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val shared: SparkSession = Spark.session("graft-test", "4")
}
