package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"

  /** DROP TABLE plus its warehouse location — a failed previous test run
    * can leave an orphan location dir that blocks the next run's CREATE.
    */
  def dropTableHard(name: String): Unit =
    graft.sinks.Sinks.dropTableAndLocation(spark, name)
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.local("graft-test", "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
