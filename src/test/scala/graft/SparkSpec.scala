package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"

  /** DROP TABLE plus its warehouse location: a failed previous run can
    * leave the location dir with no catalog entry (the in-memory catalog
    * dies with the JVM, the warehouse dir survives), which blocks the next
    * run's CREATE with LOCATION_ALREADY_EXISTS.
    */
  def dropTableHard(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    try {
      val loc = new org.apache.hadoop.fs.Path(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, name)
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    } catch { case _: Exception => () }
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.local("graft-test", "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
