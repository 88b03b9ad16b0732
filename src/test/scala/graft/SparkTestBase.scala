package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session — sbt forks a
  * single test JVM).
  */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestBase.session
  val sfTiny = "/root/testdata/sf0.001"

  override def afterAll(): Unit = () // session shared across suites
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // register graft functions/rules up front: specs whose fixtures never
    // touch Tables (which registers lazily) must not depend on running
    // after a suite that does — testOnly of a single such suite in a
    // fresh JVM exposed the ordering fragility in r12
    graft.functions.GraftFunctions.ensureRegistered(s)
    s
  }
}
