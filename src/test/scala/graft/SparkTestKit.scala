package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.Suite

/** Shared local session for specs — mirrors the Verify/Bench config. */
trait SparkTestKit extends BeforeAndAfterAll { self: Suite =>

  lazy val spark: SparkSession = SparkTestKit.session

  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = super.afterAll()
}

object SparkTestKit {
  // one session per JVM: ScalaTest suites share it, saving ~5s per suite
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
