package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run. */
object SparkSpec {
  lazy val session: SparkSession = graft.config.Sessions.local()
  val sfDir = "/root/testdata/sf0.001"
}
