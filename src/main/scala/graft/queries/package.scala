package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** A registered operator query: (session, scale-factor dir) => result. */
  type Q = (SparkSession, String) => DataFrame

  /** Per-application scratch path for roundtrip queries — suffixed
    * with the applicationId so concurrent Verify runs on one machine
    * never clobber each other's store mid-read.
    */
  def tmpPath(s: SparkSession, name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/${name}_${s.sparkContext.applicationId}"
}
