package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession

/** Spark 4 keeps sessionUUID private[sql] on the classic SparkSession.
  * graft.Tables memoizes per-session state and needs an identifier that
  * is unique for the JVM's lifetime — identityHashCode is not (hash
  * reuse after GC of a stopped session would silently skip temp-view
  * registration). This re-exports just that one identifier.
  */
object SessionShim {
  def sessionUUID(spark: SparkSession): Option[String] = spark match {
    case s: org.apache.spark.sql.classic.SparkSession => Some(s.sessionUUID)
    case _ => None
  }
}
