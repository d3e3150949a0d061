package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

package object queries {
  /** A named query: (session, sf-dir) → result DataFrame. */
  type Q = (SparkSession, String) => DataFrame

  /** Shared oracle-parity helpers (see SparkEntry scaladoc for the
    * cross-engine determinism conventions).
    */
  def dec(c: Column): Column = c.cast("decimal(18,4)")
  def asDouble(c: Column): Column = c.cast("double")
}
