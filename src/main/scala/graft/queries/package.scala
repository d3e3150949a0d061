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

  /** Let-binding for Catalyst expressions: evaluates `c` ONCE per row
    * and binds it as a lambda variable in `f`. Without this, projection
    * collapse inlines a subexpression into every use site — an
    * expression used k times (e.g. a token-hash array feeding 16
    * minhash lambdas) is recomputed k times per row.
    */
  def let1(c: org.apache.spark.sql.Column)(
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.element_at(
      org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.array(c), f),
      1)
}
