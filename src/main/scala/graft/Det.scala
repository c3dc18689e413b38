package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine determinism helpers (SURVEY §7.4).
  *
  * Hash-matching the DuckDB oracle requires bitwise-identical output, but
  * floating-point SUM/AVG is order-dependent and Spark's partial/final
  * aggregation order differs run-to-run and engine-to-engine. Policy:
  * route every money/measure aggregation through an exact DECIMAL
  * accumulator (order-independent), then emit DOUBLE (the decimal→double
  * conversion is the same nearest-double on both engines).
  *
  * The matching oracle-side spellings are in [[Det.sql]].
  */
object Det {
  /** 4-dp money/measure type: exact for TPC-H-ish prices/quantities. */
  val Money: DecimalType = DecimalType(18, 4)
  /** 6-dp variant for two-factor products like extprice*(1-disc)*(1+tax). */
  val Money6: DecimalType = DecimalType(18, 6)

  /** Order-independent SUM of a double measure, emitted as DOUBLE. */
  def dsum(c: Column): Column = sum(c.cast(Money)).cast("double")
  def dsum6(c: Column): Column = sum(c.cast(Money6)).cast("double")

  /** Order-independent AVG: exact decimal sum divided by count in IEEE
    * double — both engines perform the identical double/bigint division. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Oracle-side (DuckDB SQL) spellings of the same policy. */
  object sql {
    def dsum(e: String): String = s"CAST(SUM(CAST(($e) AS DECIMAL(18,4))) AS DOUBLE)"
    def dsum6(e: String): String = s"CAST(SUM(CAST(($e) AS DECIMAL(18,6))) AS DOUBLE)"
    // COUNT(e), not COUNT(*): the Spark side divides by count(c), which
    // skips nulls — the two spellings must stay aligned on nullable input
    def davg(e: String): String = s"${dsum(e)}/COUNT(($e))"
  }
}
