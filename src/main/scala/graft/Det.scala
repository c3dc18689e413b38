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

  /** Deterministic content-hash bucket in [0, 16^hexChars): the integer
    * value of the first `hexChars` hex digits of md5(c). The ONE shared
    * spelling of the sampling/sharding membership hash (x21's packing
    * shard, x35's mix membership, x39's training shards) — widen
    * hexChars for more buckets and both engines move together via
    * [[sql.md5Bucket]]. */
  def md5Bucket(c: Column, hexChars: Int): Column =
    conv(substring(md5(c.cast("binary")), 1, hexChars), 16, 10).cast("long")

  /** Oracle-side (DuckDB SQL) spellings of the same policy. */
  object sql {
    def dsum(e: String): String = s"CAST(SUM(CAST(($e) AS DECIMAL(18,4))) AS DOUBLE)"
    def dsum6(e: String): String = s"CAST(SUM(CAST(($e) AS DECIMAL(18,6))) AS DOUBLE)"
    // COUNT(e), not COUNT(*): the Spark side divides by count(c), which
    // skips nulls — the two spellings must stay aligned on nullable input
    def davg(e: String): String = s"${dsum(e)}/COUNT(($e))"

    /** DuckDB twin of [[Det.md5Bucket]] (DuckDB has no hex→int cast, so
      * the digits are positional strpos lookups). */
    def md5Bucket(e: String, hexChars: Int): String = {
      val terms = (1 to hexChars).map { i =>
        val mult = math.pow(16, (hexChars - i).toDouble).toLong
        val nib = s"(strpos('0123456789abcdef', substr(md5($e), $i, 1)) - 1)"
        if (mult == 1L) nib else s"$nib * $mult"
      }
      s"CAST(${terms.mkString(" + ")} AS BIGINT)"
    }
  }
}
