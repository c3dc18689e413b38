package graft.operators

import org.apache.arrow.vector.{BigIntVector, Float8Vector, VarCharVector}
import org.apache.spark.sql.{DataFrame, GraftArrow, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import graft.{Det, Tables}

/** Round-7 wave: the Arrow-vectorized batch seam (f23), dynamic
  * partition pruning (s22), and two training-data ops — the composed
  * curation funnel (x58) and the leakage-safe cluster split (x60).
  */
object Extras8 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()

  val oracles: Map[String, String] = Map()
}
