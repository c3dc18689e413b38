package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** F8 — scalar UDFs (SURVEY §2.7). The URL validator mirrors the
  * reference's non-standard `URL` column type (StellarSQL advertises a
  * URL primitive; checkout empty at survey time — SURVEY.md §0): here it
  * is a validation function over plain strings, the Spark-idiomatic
  * equivalent of a constrained type.
  *
  * UDFs are the LAST resort tier (they break codegen fusion); these exist
  * to cover the UDF contract surface — hot-path math uses builtins/HOFs.
  */
object Udfs {
  private val urlRe =
    "^(https?)://([A-Za-z0-9.-]+)(:[0-9]{1,5})?(/[^\\s]*)?$".r

  def isValidUrl(s: String): Boolean =
    s != null && urlRe.pattern.matcher(s).matches()

  val isValidUrlUdf: UserDefinedFunction = udf(isValidUrl _)

  /** Cosine similarity over two float vectors, accumulated in double,
    * sequential order (deterministic). Null/length-mismatch → null. */
  def cosine(a: Seq[Float], b: Seq[Float]): Option[Double] =
    if (a == null || b == null || a.length != b.length || a.isEmpty) None
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) None
      else Some(dot / (math.sqrt(na) * math.sqrt(nb)))
    }

  val cosineUdf: UserDefinedFunction = udf(cosine _)

  def is_valid_url(c: Column): Column = isValidUrlUdf(c)
  def cosine_sim(a: Column, b: Column): Column = cosineUdf(a, b)
}
