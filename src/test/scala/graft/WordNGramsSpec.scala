package graft

import org.apache.spark.sql.functions._
import graft.functions.WordNGrams

class WordNGramsSpec extends SparkSpec {

  test("generator matches transform+posexplode on the corpus") {
    val docs = Tables.documents(spark, sf)
    val legacy = docs.select(col("doc_id"),
        posexplode(api.TextPipeline.ngramsCol(col("text"), 3))
          .as(Seq("pos", "ngram")))
      .collect().map(_.toString).sorted.toSeq
    val native = api.TextPipeline.ngramRows(docs, "doc_id", "text", 3)
      .collect().map(_.toString).sorted.toSeq
    assert(native == legacy)
  }

  test("edge cases: empty / short / repeated-space / null text") {
    import spark.implicits._
    val df = Seq(Some(""), Some("one two"), Some("a  b"), None,
        Some("w1 w2 w3 w4"))
      .toDF("text")
    val rows = df.select(WordNGrams.ngrams(col("text"), 3)
      .as(Seq("pos", "ngram"))).collect()
    // "" -> 1 word, none; "one two" -> none; "a  b" -> [a, '', b] -> 1;
    // null -> none; w1..w4 -> 2
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((0, "a  b"), (0, "w1 w2 w3"), (1, "w2 w3 w4")))
  }

  test("distinct mode emits first occurrence only, no shuffle needed") {
    import spark.implicits._
    val df = Seq("x y x y x y").toDF("text") // 3-grams: xyx yxy xyx yxy
    val rows = df.select(WordNGrams.ngrams(col("text"), 3, distinct = true)
      .as(Seq("pos", "ngram"))).collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    assert(rows == Seq((0, "x y x"), (1, "y x y")))
    // and the shingle pipeline built on it stays exchange-free
    val plan = api.TextPipeline.shingles(
        Seq(("a", 1L)).toDF("text", "doc_id"), "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("whole-stage codegen spans the generate") {
    val plan = api.TextPipeline.ngramRows(
        Tables.documents(spark, sf), "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Generate graft_ngrams"), plan)
  }

  test("SQL surface: LATERAL VIEW graft_ngrams") {
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("wng_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, g.pos, g.ngram FROM wng_docs " +
      "LATERAL VIEW graft_ngrams(text, 3) g AS pos, ngram")
      .collect().map(_.toString).sorted.toSeq
    val viaApi = api.TextPipeline.ngramRows(
        Tables.documents(spark, sf), "doc_id", "text", 3)
      .collect().map(_.toString).sorted.toSeq
    assert(viaSql == viaApi)
  }
}
