package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off: parity + speed of the native WordNGrams generator vs the
  * transform+posexplode chain (test scope, not shipped). */
object ProbeNGrams {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)

    def oldWay(n: Int): DataFrame = docs.select(col("doc_id"),
      posexplode(graft.api.TextPipeline.ngramsCol(col("text"), n))
        .as(Seq("pos", "ngram")))
    def newWay(n: Int): DataFrame = docs.select(col("doc_id"),
      functions.WordNGrams.ngrams(col("text"), n).as(Seq("pos", "ngram")))

    // parity (exact rows, incl. edge docs)
    val a = oldWay(3).collect().map(_.toString).sorted
    val b = newWay(3).collect().map(_.toString).sorted
    println(s"[probe] parity n=3: ${a.sameElements(b)} (${a.length} rows)")
    // distinct-parity vs array_distinct-before-explode (hash form)
    val oldD = graft.api.TextPipeline
      .shingleHashes(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val newD = docs.select(col("doc_id"),
        functions.WordNGrams.ngrams(col("text"), 3, distinct = true)
          .as(Seq("pos", "ngram")))
      .select(col("doc_id"), xxhash64(col("ngram")).as("ng_h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    println(s"[probe] distinct parity: ${oldD.sameElements(newD)} (${oldD.length} rows)")

    // edge cases: empty, single word, double spaces, exactly n words
    import spark.implicits._
    val edge = Seq("", "one", "a  b c", "x y z", "  ").toDF("text")
      .withColumn("doc_id", lit(0L))
    val ea = edge.select(posexplode(graft.api.TextPipeline.ngramsCol(col("text"), 3))
      .as(Seq("pos", "ngram"))).collect().map(_.toString).sorted
    val eb = edge.select(functions.WordNGrams.ngrams(col("text"), 3)
      .as(Seq("pos", "ngram"))).collect().map(_.toString).sorted
    println(s"[probe] edge parity: ${ea.sameElements(eb)} (${ea.toSeq} vs ${eb.toSeq})")

    // timing: count() over the generated rows, 5 reps each after warmup
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f; val dt = (System.nanoTime() - t0) / 1e9
      assert(n > 0); dt
    }
    (1 to 2).foreach { _ => oldWay(3).count(); newWay(3).count() }
    val told = (1 to 5).map(_ => time(oldWay(3).groupBy("ngram").count().count()))
    val tnew = (1 to 5).map(_ => time(newWay(3).groupBy("ngram").count().count()))
    println(f"[probe] old median ${told.sorted.apply(2)}%.3f s  new median ${tnew.sorted.apply(2)}%.3f s  speedup ${told.sorted.apply(2) / tnew.sorted.apply(2)}%.2fx")

    // plan: is the generate inside whole-stage codegen?
    println("[probe] plan:\n" + newWay(3).queryExecution.executedPlan.toString.take(800))
    spark.stop()
  }
}
