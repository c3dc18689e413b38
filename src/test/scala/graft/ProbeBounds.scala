package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement main (test scope, not shipped): empirical
  * hamming-distance / recall numbers at each SF to pick safe bounds for
  * the derived-claim oracles of x1/x8/x14. Run:
  *   sbt "Test/runMain graft.ProbeBounds"
  */
object ProbeBounds {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    Seq("0.001", "0.01", "0.1").foreach { sf =>
      val dir = s"/root/testdata/sf$sf"
      // x1: hamming distance on verified near-dup pairs
      val pairs = operators.Dedup.l2MinHashDedup(spark, dir)
      val sig = operators.Dedup.simHashSignatures(spark, dir)
      val ham = pairs
        .join(sig.select(col("doc_id").as("doc_a"), col("simhash").as("sa")), "doc_a")
        .join(sig.select(col("doc_id").as("doc_b"), col("simhash").as("sb")), "doc_b")
        .select(col("jaccard"), bit_count(col("sa").bitwiseXOR(col("sb"))).as("ham"))
      val hstats = ham.agg(max("ham"), avg("ham"), count(lit(1)), min("jaccard")).collect()(0)
      println(s"[probe] sf=$sf x1: n_pairs=${hstats.get(2)} maxHam=${hstats.get(0)} " +
        s"avgHam=${hstats.get(1)} minJac=${hstats.get(3)}")

      // x8 ivf + x14 lsh recall vs brute force
      val brute = operators.SimSearch.l3TopKCosine(spark, dir)
        .select(col("probe_id"), col("neighbor_id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      def recall(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
        val got = df.select(col("probe_id"), col("neighbor_id")).collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
        val rs = brute.keys.toSeq.map { p =>
          brute(p).intersect(got.getOrElse(p, Set.empty)).size.toDouble / brute(p).size
        }
        (rs.sum / rs.size, rs.min)
      }
      // sim-ratio claim: mean sim of returned top-5 / mean sim of exact
      // top-5, and the worst exact-rank of any returned neighbor
      val exact = operators.SimSearch.l3TopKCosine(spark, dir)
      val exactMean = exact.agg(avg("sim")).collect()(0).getDouble(0)
      val fullRank = api.VectorPipeline.topKCosine(
        Tables.embeddings(spark, dir),
        Tables.embeddings(spark, dir).filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 100000)
        .select(col("probe_id").as("rp"), col("neighbor_id").as("rn"),
          col("rank").as("xrank"))
      def simRatio(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
        val m = df.agg(avg("sim")).collect()(0).getDouble(0)
        val maxRank = df.join(fullRank,
            col("probe_id") === col("rp") && col("neighbor_id") === col("rn"))
          .agg(max("xrank")).collect()(0).getLong(0)
        println(s"[probe] sf=$sf $tag: simRatio=${m / exactMean} maxExactRank=$maxRank")
      }
      val ivf = operators.SimSearch.x8IvfAnnRaw(spark, dir)
      val (ivfMean, ivfMin) = recall(ivf)
      println(s"[probe] sf=$sf x8 ivf: meanRecall=$ivfMean minRecall=$ivfMin")
      simRatio(ivf, "x8_simratio")
      val emb = Tables.embeddings(spark, dir)
      val lsh = api.VectorPipeline.hyperplaneLshTopK(
        emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
      val (lshMean, lshMin) = recall(lsh)
      println(s"[probe] sf=$sf x14 lsh: meanRecall=$lshMean minRecall=$lshMin")
      simRatio(lsh, "x14_simratio")
      println(s"[probe] sf=$sf nvecs=" + Tables.embeddings(spark, dir).count())

      // a4 approx distinct relative error
      val a4 = operators.Aggs.a4ApproxDistinctRaw(spark, dir)
        .select(col("approx_users"), col("exact_users")).collect()
      val relErr = a4.map(r => math.abs(r.getLong(0) - r.getLong(1)).toDouble / r.getLong(1))
      println(s"[probe] sf=$sf a4 maxRelErr=${relErr.max}")

      // a15 approx percentile relative error
      val a15 = graft.operators.Aggs.a15ApproxPercentileRaw(spark, dir)
        .select(col("p50_approx"), col("p50_exact")).collect()
      val pErr = a15.map(r => math.abs(r.getDouble(0) - r.getDouble(1)) / r.getDouble(1))
      println(s"[probe] sf=$sf a15 maxRelErr=${pErr.max}")
    }
    spark.stop()
  }
}
