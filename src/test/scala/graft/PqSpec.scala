package graft

import org.apache.spark.sql.functions._
import graft.api.VectorPipeline

class PqSpec extends SparkSpec {
  import spark.implicits._

  private def vec(seed: Int, dims: Int = 64): Seq[Float] = {
    val r = new scala.util.Random(seed)
    val raw = Seq.fill(dims)(r.nextDouble() * 2 - 1)
    val norm = math.sqrt(raw.map(x => x * x).sum)
    raw.map(x => (x / norm).toFloat)
  }

  test("pq codes: one row per (vid, sub), codes within [0, numCodes)") {
    val df = (0 until 40).map(i => (i.toLong, vec(i))).toDF("id", "v")
    val m = VectorPipeline.pqTrain(df, "id", "v",
      numSub = 8, numCodes = 16, iters = 2)
    val codes = m.codes.collect()
    assert(codes.length == 40 * 8)
    assert(codes.forall(r => r.getInt(2) >= 0 && r.getInt(2) < 16))
    assert(m.codebooks.count() == 8L * 16)
    // every codebook centroid has the subspace width
    assert(m.codebooks.select(max(size(col("cv"))), min(size(col("cv"))))
      .head match { case r => r.getInt(0) == 8 && r.getInt(1) == 8 })
  }

  test("pq training and search are run-to-run deterministic") {
    val df = (0 until 60).map(i => (i.toLong, vec(1000 + i))).toDF("id", "v")
    val probes = df.filter(col("id") < 3)
    def run(): Seq[(Long, Long, Double)] = {
      val m = VectorPipeline.pqTrain(df, "id", "v",
        numSub = 8, numCodes = 16, iters = 3)
      VectorPipeline.pqAdcTopK(m, probes, "id", "v", k = 4)
        .orderBy("probe_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    }
    val a = run()
    val b = run()
    assert(a == b && a.nonEmpty)
  }

  test("pq retrieves a planted exact clone as the top neighbor") {
    // clone of probe 0 at id 500: identical vectors share codes in every
    // subspace, so the ADC score of the clone equals the probe's own
    // quantized self-similarity — the maximum any candidate can reach.
    val base = (0 until 50).map(i => (i.toLong, vec(77 + i)))
    val df = (base :+ (500L, vec(77))).toDF("id", "v")
    val top = VectorPipeline.pqAdcTopK(
      VectorPipeline.pqTrain(df, "id", "v",
        numSub = 16, numCodes = 16, iters = 3),
      df.filter(col("id") === 0), "id", "v", k = 3)
      .orderBy("rank").collect()
    assert(top.head.getLong(1) == 500L,
      top.map(r => (r.getLong(1), r.getDouble(2))).mkString(", "))
  }

  test("pq: ADC top-k plans through the bounded-heap GroupTopKExec") {
    val df = (0 until 30).map(i => (i.toLong, vec(300 + i))).toDF("id", "v")
    val top = VectorPipeline.pqAdcTopK(
      VectorPipeline.pqTrain(df, "id", "v",
        numSub = 8, numCodes = 8, iters = 1),
      df.filter(col("id") < 2), "id", "v", k = 3)
    val plans = flattenPlan(top.queryExecution.executedPlan)
    assert(plans.exists(_.isInstanceOf[graft.plans.GroupTopKExec]),
      "per-probe top-k must be the bounded-heap custom operator")
  }

  test("pq model persists and reloads value-identical; a fresh session " +
      "serves the same results from the reloaded model") {
    val df = (0 until 50).map(i => (i.toLong, vec(7000 + i))).toDF("id", "v")
    val trained = VectorPipeline.pqTrain(df, "id", "v",
      numSub = 8, numCodes = 16, iters = 2)
    val dir = Tables.scratchDir("pqspec_model", sf)
    VectorPipeline.savePqModel(trained, dir)
    // value-identical codebooks after the parquet round-trip (floats
    // and ints are exact in parquet — any drift would shift serving)
    def books(m: VectorPipeline.PqModel): Map[(Int, Int), Seq[Float]] =
      m.codebooks.collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2)).toMap
    val fresh = spark.newSession()
    Tables.tune(fresh)
    val loaded = VectorPipeline.loadPqModel(fresh, dir)
    assert(loaded.numSub == 8 && loaded.numCodes == 16 && loaded.dims == 64)
    assert(books(loaded) == books(trained))
    assert(loaded.codes.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getInt(2))).toSet ==
      trained.codes.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getInt(2))).toSet)
    // the fresh session SERVES from the reloaded model: same top-k as
    // the training session computes from the in-memory model
    val probes = df.filter(col("id") < 3)
    def serve(m: VectorPipeline.PqModel,
        p: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
      VectorPipeline.pqAdcTopK(m, p, "id", "v", k = 4)
        .orderBy("probe_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val freshProbes = {
      import fresh.implicits._
      (0 until 3).map(i => (i.toLong, vec(7000 + i))).toDF("id", "v")
    }
    assert(serve(loaded, freshProbes) == serve(trained, probes))
  }

  test("pq trains when numCodes exceeds the corpus (empty clusters keep seeds)") {
    val df = (0 until 5).map(i => (i.toLong, vec(7 + i))).toDF("id", "v")
    val m = VectorPipeline.pqTrain(df, "id", "v",
      numSub = 4, numCodes = 16, iters = 2, dims = 64)
    // seeds only exist for the 5 sub-vectors per subspace; the rest of
    // the codebook never materializes, which is fine — assignment only
    // needs the codes that exist
    assert(m.codes.count() == 5L * 4)
    val top = VectorPipeline.pqAdcTopK(m, df.filter(col("id") === 0),
      "id", "v", k = 2)
    assert(top.count() == 2)
  }
}
