package graft

import org.apache.spark.sql.functions._
import graft.functions.{DotProduct, Udfs}

class DotProductSpec extends SparkSpec {
  private lazy val vecs: Seq[(Long, List[Float])] =
    Tables.embeddings(spark, sf).limit(20).collect().toIndexedSeq
      .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Float](1).toList))

  test("codegen dot product equals sequential-fold reference on real vectors") {
    import spark.implicits._
    val df = vecs.toDF("vec_id", "embedding")
    val got = df.crossJoin(df.select(col("vec_id").as("id2"), col("embedding").as("e2")))
      .select(col("vec_id"), col("id2"),
        DotProduct.dot(col("embedding"), col("e2")).as("d"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val byId = vecs.toMap
    got.foreach { case ((a, b), d) =>
      var s = 0.0
      val (x, y) = (byId(a), byId(b))
      (0 until 64).foreach(i => s += x(i).toDouble * y(i).toDouble)
      assert(d == s, s"pair ($a,$b)") // bit-exact: same order, same widening
    }
  }

  test("unit vectors: dot ≈ cosine udf") {
    import spark.implicits._
    val (a, b) = (vecs(0)._2, vecs(1)._2)
    val viaUdf = Udfs.cosine(a, b).get
    val viaExpr = Seq((a, b)).toDF("a", "b")
      .select(DotProduct.dot(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(math.abs(viaUdf - viaExpr) < 1e-9) // unit-norm ⇒ cosine ≈ dot
  }
}
