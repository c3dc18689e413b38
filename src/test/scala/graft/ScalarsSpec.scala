package graft

import graft.operators.{Scalars, Windows}
import graft.functions.Udfs

class ScalarsSpec extends SparkSpec {
  test("f8 udf: URL validator accepts only well-formed URLs") {
    assert(Udfs.isValidUrl("https://src0.example.com/d/42"))
    assert(Udfs.isValidUrl("http://a.b:8080/x?y=1"))
    assert(!Udfs.isValidUrl("not a url src3"))
    assert(!Udfs.isValidUrl("ftp://wrong.scheme/x"))
    assert(!Udfs.isValidUrl(null))
    val rows = Scalars.f8Udf(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Boolean]("valid") == (r.getAs[Long]("doc_id") % 3 == 0))
    }
  }

  test("cosine udf: self-similarity is 1.0, symmetry holds") {
    val v = Seq(0.6f, 0.8f)
    assert(math.abs(Udfs.cosine(v, v).get - 1.0) < 1e-12)
    assert(Udfs.cosine(v, Seq(0.8f, 0.6f)) == Udfs.cosine(Seq(0.8f, 0.6f), v))
    assert(Udfs.cosine(v, Seq(0.1f)).isEmpty)
    assert(Udfs.cosine(null, v).isEmpty)
  }

  test("f7 explode: word counts sum to total tokens") {
    val total = Scalars.f7Explode(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("cnt")).collect()(0).getLong(0)
    val direct = Tables.documents(spark, sf)
      .selectExpr("size(split(text, ' ')) AS n")
      .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    assert(total == direct)
  }

  test("w4 running sum: final row equals the user's total") {
    import org.apache.spark.sql.functions._
    val running = Windows.w4Running(spark, sf)
    val last = running.groupBy("user_id")
      .agg(max("running_value").as("final_run"))
    val direct = Tables.eventsUs(spark, sf).groupBy("user_id")
      .agg(Det.dsum(col("value")).as("total"))
    val joined = last.join(direct, "user_id").collect()
    joined.foreach { r =>
      assert(math.abs(r.getAs[Double]("final_run") - r.getAs[Double]("total")) < 1e-9)
    }
  }

  test("w11 ewma matches a driver-side recomputation over ordered streams") {
    val rows = graft.operators.Windows.w11Ewma(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))  // (event_id, user_id, ts, value, ewma)
    val byUser = rows.groupBy(_._2)
    byUser.values.foreach { evs =>
      val ordered = evs.sortBy(e => (e._3, e._1)).map(e => (e._4, e._5))
      ordered.indices.foreach { i =>
        val wts = graft.operators.Windows.EwmaWeights
        val terms = (0 until math.min(10, i + 1)).map(j =>
          ordered(i - j)._1 * wts(j))
        val den = (0 until math.min(10, i + 1)).map(j => wts(j)).sum
        val expect = BigDecimal(terms.sum / den)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(ordered(i)._2 - expect) < 1e-9,
          s"at index $i: got ${ordered(i)._2}, want $expect")
      }
    }
  }

  test("w6 top-k per group: at most 3 per customer, descending") {
    val byCust = Windows.w6TopKPerGroup(spark, sf).collect()
      .groupBy(_.getAs[Long]("o_custkey"))
    byCust.values.foreach { rows =>
      assert(rows.length <= 3)
      val prices = rows.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("o_totalprice"))
      assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    }
  }
}
