package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphOps

class Extras13Spec extends SparkSpec {
  import spark.implicits._

  /** The x140 rounding policy in plain Scala: HALF_UP to n dp. */
  private def r(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("x140 hits: planted directed graph matches a hand-rolled " +
      "reference walking the identical rounding trajectory") {
    // s1 links both customers, s2 only c101 — s1 must out-hub s2 and
    // c101 must out-auth c102
    val e = Seq((1L, 101L), (1L, 102L), (2L, 101L)).toDF("s", "c")
    val got = GraphOps.hits(e, 3).collect()
      .map(row => (row.getString(0), row.getLong(1)) -> row.getDouble(2))
      .toMap
    // reference: exact BigDecimal sums of 10dp-rounded contributions
    var hub = Map(1L -> 1.0, 2L -> 1.0)
    var auth = Map.empty[Long, Double]
    val edges = Seq((1L, 101L), (1L, 102L), (2L, 101L))
    def step(src: Map[Long, Double], out: Boolean): Map[Long, Double] = {
      val raw = edges.groupBy(t => if (out) t._2 else t._1)
        .collect { case (k, es) =>
          val contribs = es.flatMap(t =>
            src.get(if (out) t._1 else t._2).map(v => BigDecimal(r(v, 10))))
          k -> contribs.sum.toDouble
        }.toMap
      val l1 = raw.values.map(v => BigDecimal(r(v, 10))).sum.toDouble
      raw.map { case (k, v) => k -> r(v / l1, 10) }
    }
    for (_ <- 1 to 3) {
      auth = step(hub, out = true)
      hub = step(auth, out = false)
    }
    hub.foreach { case (n, v) => assert(got(("hub", n)) == v) }
    auth.foreach { case (n, v) => assert(got(("auth", n)) == v) }
    assert(got(("hub", 1L)) > got(("hub", 2L)))
    assert(got(("auth", 101L)) > got(("auth", 102L)))
  }

  test("x141 modularity: two planted triangles under their own labels " +
      "score exactly Q = 0.5") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L)).toDF("a", "b")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L)).toDF("node", "lbl")
    val rows = GraphOps.modularity(edges, labels).collect()
    val global = rows.find(_.getLong(0) == -1L).get
    assert(global.getLong(1) == 6L)       // nodes
    assert(global.getLong(2) == 6L)       // intra edges (all)
    assert(global.getLong(3) == 12L)      // degree mass = 2m
    assert(global.getDouble(4) == 0.5)    // Q exact
    val comms = rows.filter(_.getLong(0) != -1L)
    assert(comms.length == 2 &&
      comms.forall(c => c.getLong(1) == 3L && c.getLong(2) == 3L &&
        c.getLong(3) == 6L && c.getDouble(4) == 0.25))
  }

  test("x141 modularity: a community split across a bridge scores " +
      "below the clean partition") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
      (4L, 6L), (5L, 6L)).toDF("a", "b")
    val clean = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L)).toDF("node", "lbl")
    val merged = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L),
      (6L, 1L)).toDF("node", "lbl")
    def q(l: org.apache.spark.sql.DataFrame) =
      GraphOps.modularity(edges, l).filter(col("community") === -1L)
        .head().getDouble(4)
    assert(q(clean) > q(merged),
      "one giant community must score below the 2-community partition")
  }

  test("x142 assoc rules: every emitted ratio recomputes from its own " +
      "count columns, both rule directions appear, ordering is by lift") {
    val rows = graft.operators.BasketOps.x142AssocRules(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val (nb, na, nc) = (row.getLong(2), row.getLong(3), row.getLong(4))
      assert(nb >= 3 && na >= nb && nc >= nb)
      assert(row.getDouble(5) == r(nb.toDouble / na, 6))
    }
    val lifts = rows.map(_.getDouble(6)).toSeq
    assert(lifts == lifts.sorted(Ordering[Double].reverse))
  }

  test("x143 markov: probabilities are exact row shares and each " +
      "from-state's transitions sum to its outgoing total") {
    val rows = graft.operators.BasketOps.x143Markov(spark, sf).collect()
    val byFrom = rows.groupBy(_.getString(0))
    byFrom.foreach { case (_, rs) =>
      val total = rs.map(_.getLong(2)).sum
      rs.foreach(row =>
        assert(row.getDouble(3) == r(row.getLong(2).toDouble / total, 6)))
    }
    // total transitions = events minus one per user (last has no next)
    val ev = Tables.eventsUs(spark, sf)
    val expected = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(2)).sum == expected)
  }

  test("x144 item-cf: sim recomputes as n_both / sqrt(n_a*n_b), pairs " +
      "are canonical, ordering is by sim") {
    val rows = graft.operators.BasketOps.x144ItemCf(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      assert(row.getLong(0) < row.getLong(1))
      val sim = r(row.getLong(2).toDouble /
        math.sqrt((row.getLong(3) * row.getLong(4)).toDouble), 6)
      assert(row.getDouble(5) == sim && sim <= 1.0)
    }
    val sims = rows.map(_.getDouble(5)).toSeq
    assert(sims == sims.sorted(Ordering[Double].reverse))
  }

  test("x145 profile drift: the n_rows metric row splits the table " +
      "exactly and rel_drift recomputes from its own columns") {
    val rows = graft.operators.AuditOps.x145ProfileDrift(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("avg_totalprice", "n_distinct_cust", "n_distinct_priority",
        "n_rows", "share_status_F"))
    val nr = rows.find(_.getString(0) == "n_rows").get
    assert(nr.getDouble(1) + nr.getDouble(2) ==
      Tables.orders(spark, sf).count().toDouble)
    rows.foreach { row =>
      assert(row.getDouble(3) ==
        r(math.abs(row.getDouble(2) - row.getDouble(1)) / row.getDouble(1), 6))
    }
  }
}
