package graft

import org.apache.spark.sql.functions._
import graft.operators.{Clustering, CurationOps, Dml, GraphOps}

class Extras12Spec extends SparkSpec {
  import spark.implicits._

  test("sql43: every INSERT statement's claim is internally consistent " +
      "with the base table") {
    val r = Dml.sql43InsertDml(spark, sf).head()
    val n = Tables.nation(spark, sf).count()
    val nLow = Tables.nation(spark, sf)
      .filter(col("n_regionkey") < 2).count()
    val nIn = Tables.nation(spark, sf)
      .filter(col("n_regionkey").isin(0, 1)).count()
    assert(r.getAs[Long]("after_seed") == n)
    assert(r.getAs[Long]("after_values") == n + 2)
    assert(r.getAs[Long]("after_insert_select") == n + 2 + nLow)
    assert(r.getAs[Long]("after_overwrite") == nIn,
      "INSERT OVERWRITE must replace, not append")
    // the key-sum pins VALUES row contents (900 + 901) and the +1000
    // shift of the INSERT..SELECT rows
    val baseSum = Tables.nation(spark, sf)
      .agg(sum(col("n_nationkey").cast("long"))).head().getLong(0)
    val lowSum = Tables.nation(spark, sf)
      .filter(col("n_regionkey") < 2)
      .agg(sum((col("n_nationkey") + 1000).cast("long"))).head().getLong(0)
    assert(r.getAs[Long]("keysum_after_appends") ==
      baseSum + 900 + 901 + lowSum)
  }

  test("sql44: the CTAS table read back by catalog name equals the " +
      "direct aggregate, and survives the cleanup drop") {
    val got = Dml.sql44Ctas(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val direct = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("rev"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got == direct && got.nonEmpty)
    // the catalog is clean afterwards (finally-drop ran)
    assert(!spark.catalog.tableExists("graft_ctas_seg"))
  }

  test("x134: k-means recovers planted clusters exactly (k=2 on two " +
      "tight blobs), is deterministic, and the contract row lints clean") {
    // two planted blobs in 64-dim: members of blob g are unit vectors
    // concentrated on dimension g with a tiny per-member perturbation
    // on a far dimension — unambiguous geometry, exercises >1 round
    val vecs = (0 until 20).map { i =>
      val g = i % 2
      val arr = Array.fill(64)(0.0f)
      arr(g) = 1.0f
      arr(10 + g * 2 + (i % 3)) = 0.01f * (1 + i % 3)
      (i.toLong, arr.toSeq)
    }.toDF("vec_id", "embedding")
    val out = Clustering.kmeans(vecs, "vec_id", "embedding",
      k = 2, iters = 3).collect()
    assert(out.map(_.getLong(1)).sum == 20, "every vector assigned once")
    assert(out.length == 2 && out.map(_.getLong(1)).toSet == Set(10L),
      "both planted blobs recovered at 10 members each")
    // inertia is the tiny perturbation energy only — far below the
    // between-blob distance (2.0 per misassigned member)
    assert(out.map(_.getDouble(2)).forall(in => in >= 0 && in < 0.1),
      s"inertia must reflect tight clusters: ${out.mkString(",")}")
    // deterministic across runs
    val again = Clustering.kmeans(vecs, "vec_id", "embedding",
      k = 2, iters = 3).collect()
    assert(out.toSeq == again.toSeq)
    // contract row: plan-lint clean (no global window over the corpus)
    val df = Clustering.x134Kmeans(spark, sf)
    assert(graft.plans.PlanLint.lint(df).isEmpty)
  }

  test("x135: SSSP on a planted path graph walks the hop distances and " +
      "leaves unreachable nodes out") {
    // directed path u -> v -> w plus an isolated island x -> y
    val edges = Seq(("u", "v"), ("v", "w"), ("x", "y"))
      .toDF("a", "b")
    val got = GraphOps.sssp(edges, "u", 6).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("u" -> 0L, "v" -> 1L, "w" -> 2L),
      s"island must stay unreached: $got")
    // rounds bound respected: with rounds=1 node w is not yet reached
    val oneRound = GraphOps.sssp(edges, "u", 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(oneRound == Map("u" -> 0L, "v" -> 1L))
  }

  test("sql45 / GraftCatalog: DELETE + TRUNCATE SQL run against a " +
      "graft-managed DSv2 table and claims match direct recomputes") {
    val r = Dml.sql45RowLevelSql(spark, sf).head()
    val nation = Tables.nation(spark, sf)
    val n = nation.count()
    val survivors = nation.filter(col("n_regionkey") =!= 0)
      .filter(!(col("n_nationkey") > 15 && col("n_regionkey") =!= 3))
    assert(r.getAs[Long]("n_created") == n)
    assert(r.getAs[Long]("after_delete_eq") ==
      nation.filter(col("n_regionkey") =!= 0).count())
    assert(r.getAs[Long]("after_delete_compound") == survivors.count())
    assert(r.getAs[Long]("keysum_surviving") ==
      survivors.agg(sum(col("n_nationkey").cast("long")))
        .head().getLong(0))
    assert(r.getAs[Long]("after_truncate") == 0L)
    // INSERT OVERWRITE restated the table to exactly the region-2 slice
    val r2 = nation.filter(col("n_regionkey") === 2)
    assert(r.getAs[Long]("after_overwrite") == r2.count())
    assert(r.getAs[Long]("keysum_after_overwrite") ==
      r2.agg(sum((col("n_nationkey") + 100).cast("long")))
        .head().getLong(0))
    // UPDATE runs through the row-level operation support (round-9
    // second wave — the boundary narrowed to sub-table groups +
    // conflict detection)
    spark.sql("DROP TABLE IF EXISTS graft.upd_probe")
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
      .createOrReplaceTempView("upd_src")
    spark.sql("CREATE TABLE graft.upd_probe AS SELECT * FROM upd_src")
    spark.sql("UPDATE graft.upd_probe SET tag = 'z' WHERE id = 1")
    assert(spark.table("graft.upd_probe").orderBy("id").collect()
      .map(_.getString(1)).toSeq == Seq("z", "b"))
    spark.sql("DROP TABLE graft.upd_probe")
  }

  test("GraftCatalog: an emptied table keeps its pinned schema, a " +
      "computed-predicate DELETE takes the rewrite path correctly, " +
      "and catalog metadata is filesystem-visible") {
    // own catalog NAME: catalog instances cache per session at first
    // use, so a second catalog under the same name would keep the
    // first base dir — a behavior worth pinning here
    spark.conf.set("spark.sql.catalog.gspec",
      classOf[graft.sources.GraftCatalog].getName)
    val base = Tables.scratchDir("gcat_spec", sf)
    spark.conf.set("spark.sql.catalog.gspec.base", base)
    spark.sql("DROP TABLE IF EXISTS gspec.t_spec")
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "tag")
      .createOrReplaceTempView("gcat_src")
    spark.sql("CREATE TABLE gspec.t_spec AS SELECT * FROM gcat_src")
    // a computed-expression predicate cannot push as a v2 filter, so
    // it takes the ROW-LEVEL REWRITE path (ReplaceData) — and deletes
    // exactly the matching rows (id 2 here)
    spark.sql("DELETE FROM gspec.t_spec WHERE id % 2 = 0")
    assert(spark.table("gspec.t_spec").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L),
      "rewrite-path delete must remove exactly the matching rows")
    // translatable predicates use the group-grain metadata-delete path
    spark.sql("DELETE FROM gspec.t_spec WHERE tag = 'a'")
    assert(spark.table("gspec.t_spec").count() == 0)
    spark.sql("DROP TABLE gspec.t_spec")
    // rebuild for the schema-survival checks below
    spark.sql("CREATE TABLE gspec.t_spec AS SELECT * FROM gcat_src")
    // empty the table: schema survives via the pinned marker
    spark.sql("DELETE FROM gspec.t_spec WHERE id >= 0")
    assert(spark.table("gspec.t_spec").schema.fieldNames.toSeq ==
      Seq("id", "tag"))
    assert(spark.table("gspec.t_spec").count() == 0)
    // catalog metadata is the filesystem: the table dir + marker exist
    val d = new java.io.File(base, "t_spec")
    assert(d.isDirectory &&
      new java.io.File(d, "_graft_schema.json").isFile)
    spark.sql("DROP TABLE gspec.t_spec")
    assert(!d.exists(), "DROP TABLE must remove the directory")
  }

  test("LatticeDot: codegen equals the driver-side lattice fold on real " +
      "vectors, half-away rounding pinned on planted halves and negatives") {
    def halfUp(y: Double): Long =
      (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong
    val vecs = Tables.embeddings(spark, sf).limit(20).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Float](1).toArray))
    val cent = vecs(3)._2.map(_.toDouble)
    val got = vecs.toSeq.map { case (id, v) => (id, v) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        graft.functions.LatticeDot.dot(col("embedding"), cent, 1e12)
          .as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.foreach { case (id, v) =>
      val ref = v.indices.map(i =>
        halfUp(v(i).toDouble * cent(i) * 1e12)).sum
      assert(got(id) == ref, s"vec $id")
    }
    // exact dyadic half: x*c*scale = 2.5 and -2.5 must round AWAY from
    // zero (the BigDecimal HALF_UP agreement the policy doc claims)
    val tiny = Seq((1L, Array(2.5f)), (2L, Array(-2.5f)))
      .toDF("id", "v")
      .select(col("id"),
        graft.functions.LatticeDot.dot(col("v"), Array(1.0), 1.0).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tiny == Map(1L -> 3L, 2L -> (-3L)))
  }

  test("x136: k-core peel on a planted graph keeps exactly the dense " +
      "kernel and reports convergence honestly") {
    // triangle {1,2,3} + a chain 3-4-5 hanging off it: the 2-core is
    // the triangle (chain peels in two rounds), the 3-core is empty
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val two = GraphOps.kCore(edges, k = 2, rounds = 4).head()
    assert(two.getAs[Long]("n_nodes") == 3 &&
      two.getAs[Long]("n_edges") == 3 &&
      two.getAs[Long]("min_deg") == 2 &&
      two.getAs[Boolean]("converged"))
    val three = GraphOps.kCore(edges, k = 3, rounds = 4).head()
    assert(three.getAs[Long]("n_nodes") == 0 &&
      three.getAs[Long]("n_edges") == 0 &&
      three.getAs[Boolean]("converged"))
    // too few rounds: the verdict says so instead of lying
    // (chain needs 2 peel rounds; 1 round leaves node 4 at degree 1)
    val short = GraphOps.kCore(edges, k = 2, rounds = 1).head()
    assert(!short.getAs[Boolean]("converged"))
  }

  test("GraftCatalog delete is GROUP-GRAIN: files without matching " +
      "rows survive the rewrite untouched (same name, size, inode data)") {
    spark.conf.set("spark.sql.catalog.ggrain",
      classOf[graft.sources.GraftCatalog].getName)
    val base = Tables.scratchDir("gcat_grain", sf)
    spark.conf.set("spark.sql.catalog.ggrain.base", base)
    spark.sql("DROP TABLE IF EXISTS ggrain.t")
    // range-partitioned input -> multiple part files with disjoint id
    // ranges, so a low-id delete can only touch the low file(s)
    (1L to 10L).toDF("id")
      .repartitionByRange(2, col("id"))
      .createOrReplaceTempView("grain_src")
    spark.sql("CREATE TABLE ggrain.t AS SELECT * FROM grain_src")
    def files(): Map[String, Long] =
      Option(new java.io.File(base, "t").listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("part-"))
        .map(f => f.getName -> f.length()).toMap
    val before = files()
    assert(before.size >= 2, s"need >= 2 part files, got $before")
    // which file holds id = 10? that one must survive the delete as-is
    val highFile = spark.table("ggrain.t")
      .filter(col("id") === 10L)
      .select(input_file_name()).head().getString(0)
    spark.sql("DELETE FROM ggrain.t WHERE id <= 3")
    val after = files()
    val highName = new java.io.File(new java.net.URI(highFile)).getName
    assert(after.contains(highName) &&
      after(highName) == before(highName),
      s"untouched file must survive byte-identical: $before -> $after")
    assert(spark.table("ggrain.t").collect().map(_.getLong(0)).sorted
      .sameElements(4L to 10L))
    // no-match delete: the WHOLE file set survives (no swap at all)
    val preNoop = files()
    spark.sql("DELETE FROM ggrain.t WHERE id > 999")
    assert(files() == preNoop, "no-match delete must not rewrite")
    spark.sql("DROP TABLE ggrain.t")
  }

  test("GraftCatalog UPDATE/MERGE are GROUP-GRAIN: a statement whose " +
      "condition touches one file leaves every other file untouched " +
      "(same name, size, mtime — round-10, VERDICT r9 #1)") {
    spark.conf.set("spark.sql.catalog.ugrain",
      classOf[graft.sources.GraftCatalog].getName)
    val base = Tables.scratchDir("gcat_ugrain", sf)
    spark.conf.set("spark.sql.catalog.ugrain.base", base)
    spark.sql("DROP TABLE IF EXISTS ugrain.t")
    (1L to 10L).map(i => (i, "keep")).toDF("id", "tag")
      .repartitionByRange(2, col("id"))
      .createOrReplaceTempView("ugrain_src")
    spark.sql("CREATE TABLE ugrain.t AS SELECT * FROM ugrain_src")
    def files(): Map[String, (Long, Long)] =
      Option(new java.io.File(base, "t").listFiles())
        .getOrElse(Array.empty)
        .filter(_.getName.startsWith("part-"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    val before = files()
    assert(before.size >= 2, s"need >= 2 part files, got $before")
    val highFile = new java.io.File(new java.net.URI(
      spark.table("ugrain.t").filter(col("id") === 10L)
        .select(input_file_name()).head().getString(0))).getName
    // UPDATE with a translatable condition: only the low file rewrites
    spark.sql("UPDATE ugrain.t SET tag = 'upd' WHERE id <= 2")
    val afterUpd = files()
    assert(afterUpd.contains(highFile) &&
      afterUpd(highFile) == before(highFile),
      s"UPDATE must not rewrite the untouched file: $before -> $afterUpd")
    assert(spark.table("ugrain.t").filter(col("tag") === "upd")
      .collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 2L)))
    assert(spark.table("ugrain.t").count() == 10L,
      "unmatched rows of the affected file must pass through")
    // no-match UPDATE: zero files rewrite
    val preNoop = files()
    spark.sql("UPDATE ugrain.t SET tag = 'x' WHERE id > 999")
    assert(files() == preNoop, "no-match UPDATE must not rewrite")
    assert(spark.table("ugrain.t").filter(col("tag") === "x").count() == 0)
    // MERGE with a target-only conjunct in ON: group prunes to the
    // low file; the high file survives byte-identical
    Seq((2L, "merged"), (3L, "merged")).toDF("id", "newtag")
      .createOrReplaceTempView("ugrain_updates")
    val preMerge = files()
    spark.sql("""MERGE INTO ugrain.t t USING ugrain_updates s
      ON t.id = s.id AND t.id <= 3
      WHEN MATCHED THEN UPDATE SET t.tag = s.newtag""")
    val afterMerge = files()
    assert(afterMerge.contains(highFile) &&
      afterMerge(highFile) == preMerge(highFile),
      s"MERGE must not rewrite the untouched file: $preMerge -> $afterMerge")
    assert(spark.table("ugrain.t").filter(col("tag") === "merged")
      .collect().map(_.getLong(0)).sorted.sameElements(Array(2L, 3L)))
    assert(spark.table("ugrain.t").count() == 10L)
    spark.sql("DROP TABLE ugrain.t")
  }

  test("GraftCatalog MERGE runtime group filter: a MERGE whose ON " +
      "clause carries ONLY source keys prunes its group at runtime " +
      "(SupportsRuntimeV2Filtering over _file) — the untouched file " +
      "survives byte-identical, and a no-match MERGE keeps its " +
      "NOT MATCHED inserts (round-11, VERDICT r10 #2)") {
    spark.conf.set("spark.sql.catalog.rtgrain",
      classOf[graft.sources.GraftCatalog].getName)
    val base = Tables.scratchDir("gcat_rtgrain", sf)
    spark.conf.set("spark.sql.catalog.rtgrain.base", base)
    spark.sql("DROP TABLE IF EXISTS rtgrain.t")
    (1L to 10L).map(i => (i, "keep")).toDF("id", "tag")
      .repartitionByRange(2, col("id"))
      .createOrReplaceTempView("rtgrain_src")
    spark.sql("CREATE TABLE rtgrain.t AS SELECT * FROM rtgrain_src")
    def files(): Map[String, (Long, Long)] =
      Option(new java.io.File(base, "t").listFiles())
        .getOrElse(Array.empty)
        .filter(_.getName.startsWith("part-"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    val before = files()
    assert(before.size >= 2, s"need >= 2 part files, got $before")
    val highFile = new java.io.File(new java.net.URI(
      spark.table("rtgrain.t").filter(col("id") === 10L)
        .select(input_file_name()).head().getString(0))).getName
    // ON t.id = s.id has NO target-only conjunct: static pushdown has
    // nothing to prune on, so ONLY the runtime (join-driven) group
    // filter can keep the high file out of the rewrite group — if it
    // does not fire, the whole-table fallback rewrites both files and
    // the identity assert below fails
    Seq((1L, "merged"), (2L, "merged")).toDF("id", "newtag")
      .createOrReplaceTempView("rtgrain_updates")
    spark.sql("""MERGE INTO rtgrain.t t USING rtgrain_updates s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET t.tag = s.newtag
      WHEN NOT MATCHED THEN INSERT (id, tag) VALUES (s.id, s.newtag)""")
    val afterMerge = files()
    assert(afterMerge.contains(highFile) &&
      afterMerge(highFile) == before(highFile),
      "a source-keyed MERGE must runtime-prune to the matching file: " +
        s"$before -> $afterMerge")
    assert(spark.table("rtgrain.t").filter(col("tag") === "merged")
      .collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 2L)))
    assert(spark.table("rtgrain.t").count() == 10L,
      "unmatched rows of the affected file must pass through")
    // no key matches any target row: the group prunes to ZERO files,
    // old files all survive byte-identical, and the NOT MATCHED
    // inserts still land (the r10 no-op cleanup deleted every new
    // file and would have dropped them)
    val preInsert = files()
    Seq((97L, "ins"), (98L, "ins")).toDF("id", "newtag")
      .createOrReplaceTempView("rtgrain_inserts")
    spark.sql("""MERGE INTO rtgrain.t t USING rtgrain_inserts s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET t.tag = s.newtag
      WHEN NOT MATCHED THEN INSERT (id, tag) VALUES (s.id, s.newtag)""")
    val afterInsert = files()
    preInsert.foreach { case (name, sig) =>
      assert(afterInsert.get(name).contains(sig),
        s"insert-only MERGE must leave $name untouched: " +
          s"$preInsert -> $afterInsert")
    }
    assert(spark.table("rtgrain.t").count() == 12L,
      "NOT MATCHED inserts of a zero-group MERGE must survive commit")
    assert(spark.table("rtgrain.t").filter(col("tag") === "ins")
      .collect().map(_.getLong(0)).sorted.sameElements(Array(97L, 98L)))
    spark.sql("DROP TABLE rtgrain.t")
  }

  test("GraftCatalog MERGE with WHEN NOT MATCHED BY SOURCE stays " +
      "WHOLE-TABLE sound: rows outside the source-matched files still " +
      "take the BY SOURCE action (the runtime group filter must not " +
      "fire for this shape)") {
    spark.conf.set("spark.sql.catalog.nmbs",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.nmbs.base",
      Tables.scratchDir("gcat_nmbs", sf))
    spark.sql("DROP TABLE IF EXISTS nmbs.t")
    (1L to 10L).map(i => (i, "keep")).toDF("id", "tag")
      .repartitionByRange(2, col("id"))
      .createOrReplaceTempView("nmbs_src")
    spark.sql("CREATE TABLE nmbs.t AS SELECT * FROM nmbs_src")
    Seq((1L, "m")).toDF("id", "newtag")
      .createOrReplaceTempView("nmbs_upd")
    // rows 2-10 are NOT MATCHED BY SOURCE and must ALL flip to
    // 'stale' — including every row of the file the source keys never
    // touch. A runtime group filter wrongly pruning to the id=1 file
    // would leave the high file's rows at 'keep' (data loss); Spark
    // only plans the group-filter subquery for shapes where pruning
    // is sound, and this pins that boundary against regressions.
    spark.sql("""MERGE INTO nmbs.t t USING nmbs_upd s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET t.tag = s.newtag
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.tag = 'stale'""")
    val out = spark.table("nmbs.t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "m", s"matched row must update: $out")
    (2L to 10L).foreach(i =>
      assert(out(i) == "stale", s"row $i must take the BY SOURCE arm"))
    // and the BY SOURCE delete arm: everything unmatched vanishes
    spark.sql("""MERGE INTO nmbs.t t USING nmbs_upd s ON t.id = s.id
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(spark.table("nmbs.t").collect().map(_.getLong(0)).toSeq ==
      Seq(1L), "BY SOURCE DELETE must remove every unmatched row")
    spark.sql("DROP TABLE nmbs.t")
  }

  test("checkpoints seam: the three modes cut lineage to a scan and " +
      "serve identical results") {
    val base = Tables.nation(spark, sf)
      .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"))
    val expect = base.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    for (mode <- Seq("local", "reliable", "table")) {
      spark.conf.set("spark.graft.checkpoint.mode", mode)
      try {
        val cut = Checkpoints.cut(base)
        val got = cut.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        assert(got == expect, s"mode $mode must not change results")
        // the cut frame's plan is a materialized scan, not live lineage
        val plan = cut.queryExecution.optimizedPlan.toString
        assert(!plan.contains("Aggregate"),
          s"mode $mode must cut lineage:\n$plan")
      } finally spark.conf.unset("spark.graft.checkpoint.mode")
    }
  }

  test("x137: synchronous LPA on two bridged cliques converges to one " +
      "min-id community per clique, deterministically") {
    // two 4-cliques {1..4} and {5..8} joined by the bridge 4-5; the
    // hand-traced synchronous min-tie trajectory stabilizes by round 3
    def clique(ns: Seq[Long]) =
      for (i <- ns; j <- ns if i < j) yield (i, j)
    val edges = (clique(1L to 4L) ++ clique(5L to 8L) :+ (4L, 5L))
      .toDF("a", "b")
    val labels = GraphOps.labelPropagation(edges, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).forall(labels(_) == 1L) &&
      (5L to 8L).forall(labels(_) == 5L), s"got $labels")
    // determinism: a second run walks the identical trajectory
    val again = GraphOps.labelPropagation(edges, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == labels)
    // the tie rule is MIN label: a single triangle all-ties down to 1
    val tri = GraphOps.labelPropagation(
      Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b"), rounds = 3)
      .collect().map(r => r.getLong(1)).toSet
    assert(tri == Set(1L))
  }

  test("x138: the prefix-max skyline equals the brute NOT-dominated set " +
      "on planted and random points, keeping all equal-point ties") {
    // planted: id2 dominated same-x, id4 dominated cross-x, ids 3 and 6
    // share a non-dominated point (both must ship)
    val planted = Seq((1L, 3L, 10L), (2L, 3L, 9L), (3L, 5L, 7L),
      (4L, 4L, 7L), (5L, 2L, 12L), (6L, 5L, 7L)).toDF("id", "x", "y")
    val got = graft.operators.AuditOps.paretoFrontier(planted, "x", "y")
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L, 5L, 6L), s"got $got")
    // random: seeded points vs the quadratic definition, in-memory
    val rnd = new scala.util.Random(42)
    val pts = (1L to 120L).map(i =>
      (i, rnd.nextInt(12).toLong, rnd.nextInt(40).toLong))
    val brute = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y)
      }
    }.map(_._1).toSet
    val fast = graft.operators.AuditOps.paretoFrontier(
        pts.toDF("id", "x", "y"), "x", "y")
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(fast == brute, s"fast $fast vs brute $brute")
  }

  test("x139: delta-join IVM drops zero-retracted groups, restates " +
      "updated prices, and lets delete win on update+delete overlap") {
    // nation 1: its only order is key 11 (deleted)   -> group drops
    // nation 2: key 7 (updated +50) + key 3 (silent) -> n=2, t=260
    // nation 3: its only order is key 77 (update AND delete) -> drops
    val facts = Seq((11L, 10L, "100.0000"), (7L, 20L, "200.0000"),
      (3L, 21L, "10.0000"), (77L, 22L, "50.0000"))
      .toDF("o_orderkey", "o_custkey", "p")
      .select(col("o_orderkey"), col("o_custkey"),
        col("p").cast(Det.Money).as("price"))
    val dim = Seq((10L, 1), (20L, 2), (21L, 2), (22L, 3))
      .toDF("c_custkey", "c_nationkey")
    val mv = graft.operators.WarehouseOps.maintainJoinAggMv(facts, dim).collect()
      .map(r => r.getInt(0) -> (r.getLong(1),
        r.getDecimal(2).doubleValue)).toMap
    assert(mv == Map(2 -> (2L, 260.0)), s"got $mv")
  }

  test("x172: SemDeDup equals the brute cluster-then-pair recompute, " +
      "and a planted cross-cluster near-dup is excluded BY SCOPE " +
      "(grouped machinery) while the ungrouped machinery finds it") {
    // --- scope boundary on a hand-built frame: near-identical vectors
    // straddling groups are not a pair for the grouped machinery
    val v = Array.tabulate(4)(i => 0.5f)
    val vTweak = Array(0.5f, 0.5f, 0.5f, 0.49f) // cosine ~ 0.99995
    val far = Array(0.9f, -0.3f, 0.1f, -0.2f)
    def frame(gA: Long, gB: Long) =
      Seq((1L, v.toSeq, gA), (2L, vTweak.toSeq, gB),
        (3L, far.toSeq, gA)).toDF("id", "vec", "g")
    val straddle = graft.api.VectorPipeline.groupedCosinePairs(
      frame(0L, 1L), "id", "vec", "g", 0.8, numBands = 2, dims = 4)
    assert(straddle.count() == 0L,
      "cross-group near-dups are out of scope by contract")
    val together = graft.api.VectorPipeline.groupedCosinePairs(
      frame(0L, 0L), "id", "vec", "g", 0.8, numBands = 2, dims = 4)
    assert(together.collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    val ungrouped = graft.api.VectorPipeline.bandedCosinePairs(
      frame(0L, 1L).select(col("id"), col("vec")), "id", "vec", 0.8,
      numBands = 2, dims = 4)
    assert(ungrouped.count() == 1L,
      "the same straddling pair IS found without the cluster bound")

    // --- corpus binding: the staged x172 output equals an independent
    // driver-side recompute (assignments from the shared trainer,
    // exhaustive within-cluster cosine)
    val out = CurationOps.x172SemDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val corpus = graft.operators.EmbedOps.cloneCorpus(spark, sf)
    val vecs = corpus.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val asg = Clustering.kmeansAssignments(
        corpus, "vec_id", "embedding", 8, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == vecs.keySet)
    out.foreach { case (id, (cl, _)) =>
      assert(cl == asg(id), s"cluster mismatch for $id")
    }
    val ids = vecs.keySet.toSeq.sorted
    val droppedBrute = (for {
      b <- ids; a <- ids if a < b && asg(a) == asg(b)
      dot = vecs(a).zip(vecs(b)).map { case (x, y) => x * y }.sum
      if BigDecimal(dot).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble >= 0.8
    } yield b).toSet
    out.foreach { case (id, (_, kept)) =>
      assert(kept == !droppedBrute(id), s"keep verdict mismatch for $id")
    }
    assert(droppedBrute.nonEmpty, "row must be non-vacuous at this sf")
  }
}
