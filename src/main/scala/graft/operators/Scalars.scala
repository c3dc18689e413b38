package graft.operators

import org.apache.arrow.vector.{BigIntVector, Float8Vector, VarCharVector}
import org.apache.spark.sql.{DataFrame, GraftArrow, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import graft.{Det, Tables}

/** Scalar function families — SURVEY §2.7 (F1–F8). One composite query
  * per family; every function stays inside whole-stage codegen (built-in
  * expressions only — the UDF family F8 is deliberately separate).
  * Cross-dialect hazards (1-based indexing, dayofweek numbering, libm
  * ulp drift) are normalized per SURVEY §7.3.
  */
object Scalars {

  /** F1 — string family on part names. */
  def f1String(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        length(col("p_name")).cast("long").as("len"),
        substring(col("p_name"), 1, 4).as("sub4"),
        concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        regexp_extract(col("p_brand"), "#([0-9]+)", 1).as("brand_num"),
        instr(col("p_type"), "A").cast("long").as("a_pos"),
        trim(concat(lit("  "), col("p_type"), lit("  "))).as("trimmed"))
      .orderBy(col("p_partkey"))

  /** F2 — date/time family on order dates. dayofweek is emitted 0=Sunday
    * (Spark's 1-based Sunday normalized down; DuckDB is 0-based). */
  def f2Date(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        date_trunc("month", col("o_orderdate")).cast("date").cast("string")
          .as("month_start"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since_95"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        last_day(col("o_orderdate")).cast("string").as("month_end"),
        (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow0"))
      .orderBy(col("o_orderkey"))

  /** F3 — math family. Transcendentals (ln/log10/exp/pow) are rounded to
    * 6 dp: JVM and C++ libm agree to well under 1e-9 relative, but are
    * not bit-identical — SURVEY §7.3#3. sqrt is IEEE-exact, left raw. */
  def f3Math(spark: SparkSession, sfDir: String): DataFrame =
    Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"),
        abs(negate(col("s_acctbal"))).as("abs_bal"),
        ceil(col("s_acctbal")).cast("long").as("ceil_bal"),
        floor(col("s_acctbal")).cast("long").as("floor_bal"),
        sqrt(abs(col("s_acctbal"))).as("sqrt_bal"),
        round(log(abs(col("s_acctbal")) + 1.0), 6).as("ln_bal"),
        round(log10(abs(col("s_acctbal")) + 1.0), 6).as("log10_bal"),
        round(exp(col("s_acctbal") / 10000.0), 6).as("exp_small"),
        (col("s_acctbal") * col("s_acctbal")).as("bal_sq"),
        pmod(col("s_suppkey"), lit(7L)).as("mod7"),
        signum(col("s_acctbal")).as("sign_bal"),
        greatest(col("s_acctbal"), lit(0.0)).as("pos_part"),
        least(col("s_acctbal"), lit(0.0)).as("neg_part"))
      .orderBy(col("s_suppkey"))

  /** F4 — array family + higher-order functions over embeddings. */
  def f4Array(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("n_dims"),
        element_at(col("embedding"), 1).as("first_dim"),
        element_at(col("embedding"), 64).as("last_dim"),
        array_max(col("embedding")).as("max_dim"),
        array_min(col("embedding")).as("min_dim"),
        // bottom-3 as scalar columns, not an array: the driver's compare
        // sorts rows by every column and array cells are unhashable there
        element_at(sort_array(col("embedding")), 1).as("bottom1"),
        element_at(sort_array(col("embedding")), 2).as("bottom2"),
        element_at(sort_array(col("embedding")), 3).as("bottom3"),
        // compare in DOUBLE on both engines: a float literal here would
        // compare in float space while DuckDB promotes to double
        size(filter(col("embedding"), x => x > lit(0.0))).cast("long")
          .as("n_positive"),
        exists(col("embedding"), x => x > lit(0.29)).as("has_large"))
      .orderBy(col("vec_id"))

  /** F5 — JSON→struct/map: events.props parsed with an explicit schema. */
  def f5MapStruct(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    Tables.eventsUs(spark, sfDir)
      .withColumn("parsed", from_json(col("props"), schema))
      .withColumn("m", map(lit("k"), col("parsed.k")))
      .select(col("event_id"),
        col("parsed.k").as("k_struct"),
        element_at(col("m"), "k").as("k_map"),
        (col("parsed.k") * 2).as("k_doubled"))
      .orderBy(col("event_id"))
  }

  /** F6 — JSON extraction (get_json_object path syntax) + aggregation of
    * the extracted value. */
  def f6Json(spark: SparkSession, sfDir: String): DataFrame =
    Tables.eventsUs(spark, sfDir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        Det.dsum(col("k").cast("double")).as("sum_k"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** F7 — explode/generator: word frequencies across documents. */
  def f7Explode(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("word"))

  /** F8 — scalar UDFs (URL validator + cosine). The validator's regex is
    * RE2-compatible, so the oracle re-expresses it via DuckDB
    * regexp_full_match over the same constructed url column. */
  def f8Udf(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Udfs
    Tables.documents(spark, sfDir)
      .withColumn("url",
        when(pmod(col("doc_id"), lit(3L)) === 0L,
          concat(lit("https://"), col("source"), lit(".example.com/d/"),
            col("doc_id").cast("string")))
          .otherwise(concat(lit("not a url "), col("source"))))
      .select(col("doc_id"), col("url"),
        Udfs.is_valid_url(col("url")).as("valid"))
      .orderBy(col("doc_id"))
  }

  /** F16 — VARIANT (Spark 4's semi-structured type): parse_json into a
    * variant column, typed extraction with variant_get, missing-path
    * null via try_variant_get, and schema introspection. */
  def f16Variant(spark: SparkSession, sfDir: String): DataFrame =
    Tables.eventsUs(spark, sfDir)
      .withColumn("v", expr("parse_json(props)"))
      .select(col("event_id"),
        expr("variant_get(v, '$.k', 'long')").as("k_typed"),
        expr("try_variant_get(v, '$.missing', 'long')").as("k_missing"),
        expr("schema_of_variant(v)").as("v_schema"))
      .orderBy(col("event_id"))

  /** F17 — URL function family (the full treatment of the reference's
    * distinctive URL type, beyond F8's validator): component extraction
    * via parse_url (null on malformed input — the constrained-type
    * failure mode) and encode/decode round-trip. */
  def f17UrlFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("url",
        when(pmod(col("doc_id"), lit(3L)) === 0L,
          concat(lit("https://"), col("source"), lit(".example.com/d/"),
            col("doc_id").cast("string")))
          .otherwise(concat(lit("not a url "), col("source"))))
      .select(col("doc_id"),
        expr("try_parse_url(url, 'HOST')").as("host"),
        expr("try_parse_url(url, 'PROTOCOL')").as("proto"),
        expr("try_parse_url(url, 'PATH')").as("path"),
        expr("url_encode(source)").as("enc"),
        expr("url_decode(url_encode(source))").as("dec"))
      .orderBy(col("doc_id"))

  /** F9 — cryptographic/content hashes (content-addressing and sharding
    * primitives for a data pipeline): md5 + sha256, portable hex. */
  def f9Hash(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        md5(col("p_name").cast("binary")).as("name_md5"),
        sha2(col("p_name").cast("binary"), 256).as("name_sha256"))
      .orderBy(col("p_partkey"))

  /** F2b — date/interval arithmetic: day/month/year offsets with
    * end-of-month clamping (both engines clamp Jan 31 + 1 month). */
  def f2bDateArith(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        date_add(col("o_orderdate").cast("date"), 30).cast("string").as("plus_30d"),
        add_months(col("o_orderdate").cast("date"), 2).cast("string").as("plus_2m"),
        add_months(col("o_orderdate").cast("date"), -12).cast("string").as("minus_1y"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_2002"))
      .orderBy(col("o_orderkey"))
  /** F18 — error-safe `try_*` function family (ANSI-mode's graceful
    * side): try_cast on malformed numerics, try_divide by a cycling
    * zero, try_element_at past the array end — every failure becomes
    * NULL instead of a task abort, which is what a 100 TB batch job
    * needs from dirty data. The oracle reproduces each NULL rule
    * portably (TRY_CAST / CASE-guarded divide / DuckDB's NULL-on-OOB
    * list index). */
  def f18TryFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        when(col("p_partkey") % 3 === 0, lit("12.5"))
          .when(col("p_partkey") % 3 === 1, lit("oops"))
          .otherwise(lit("")).as("s"))
      .select(col("p_partkey"),
        expr("try_cast(s AS DOUBLE)").as("casted"),
        expr(s"try_divide(CAST(p_partkey AS DOUBLE), " +
          "CAST(p_partkey % 4 AS DOUBLE))").as("divided"),
        expr("try_element_at(split(s, '\\\\.'), 2)").as("frac_part"))
      .orderBy(col("p_partkey"))

  /** F19 — Spark 4 collation-aware grouping: the supplier table is
    * doubled with a lower-cased and an UPPER-cased copy of every name,
    * then grouped under UNICODE_CI — the case variants MUST merge
    * (every group carries n = 2), where a case-sensitive grouping would
    * leave 2× the groups, so the collation semantics are load-bearing,
    * not decorative. Output keys are lower-cased for portability; the
    * oracle reproduces the equivalence classes with lower() grouping
    * (identical to UNICODE_CI on this ASCII domain). */
  def f19CollationCi(spark: SparkSession, sfDir: String): DataFrame = {
    val lo = Tables.supplier(spark, sfDir)
      .select(lower(col("s_name")).as("name_mixed"), col("s_acctbal"))
    val hi = Tables.supplier(spark, sfDir)
      .select(upper(col("s_name")).as("name_mixed"), col("s_acctbal"))
    lo.unionByName(hi)
      .groupBy(collate(col("name_mixed"), "UNICODE_CI").as("k"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("s_acctbal")).as("bal"))
      .select(lower(col("k")).as("name_ci"), col("n"), col("bal"))
      .orderBy(col("name_ci"))
  }

  /** F13 — JSON construction round-trip: struct → to_json → from_json →
    * field access. Each output is a scalar the oracle derives from the
    * source columns, so cross-engine JSON text formatting never appears
    * in the compared result. */
  def f13JsonRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("sk",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bal",
        org.apache.spark.sql.types.DoubleType)))
    Tables.supplier(spark, sfDir)
      .withColumn("j", to_json(struct(col("s_suppkey").as("sk"),
        col("s_acctbal").as("bal"))))
      .withColumn("back", from_json(col("j"), schema))
      .select(col("s_suppkey"),
        col("back.sk").as("sk_back"),
        col("back.bal").as("bal_back"),
        get_json_object(col("j"), "$.sk").cast("long").as("sk_path"))
      .orderBy(col("s_suppkey"))
  }

  /** F14 — null-handling family: nullif, nvl/nvl2, coalesce chain, and
    * null-safe equality (<=>), exercised through an outer join that
    * actually synthesizes nulls. */
  def f14NullFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
    val bigOrders = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 500000.0)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_big"))
    cust.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(col("c_custkey"),
        coalesce(col("n_big"), lit(0L)).as("n_big_c"),
        nvl2(col("n_big"), lit("whale"), lit("regular")).as("tier"),
        nullif(col("c_nationkey"), lit(0)).as("nation_nz"),
        (col("n_big") <=> lit(null)).as("no_big"),
        nanvl(col("c_acctbal") / when(col("c_acctbal") =!= 0.0,
          col("c_acctbal")).otherwise(lit(0.0)), lit(-1.0)).as("unit_or_flag"))
      .orderBy(col("c_custkey"))
  }

  /** F15 — string family #2: reverse / repeat / split_part / right /
    * starts_with / ends_with / translate (initcap omitted — no DuckDB
    * counterpart to oracle against). */
  def f15String2(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        reverse(col("p_name")).as("rev_name"),
        expr("repeat(p_brand, 2)").as("brand_x2"),
        expr("split_part(p_type, ' ', 1)").as("type_head"),
        expr("right(p_name, 4)").as("name_tail4"),
        col("p_name").startsWith("a").as("starts_a"),
        col("p_type").endsWith("STEEL").as("ends_steel"),
        translate(col("p_brand"), "#123456789", "N---------").as("brand_shape"))
      .orderBy(col("p_partkey"))

  /** F10 — bitwise function family over supplier keys. */
  def f10Bitwise(spark: SparkSession, sfDir: String): DataFrame =
    Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"),
        (col("s_suppkey").bitwiseAND(lit(255L))).as("low8"),
        (col("s_suppkey").bitwiseOR(lit(4096L))).as("with_flag"),
        (col("s_suppkey").bitwiseXOR(lit(0x5aL))).as("xored"),
        shiftleft(col("s_suppkey"), 3).as("shl3"),
        shiftright(col("s_suppkey"), 2).as("shr2"),
        bit_count(col("s_suppkey")).cast("long").as("popcount"))
      .orderBy(col("s_suppkey"))

  /** F11 — map function family: construct, merge, transform, and read
    * map columns; every output is a scalar the oracle derives directly
    * from `k` (map semantics checked, dialect-portable compare). */
  def f11MapFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    val parsed = Tables.eventsUs(spark, sfDir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
    parsed
      .withColumn("m", map_concat(
        map(lit("k"), col("k")),
        map(lit("k2"), col("k") * 2)))
      .withColumn("m3", transform_values(col("m"), (_, v) => v * 3))
      .withColumn("mf", map_filter(col("m"), (key, _) => key === "k2"))
      .select(col("event_id"),
        size(col("m")).cast("long").as("n_keys"),
        element_at(col("m"), "k").as("k_val"),
        element_at(col("m"), "k2").as("k2_val"),
        array_join(sort_array(map_keys(col("m"))), ",").as("keys_str"),
        aggregate(map_values(col("m")), lit(0L), (acc, v) => acc + v)
          .as("vals_sum"),
        element_at(col("m3"), "k2").as("k2_tripled"),
        size(col("mf")).cast("long").as("n_filtered"))
      .orderBy(col("event_id"))
  }

  /** F12 — array function family over document word lists. */
  def f12ArrayFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    val words = split(col("text"), " ")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(words).cast("long").as("n_words"),
        size(array_distinct(words)).cast("long").as("n_distinct"),
        array_contains(words, "data").as("has_data"),
        array_position(words, "data").as("pos_data"),
        array_join(slice(sort_array(words), 1, 3), " ").as("sorted_first3"),
        size(flatten(array(words, words))).cast("long").as("n_doubled"),
        element_at(array_repeat(col("lang"), 3), 2).as("lang_mid"),
        size(array_remove(words, element_at(words, 1))).cast("long")
          .as("n_wo_first"))
      .orderBy(col("doc_id"))
  }
  /** F20 — the higher-order FOLD family (aggregate / exists / forall /
    * zip_with / filter-with-index) over per-row generated sequences:
    * the lambda-calculus corner of the array function surface f4/f12
    * leave uncovered. All codegen'd column work, zero shuffles. The
    * oracle recomputes every fold in closed form (Gauss sums, parity
    * counts) — an INDEPENDENT derivation, not the same lambda re-run. */
  def f20HofFold(spark: SparkSession, sfDir: String): DataFrame = {
    val arr = sequence(lit(1L), col("c_custkey") % 8 + 2)
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"), arr.as("arr"))
      .select(col("c_custkey"),
        size(col("arr")).cast("long").as("n"),
        aggregate(col("arr"), lit(0L), (acc, x) => acc + x).as("fold_sum"),
        exists(col("arr"), x => x * x > 50L).as("has_big_sq"),
        forall(col("arr"), x => x % 3 =!= 0L).as("none_div3"),
        aggregate(zip_with(col("arr"), col("arr"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("dot_self"),
        size(filter(col("arr"), (_, i) => i % 2 === 0)).cast("long")
          .as("n_even_idx"))
      .orderBy(col("c_custkey"))
  }
  /** F22 — observed metrics (`Dataset.observe` / CollectMetricsExec):
    * x53's quality counters collected as a SIDE EFFECT of a real pass —
    * the production gating shape: zero extra scans, the metrics ride
    * the query that was running anyway. The consuming action here is a
    * grouped aggregate over the same frame; the observed values arrive
    * on the driver through the Observation handle after that one
    * action, and the contract row emits them as a single-row frame the
    * oracle recomputes directly. The spec additionally pins
    * CollectMetrics in the plan and equality with the direct
    * aggregates. */
  def f22Observe(spark: SparkSession, sfDir: String): DataFrame = {
    val obs = new org.apache.spark.sql.Observation(
      s"graft_gate_${System.nanoTime()}")
    val li = Tables.lineitem(spark, sfDir).observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col("l_discount") > 0.05, 1L).otherwise(0L))
        .as("n_discounted"),
      round(sum(col("l_extendedprice").cast(Det.Money)).cast("double")
        / 1e6, 6).as("revenue_m"))
    // the real consumer: one grouped aggregate drives the whole pass
    val consumer = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
    val nGroups = consumer.count()
    val m = obs.get
    import spark.implicits._
    Seq((m("n_rows").asInstanceOf[Long],
        m("n_discounted").asInstanceOf[Long],
        m("revenue_m").asInstanceOf[Double],
        nGroups))
      .toDF("n_rows", "n_discounted", "revenue_m", "n_groups")
  }
  /** F23 — the Arrow-vectorized batch seam
    * ([[org.apache.spark.sql.GraftArrow.mapInArrowBatches]]): document
    * scoring run as a columnar BATCH KERNEL over Arrow-encoded
    * partitions — the exact data shape Spark ships to pandas/Arrow UDF
    * workers, demonstrated in-JVM because the pandas tier is a
    * PySpark-client feature with no Scala registration API (boundary
    * documented in SURVEY §2.10). The kernel computes a whitespace
    * token count (one pass over the UTF-8 bytes — 0x20 never occurs in
    * a multi-byte sequence, so the byte loop equals the oracle's
    * character replace) and a capped tokens/50 score in pure IEEE
    * arithmetic, so DuckDB recomputes every value exactly. Batch size
    * 128 forces multiple batches per partition at every SF — the
    * batching path is genuinely exercised, not a single-batch
    * degenerate. */
  def f23ArrowBatches(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val out = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_ws_tokens", LongType),
      StructField("score", DoubleType)))
    GraftArrow.mapInArrowBatches(docs, out, batchSize = 128) { (in, o) =>
      val ids = in.getVector("doc_id").asInstanceOf[BigIntVector]
      val txt = in.getVector("text").asInstanceOf[VarCharVector]
      val oid = o.getVector("doc_id").asInstanceOf[BigIntVector]
      val otk = o.getVector("n_ws_tokens").asInstanceOf[BigIntVector]
      val osc = o.getVector("score").asInstanceOf[Float8Vector]
      val n = in.getRowCount
      var i = 0
      while (i < n) {
        val bytes =
          if (txt.isNull(i)) Array.emptyByteArray else txt.get(i)
        var spaces = 0
        var j = 0
        while (j < bytes.length) {
          if (bytes(j) == 0x20) spaces += 1
          j += 1
        }
        val toks = spaces + 1L
        oid.setSafe(i, ids.get(i))
        otk.setSafe(i, toks)
        osc.setSafe(i, math.min(1.0, toks / 50.0))
        i += 1
      }
      n
    }.orderBy(col("doc_id"))
  }
  /** F24 — regex extraction family (the §2.7 surface f1/f15 didn't
    * reach): `regexp_extract_all` (array result), match counting, and
    * a bounded joined preview per document — the crawl-cleaning
    * primitives (strip boilerplate tokens, count pattern hits) every
    * text pipeline leans on. One projection pass over a bounded id
    * window; both engines run the same RE2-class pattern. */
  def f24RegexFamily(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[a-z]{5,}"), lit(0)))
          .cast("long").as("n_long_words"),
        regexp_extract(col("text"), "([a-z]{5,})", 1).as("first_long"),
        concat_ws(",", slice(
          regexp_extract_all(col("text"), lit("[a-z]{5,}"), lit(0)), 1, 3))
          .as("first3"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f16_variant" -> (f16Variant _),
    "f17_url_funcs" -> (f17UrlFuncs _),
    "f1_string" -> (f1String _),
    "f2_date" -> (f2Date _),
    "f3_math" -> (f3Math _),
    "f4_array" -> (f4Array _),
    "f5_map_struct" -> (f5MapStruct _),
    "f6_json" -> (f6Json _),
    "f7_explode" -> (f7Explode _),
    "f8_udf" -> (f8Udf _),
    "f2b_date_arith" -> (f2bDateArith _),
    "f9_hash" -> (f9Hash _),
    "f15_string2" -> (f15String2 _),
    "f13_json_roundtrip" -> (f13JsonRoundtrip _),
    "f14_null_funcs" -> (f14NullFuncs _),
    "f11_map_funcs" -> (f11MapFuncs _),
    "f12_array_funcs" -> (f12ArrayFuncs _),
    "f10_bitwise" -> (f10Bitwise _),
    "f18_try_funcs" -> (f18TryFuncs _),
    "f19_collation_ci" -> (f19CollationCi _),
    "f20_hof_fold" -> (f20HofFold _),
    "f22_observe" -> (f22Observe _),
    "f23_arrow_batches" -> (f23ArrowBatches _),
    "f24_regex_family" -> (f24RegexFamily _))

  import Det.{sql => d}
  val oracles: Map[String, String] = Map(
    // props is always {"k": <int>} so the variant schema is constant
    "f16_variant" ->
      ("SELECT event_id, " +
       "CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed, " +
       "CAST(NULL AS BIGINT) AS k_missing, " +
       "'OBJECT<k: BIGINT>' AS v_schema " +
       "FROM events ORDER BY event_id"),
    // the URL construction is known, so components derive directly; the
    // malformed branch (spaces) yields parse_url nulls; source values
    // are URL-safe so encode/decode are identity
    "f17_url_funcs" ->
      ("SELECT doc_id, " +
       "CASE WHEN doc_id % 3 = 0 THEN source || '.example.com' END AS host, " +
       "CASE WHEN doc_id % 3 = 0 THEN 'https' END AS proto, " +
       "CASE WHEN doc_id % 3 = 0 THEN '/d/' || CAST(doc_id AS VARCHAR) END AS path, " +
       "source AS enc, source AS dec " +
       "FROM documents ORDER BY doc_id"),
    "f1_string" ->
      ("SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo, " +
       "CAST(length(p_name) AS BIGINT) AS len, " +
       "substring(p_name, 1, 4) AS sub4, " +
       "concat_ws('|', p_brand, p_type) AS joined, " +
       "lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad, " +
       "replace(p_name, ' ', '_') AS snake, " +
       "string_split(p_name, ' ')[1] AS first_word, " +
       "regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num, " +
       "CAST(strpos(p_type, 'A') AS BIGINT) AS a_pos, " +
       "trim(concat('  ', p_type, '  ')) AS trimmed " +
       "FROM part ORDER BY p_partkey"),
    "f2_date" ->
      ("SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS y, " +
       "CAST(month(o_orderdate) AS BIGINT) AS m, " +
       "CAST(day(o_orderdate) AS BIGINT) AS d, " +
       "strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d') AS month_start, " +
       "date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95, " +
       "CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s, " +
       "strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end, " +
       "CAST(dayofweek(o_orderdate) AS BIGINT) AS dow0 " +
       "FROM orders ORDER BY o_orderkey"),
    "f3_math" ->
      ("SELECT s_suppkey, abs(-s_acctbal) AS abs_bal, " +
       "CAST(ceil(s_acctbal) AS BIGINT) AS ceil_bal, " +
       "CAST(floor(s_acctbal) AS BIGINT) AS floor_bal, " +
       "sqrt(abs(s_acctbal)) AS sqrt_bal, " +
       "round(ln(abs(s_acctbal) + 1.0), 6) AS ln_bal, " +
       "round(log10(abs(s_acctbal) + 1.0), 6) AS log10_bal, " +
       "round(exp(s_acctbal / 10000.0), 6) AS exp_small, " +
       "s_acctbal * s_acctbal AS bal_sq, " +
       "s_suppkey % 7 AS mod7, " +
       "CAST(sign(s_acctbal) AS DOUBLE) AS sign_bal, " +
       "greatest(s_acctbal, 0.0) AS pos_part, least(s_acctbal, 0.0) AS neg_part " +
       "FROM supplier ORDER BY s_suppkey"),
    "f4_array" ->
      ("SELECT vec_id, CAST(len(embedding) AS BIGINT) AS n_dims, " +
       "embedding[1] AS first_dim, embedding[64] AS last_dim, " +
       "list_aggregate(embedding, 'max') AS max_dim, " +
       "list_aggregate(embedding, 'min') AS min_dim, " +
       "list_sort(embedding)[1] AS bottom1, " +
       "list_sort(embedding)[2] AS bottom2, " +
       "list_sort(embedding)[3] AS bottom3, " +
       "CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive, " +
       "len(list_filter(embedding, x -> x > 0.29)) > 0 AS has_large " +
       "FROM embeddings ORDER BY vec_id"),
    "f5_map_struct" ->
      ("SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct, " +
       "CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_map, " +
       "CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS k_doubled " +
       "FROM events ORDER BY event_id"),
    "f6_json" ->
      ("SELECT event_type, MIN(k) AS min_k, MAX(k) AS max_k, " +
       s"${d.dsum("CAST(k AS DOUBLE)")} AS sum_k, COUNT(*) AS n FROM " +
       "(SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k " +
       "FROM events) t GROUP BY event_type ORDER BY event_type"),
    "f7_explode" ->
      ("SELECT word, COUNT(*) AS cnt FROM " +
       "(SELECT unnest(string_split(text, ' ')) AS word FROM documents) t " +
       "WHERE length(word) > 0 GROUP BY word ORDER BY word"),
    "f8_udf" ->
      ("SELECT doc_id, url, " +
       "regexp_full_match(url, '(https?)://([A-Za-z0-9.-]+)(:[0-9]{1,5})?(/[^\\s]*)?') AS valid " +
       "FROM (SELECT doc_id, CASE WHEN doc_id % 3 = 0 " +
       "THEN 'https://' || source || '.example.com/d/' || CAST(doc_id AS VARCHAR) " +
       "ELSE 'not a url ' || source END AS url FROM documents) t " +
       "ORDER BY doc_id"),
    "f2b_date_arith" ->
      ("SELECT o_orderkey, " +
       "strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d, " +
       "strftime(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus_2m, " +
       "strftime(CAST(o_orderdate AS DATE) - INTERVAL 12 MONTH, '%Y-%m-%d') AS minus_1y, " +
       "date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002 " +
       "FROM orders ORDER BY o_orderkey"),
"f9_hash" ->
      ("SELECT p_partkey, md5(p_name) AS name_md5, sha256(p_name) AS name_sha256 " +
       "FROM part ORDER BY p_partkey"),
    "f15_string2" ->
      ("SELECT p_partkey, reverse(p_name) AS rev_name, " +
       "repeat(p_brand, 2) AS brand_x2, " +
       "split_part(p_type, ' ', 1) AS type_head, " +
       "right(p_name, 4) AS name_tail4, " +
       "starts_with(p_name, 'a') AS starts_a, " +
       "ends_with(p_type, 'STEEL') AS ends_steel, " +
       "translate(p_brand, '#123456789', 'N---------') AS brand_shape " +
       "FROM part ORDER BY p_partkey"),
// to_json doubles use shortest round-trip representation, so the
    // parsed-back values equal the source columns exactly
    "f13_json_roundtrip" ->
      ("SELECT s_suppkey, s_suppkey AS sk_back, s_acctbal AS bal_back, " +
       "s_suppkey AS sk_path FROM supplier ORDER BY s_suppkey"),
"f14_null_funcs" ->
      ("SELECT c_custkey, COALESCE(n_big, 0) AS n_big_c, " +
       "CASE WHEN n_big IS NOT NULL THEN 'whale' ELSE 'regular' END AS tier, " +
       "NULLIF(c_nationkey, 0) AS nation_nz, " +
       "n_big IS NULL AS no_big, " +
       "CAST(CASE WHEN c_acctbal = 0.0 THEN -1.0 ELSE 1.0 END AS DOUBLE) " +
       "AS unit_or_flag " +
       "FROM customer LEFT JOIN " +
       "(SELECT o_custkey, COUNT(*) AS n_big FROM orders " +
       "WHERE o_totalprice > 500000.0 GROUP BY o_custkey) b " +
       "ON c_custkey = o_custkey ORDER BY c_custkey"),
// every f11 output is a direct function of k, so the oracle computes
    // them without needing DuckDB's (different) map dialect
    "f11_map_funcs" ->
      ("SELECT event_id, CAST(2 AS BIGINT) AS n_keys, k AS k_val, " +
       "k * 2 AS k2_val, 'k,k2' AS keys_str, k * 3 AS vals_sum, " +
       "k * 6 AS k2_tripled, CAST(1 AS BIGINT) AS n_filtered FROM " +
       "(SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k " +
       "FROM events) t ORDER BY event_id"),
"f12_array_funcs" ->
      ("SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words, " +
       "CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct, " +
       "list_contains(w, 'data') AS has_data, " +
       "CAST(COALESCE(list_position(w, 'data'), 0) AS BIGINT) AS pos_data, " +
       "array_to_string(list_slice(list_sort(w), 1, 3), ' ') AS sorted_first3, " +
       "CAST(len(w) * 2 AS BIGINT) AS n_doubled, " +
       "lang AS lang_mid, " +
       "CAST(len(list_filter(w, x -> x <> w[1])) AS BIGINT) AS n_wo_first " +
       "FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents) t " +
       "ORDER BY doc_id"),
"f10_bitwise" ->
      ("SELECT s_suppkey, s_suppkey & 255 AS low8, " +
       "s_suppkey | 4096 AS with_flag, xor(s_suppkey, 90) AS xored, " +
       "s_suppkey << 3 AS shl3, s_suppkey >> 2 AS shr2, " +
       "CAST(bit_count(s_suppkey) AS BIGINT) AS popcount " +
       "FROM supplier ORDER BY s_suppkey"),
"f18_try_funcs" ->
      ("WITH t AS (SELECT p_partkey, CASE WHEN p_partkey % 3 = 0 THEN '12.5' " +
       "WHEN p_partkey % 3 = 1 THEN 'oops' ELSE '' END AS s FROM part) " +
       "SELECT p_partkey, TRY_CAST(s AS DOUBLE) AS casted, " +
       "CASE WHEN p_partkey % 4 = 0 THEN NULL " +
       "ELSE CAST(p_partkey AS DOUBLE) / CAST(p_partkey % 4 AS DOUBLE) END " +
       "AS divided, " +
       "string_split(s, '.')[2] AS frac_part " +
       "FROM t ORDER BY p_partkey"),
"f19_collation_ci" ->
      (s"SELECT lower(m) AS name_ci, COUNT(*) AS n, ${d.dsum("s_acctbal")} AS bal " +
       "FROM (SELECT lower(s_name) AS m, s_acctbal FROM supplier " +
       "UNION ALL SELECT upper(s_name), s_acctbal FROM supplier) t " +
       "GROUP BY lower(m) ORDER BY name_ci"),
    // closed-form recomputation: Gauss sum, square-sum, parity — an
    // independent derivation of every fold
    "f20_hof_fold" ->
      ("SELECT c_custkey, n, " +
       "n * (n + 1) // 2 AS fold_sum, " +
       "n >= 8 AS has_big_sq, " +          // 8^2=64 > 50, 7^2=49 is not
       "n < 3 AS none_div3, " +            // 3 | x first appears at x=3
       "n * (n + 1) * (2 * n + 1) // 6 AS dot_self, " +
       "(n + 1) // 2 AS n_even_idx " +
       "FROM (SELECT c_custkey, c_custkey % 8 + 2 AS n FROM customer) t " +
       "ORDER BY c_custkey"),
    "f22_observe" ->
      ("SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, " +
       "CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) " +
       "AS n_discounted, " +
       "round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) " +
       "/ 1e6, 6) AS revenue_m, " +
       "CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_groups " +
       "FROM lineitem"),
    // the kernel's arithmetic restated over characters: one 0x20 byte
    // per ' ' char in UTF-8, and min(1.0, n/50.0) is exact IEEE
    "f23_arrow_batches" ->
      ("SELECT doc_id, " +
       "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) " +
       "AS n_ws_tokens, " +
       "least(1.0, (length(text) - length(replace(text, ' ', '')) + 1) " +
       "/ 50.0) AS score " +
       "FROM documents ORDER BY doc_id"),
    // same RE2-class pattern, same extraction semantics
    "f24_regex_family" ->
      ("SELECT doc_id, " +
       "CAST(len(regexp_extract_all(text, '[a-z]{5,}')) AS BIGINT) " +
       "AS n_long_words, " +
       "COALESCE(regexp_extract(text, '([a-z]{5,})', 1), '') " +
       "AS first_long, " +
       "array_to_string(list_slice(" +
       "regexp_extract_all(text, '[a-z]{5,}'), 1, 3), ',') AS first3 " +
       "FROM documents WHERE doc_id < 50 ORDER BY doc_id"))
}
