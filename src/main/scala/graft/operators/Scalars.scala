package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
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
    "f8_udf" -> (f8Udf _))

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
       "ORDER BY doc_id"))
}
