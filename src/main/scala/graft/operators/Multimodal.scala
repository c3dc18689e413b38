package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Multimodal-column operators — SURVEY §2.8 L7 + the binary-column
  * plumbing a training-data pipeline needs (X7) and a corpus-trained
  * language-ID heuristic (X3).
  */
object Multimodal {

  /** L7 — multimodal join: documents ⋈ embeddings (doc_id = vec_id
    * domain), label histogram per language with text + vector stats
    * carried through the join. */
  def l7MultimodalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    docs.join(emb, docs("doc_id") === emb("vec_id"), "inner")
      .groupBy(col("lang"), col("label"))
      .agg(count(lit(1)).as("n"),
        Det.dsum(col("n_chars").cast("double")).as("sum_chars"),
        (sum(element_at(col("embedding"), 1).cast("double")
            .cast(org.apache.spark.sql.types.DecimalType(18, 8)))
          .cast("double") / count(lit(1))).as("mean_dim1"))
      .orderBy(col("lang"), col("label"))
  }

  /** X3 — language ID via corpus-trained profiles: the top-10
    * most frequent words per language form each language's profile; a doc
    * is classified to the language whose profile overlaps its word set
    * most (ties → alphabetical). Everything is DataFrame-parallel: train
    * and classify are two grouped aggs and a broadcast join. */
  def x3LangId(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("word"))
    val wTop = Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("word").asc)
    val profiles = words.groupBy(col("lang"), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= 10)
      .select(col("lang").as("cand_lang"), col("word"))
    val wBest = Window.partitionBy(col("doc_id"))
      .orderBy(col("overlap").desc, col("cand_lang").asc)
    words.select(col("doc_id"), col("lang"), col("word")).distinct()
      .join(broadcast(profiles), "word")
      .groupBy(col("doc_id"), col("lang"), col("cand_lang"))
      .agg(count(lit(1)).as("overlap"))
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("true_lang"),
        col("cand_lang").as("pred_lang"))
      .orderBy(col("doc_id"))
  }

  /** X7 — binary ("image") column plumbing: bytes + typed metadata +
    * batched per-partition decode. The decode itself is a STUB — no
    * imaging libraries ship in this container — producing a deterministic
    * fake feature from the MD5 of the bytes (so the oracle can recompute
    * it); the Spark-side contract (binary column, metadata struct,
    * mapPartitions batch shape, output schema) is real. At scale the
    * iterator-per-partition shape is exactly where a native decoder
    * (JNI/Python worker) slots in. */
  def x7BinaryDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val withBytes = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        struct(col("source").as("origin"), col("n_chars").as("byte_len"),
          lit("fake/raw").as("format")).as("meta"))
    val decoded = withBytes
      .select(col("doc_id"), col("payload"), col("meta.byte_len").as("blen"))
      .as[(Long, Array[Byte], Long)]
      .mapPartitions { it =>
        // STUB decoder: stands in for image/audio decode (no codec libs in
        // this container). Deterministic per payload — derived from the
        // MD5 of the bytes so the DuckDB oracle can recompute it —
        // with the per-partition iterator shape a real decoder needs
        // (one MessageDigest per partition, reused per record).
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes, blen) =>
          md.reset()
          val hex = md.digest(bytes).map("%02x".format(_)).mkString
          val a = hex(0).toInt; val b = hex(1).toInt; val c = hex(2).toInt
          val fakeWidth = ((a * 31 + b) % 640 + 1).toLong
          val fakeHeight = ((b * 31 + c) % 480 + 1).toLong
          (id, blen, fakeWidth, fakeHeight, hex)
        }
      }
      .toDF("doc_id", "byte_len", "width", "height", "digest")
    decoded.orderBy(col("doc_id"))
  }

  /** X16 — frame-sample + resize plumbing (the video/audio analog of
    * X7's image decode): each payload is sampled into 4 evenly-spaced
    * "frames" (offset slices — the frame-sample primitive), each frame
    * "resized" to a fixed-width 8-char thumbnail, then pooled per
    * document (count / coverage / min-hash fingerprint / first
    * thumbnail). The sampling arithmetic and features are pure functions
    * of the payload bytes so DuckDB reproduces them exactly; at scale
    * the same explode → per-frame transform → pooling agg shape carries
    * a real codec behind the X7-style per-partition decoder. */
  def x16FrameSample(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        greatest(lit(1L), (length(col("text")) / 4).cast("long")).as("stride"))
      .select(col("doc_id"), col("text"), col("stride"),
        explode(sequence(lit(0L), lit(3L))).as("f"))
      .withColumn("frame",
        expr("substring(text, cast(f * stride + 1 as int), cast(stride as int))"))
      .filter(length(col("frame")) > 0)
      .withColumn("thumb", rpad(substring(col("frame"), 1, 8), 8, "_"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(length(col("frame"))).cast("long").as("covered_chars"),
        min(md5(col("frame"))).as("pooled_fp"),
        min(col("thumb")).as("min_thumb"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l7_multimodal_join" -> (l7MultimodalJoin _),
    "x3_langid" -> (x3LangId _),
    "x7_binary_decode" -> (x7BinaryDecode _),
    "x16_frame_sample" -> (x16FrameSample _))

  import Det.{sql => d}
  val oracles: Map[String, String] = Map(
    "l7_multimodal_join" ->
      ("SELECT lang, label, COUNT(*) AS n, " +
       s"${d.dsum("CAST(n_chars AS DOUBLE)")} AS sum_chars, " +
       "CAST(SUM(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(18,8))) AS DOUBLE) " +
       "/ COUNT(*) AS mean_dim1 " +
       "FROM documents JOIN embeddings ON doc_id = vec_id " +
       "GROUP BY lang, label ORDER BY lang, label"),
    // the fake-decode outputs are pure functions of md5(payload), which
    // DuckDB computes identically over the same UTF-8 bytes
    "x7_binary_decode" ->
      ("SELECT doc_id, n_chars AS byte_len, " +
       "CAST((ascii(substr(h, 1, 1)) * 31 + ascii(substr(h, 2, 1))) % 640 + 1 " +
       "AS BIGINT) AS width, " +
       "CAST((ascii(substr(h, 2, 1)) * 31 + ascii(substr(h, 3, 1))) % 480 + 1 " +
       "AS BIGINT) AS height, h AS digest FROM " +
       "(SELECT doc_id, n_chars, md5(text) AS h FROM documents) t " +
       "ORDER BY doc_id"),
    // frame arithmetic is integer-exact on both engines; md5/rpad agree
    // byte-for-byte on the same UTF-8 text
    "x16_frame_sample" ->
      ("WITH fr AS (SELECT doc_id, " +
       "substr(text, CAST(f * stride + 1 AS INT), CAST(stride AS INT)) AS frame " +
       "FROM (SELECT doc_id, text, " +
       "GREATEST(1, length(text) // 4) AS stride FROM documents) d, " +
       "range(0, 4) r(f)) " +
       "SELECT doc_id, COUNT(*) AS n_frames, " +
       "CAST(SUM(length(frame)) AS BIGINT) AS covered_chars, " +
       "MIN(md5(frame)) AS pooled_fp, " +
       "MIN(rpad(substr(frame, 1, 8), 8, '_')) AS min_thumb " +
       "FROM fr WHERE length(frame) > 0 " +
       "GROUP BY doc_id ORDER BY doc_id"),
    // Same train+classify pipeline in SQL: top-10 words per language
    // (count desc, word asc), overlap of each doc's distinct word set
    // against every profile, argmax with the same deterministic tie-break.
    "x3_langid" ->
      ("WITH words AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word " +
       "FROM documents), " +
       "profiles AS (SELECT lang AS cand_lang, word FROM " +
       "(SELECT lang, word, row_number() OVER " +
       "(PARTITION BY lang ORDER BY COUNT(*) DESC, word ASC) AS rn " +
       "FROM words GROUP BY lang, word) t WHERE rn <= 10), " +
       "dw AS (SELECT DISTINCT doc_id, lang, word FROM words), " +
       "ov AS (SELECT doc_id, lang, cand_lang, COUNT(*) AS overlap " +
       "FROM dw JOIN profiles USING (word) GROUP BY doc_id, lang, cand_lang) " +
       "SELECT doc_id, lang AS true_lang, cand_lang AS pred_lang FROM " +
       "(SELECT doc_id, lang, cand_lang, row_number() OVER " +
       "(PARTITION BY doc_id ORDER BY overlap DESC, cand_lang ASC) AS rn " +
       "FROM ov) t WHERE rn = 1 ORDER BY doc_id"))
}
