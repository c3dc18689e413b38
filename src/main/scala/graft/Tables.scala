package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central loaders for the driver-generated TPC-H-ish corpus (TESTDATA.md,
  * FIXTURES.md): one parquet file per table at `$sfDir/<name>.parquet`.
  *
  * Scale posture: loaders return bare scans so Catalyst keeps column
  * pruning and predicate pushdown all the way to the parquet reader;
  * nothing here caches, collects, or repartitions. At cluster scale the
  * same code reads a partitioned directory instead of a single file —
  * the plan shape is identical.
  *
  * Reference note: the StellarSQL checkout at /root/reference was empty at
  * survey time (SURVEY.md §0); its table abstraction (named tables of
  * typed rows) maps to the Spark catalog + DataFrame per SURVEY §1.1.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Runtime confs every contract query needs. The driver's Verify/Bench
    * sessions do NOT set these (SURVEY §1.3), and they are runtime SQLConfs,
    * so each query path calls tune() first. Idempotent and cheap. */
  def tune(spark: SparkSession): SparkSession = {
    val c = spark.conf
    c.set("spark.sql.session.timeZone", "UTC")
    // honored unless a scoped AQE-off section is active (round 17:
    // GraphOps.withAqeOff freezes AQE around eager iterative cuts;
    // loaders called inside such a section must not re-enable it)
    if (c.get("spark.graft.aqe.freeze", "false") != "true")
      c.set("spark.sql.adaptive.enabled", "true")
    // events.parquet carries INT64 TIMESTAMP(NANOS,false), which the default
    // Spark 4 reader rejects (PARQUET_TYPE_ILLEGAL). Read it as epoch-nano
    // LongType instead; queries treat `ts` as a BIGINT and never emit a raw
    // nanosecond timestamp (oracle compares epoch_ns(ts)).
    c.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Write timestamps as INT64 micros (round 16): Spark's INT96
    // default is deprecated, carries NO usable parquet min/max stats
    // (so the skipping ledger cannot range-prune timestamp columns),
    // and declines filter pushdown. INT64 micros is lossless for
    // Spark's microsecond timestamps and is what every modern engine
    // writes. ParquetUtils.prepareWrite reads this from the SESSION
    // conf (a per-relation option is overwritten there), so it lives
    // in the engine's session tuning.
    c.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    // TypedImperativeAggregates (MinHashAgg) run in ObjectHashAggregateExec,
    // which falls back to sort-based aggregation after 128 distinct groups
    // per task by default — far too conservative for a 1 KiB signature
    // buffer (1M groups ≈ 1 GiB across a whole executor, and real corpora
    // shard groups across many partitions anyway).
    c.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
    spark
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    tune(spark).read.parquet(s"$sfDir/$name.parquet")

  /** Root of this PROCESS's scratch space: tmpdir/graft_scratch_<pid@host>.
    * Namespacing scratch per process (VERDICT r6 #2) makes two concurrent
    * Verify/Bench runs against the same sfDir unable to race each other's
    * staging (s5b's ORC round-trip, sql16's warehouse, x54/x51 markers) —
    * within one process, markers still de-duplicate staging work across
    * queries exactly as before. A shutdown hook removes the whole root so
    * repeated runs don't accumulate staged copies in tmp. */
  private lazy val scratchRoot: java.io.File = {
    val token = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getName.replaceAll("[^A-Za-z0-9]", "_")
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_scratch_$token")
    root.mkdirs()
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(root)
    }))
    root
  }

  /** Deterministic per-(process, purpose, corpus) scratch directory under
    * the JVM tmpdir — the single spelling for every sink round-trip
    * operator. */
  def scratchDir(tag: String, sfDir: String): String =
    new java.io.File(scratchRoot,
      s"graft_${tag}_${(sfDir.hashCode & 0x7fffffff).toHexString}")
      .getAbsolutePath

  /** Register (idempotently) and return a PER-(purpose, corpus) graft
    * catalog name. Spark caches catalog INSTANCES by name at first
    * use and never re-reads their options, so one fixed name pointed
    * at two base dirs in one session (exactly what the scale
    * rehearsal does — every row runs at sfDir AND the amplified
    * corpus) silently keeps the FIRST base and the second corpus's
    * statements land in the wrong directory. Salting the name by
    * corpus gives each base its own cached instance. */
  def graftCatalog(spark: SparkSession, tag: String, sfDir: String): String = {
    val name = s"graft_${tag}_${(sfDir.hashCode & 0x7fffffff).toHexString}"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.base",
      scratchDir(s"${tag}_cat", sfDir))
    name
  }

  /** Root of the CROSS-PROCESS shared artifact space (tmpdir/
    * graft_shared) — build-once/serve-many artifacts (trained PQ models,
    * staged graph adjacency) that a LATER SESSION reuses instead of
    * rebuilding. Deliberately NOT removed at shutdown (unlike
    * [[scratchRoot]]): persistence across processes is the point. On a
    * cluster this is a warehouse path; locally it's tmp. */
  private lazy val sharedRoot: java.io.File = {
    val root = new java.io.File(sys.props("java.io.tmpdir"), "graft_shared")
    root.mkdirs()
    root
  }

  /** size:mtime staleness fingerprint of one corpus table (the x54
    * rule): regenerated test data changes the fingerprint, so a shared
    * artifact built from the old corpus can never serve the new one. */
  def corpusFingerprint(sfDir: String, tableName: String): String = {
    val p = java.nio.file.Paths.get(s"$sfDir/$tableName.parquet")
    s"${java.nio.file.Files.size(p)}:" +
      s"${java.nio.file.Files.getLastModifiedTime(p).toMillis}"
  }

  /** Final home of a shared artifact. The FINGERPRINT IS THE NAME: a
    * directory exists at this path iff a complete build for exactly
    * this (corpus, config) was atomically published ([[publishShared]])
    * — existence is validity, so there is no marker file to race and a
    * crashed build can never be half-visible (ADVICE r8 on the PQ
    * model's marker-after-multi-write window). */
  def sharedDir(tag: String, sfDir: String, fingerprint: String): java.io.File = {
    val keyed = StagedVersion + "|" + fingerprint
    new java.io.File(sharedRoot,
      s"graft_${tag}_${(sfDir.hashCode & 0x7fffffff).toHexString}_" +
        s"${(keyed.hashCode & 0x7fffffff).toHexString}")
  }

  /** A CALL-unique sibling build directory for [[publishShared]]:
    * process token (two JVMs never collide) + thread + nanos (two
    * builders inside one process never share a temp either —
    * round-12 hardening; the per-session Memo usually dedupes
    * in-process builds, but the temp dir must not rely on it). */
  def sharedBuildDir(target: java.io.File): java.io.File = {
    val token = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getName.replaceAll("[^A-Za-z0-9]", "_")
    new java.io.File(target.getParentFile,
      s"${target.getName}.build_${token}_" +
        s"${Thread.currentThread().getId}_${System.nanoTime()}")
  }

  /** Publish a fully-built temp directory into its shared home with ONE
    * atomic rename. Two processes building concurrently both succeed:
    * the loser's rename fails on the existing target and its temp build
    * is discarded — either way the target holds one process's COMPLETE
    * build. Returns true if this process's build won. */
  def publishShared(temp: java.io.File, target: java.io.File): Boolean = {
    import java.nio.file.{Files, StandardCopyOption}
    try {
      Files.move(temp.toPath, target.toPath,
        StandardCopyOption.ATOMIC_MOVE)
      BuildLog.note(target.getName) // r17: bench attribution, see BuildLog
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException |
          _: java.nio.file.FileSystemException if target.isDirectory =>
        def rm(f: java.io.File): Unit = {
          val kids = f.listFiles()
          if (kids != null) kids.foreach(rm)
          f.delete(): Unit
        }
        rm(temp)
        false
    }
  }

  /** Emergency manual salt for [[StagedVersion]] — bump only if a
    * staged artifact must be invalidated without any builder-class
    * change (e.g. an external format assumption changed). */
  private val StagedSalt = "s1"

  /** Modules whose code builds staged artifacts. [[StagedVersion]] is
    * derived from THEIR CLASSFILE BYTES, so any builder change
    * re-keys every artifact automatically — the hand-maintained
    * round constant this replaces was one forgotten bump away from
    * silently serving stale cross-process artifacts (ADVICE r11; the
    * x111 stale-tmp incident was exactly this class).
    * StagedVersionSpec asserts the list covers every source file that
    * calls the staging API. */
  private[graft] val StagedBuilderClasses: Seq[String] = Seq(
    "graft.Tables",
    "graft.operators.BasketOps",
    "graft.operators.CurationOps",
    "graft.operators.Dedup",
    "graft.operators.EmbedOps",
    "graft.operators.GraphOps",
    "graft.operators.SimSearch",
    "graft.operators.StorageOps",
    "graft.operators.TextIndexOps",
    "graft.streaming.Streams")

  /** Code-version token folded into every staged-artifact fingerprint
    * (ADVICE r10/r11): cross-process artifacts outlive the JVM, so
    * builder-code changes must re-key them. Content-derived — an MD5
    * over the builder modules' classfiles (object + companion class;
    * lambdas compile into the enclosing object's file, so builder
    * closures are covered). Over-invalidation (an unrelated edit in a
    * builder module) costs one rebuild — the safe direction. */
  lazy val StagedVersion: String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(StagedSalt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    StagedBuilderClasses.sorted.foreach { c =>
      Seq("", "$").foreach { suffix =>
        val res = "/" + c.replace('.', '/') + suffix + ".class"
        val in = getClass.getResourceAsStream(res)
        if (in != null) {
          try md.update(in.readAllBytes()) finally in.close()
        }
      }
    }
    java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(md.digest()).take(12)
  }

  /** Home directory of a staged artifact keyed by (tag, code version —
    * via [[sharedDir]], corpus table fingerprint, config) — the
    * round-10 generalization of the PQ/CC pattern so each new staged
    * family is three lines, not thirty. */
  def stagedHome(tag: String, sfDir: String, srcTable: String,
      cfg: String): java.io.File =
    sharedDir(tag, sfDir, corpusFingerprint(sfDir, srcTable) + "|" + cfg)

  /** Build-if-absent for a staged home: `build` fills a process-unique
    * temp dir (flat parquet or named subdirs), then ONE atomic rename
    * publishes. Concurrent builders race safely ([[publishShared]]); a
    * FAILED build deletes its temp dir before rethrowing so tmp never
    * accumulates half-built orphans (ADVICE r10). */
  def ensureStaged(home: java.io.File)(build: java.io.File => Unit): Unit =
    if (!home.isDirectory) {
      val tmp = sharedBuildDir(home)
      tmp.mkdirs()
      try build(tmp)
      catch {
        case e: Throwable =>
          def rm(f: java.io.File): Unit = {
            val kids = f.listFiles()
            if (kids != null) kids.foreach(rm)
            f.delete(): Unit
          }
          rm(tmp)
          throw e
      }
      publishShared(tmp, home): Unit
    }

  /** Memoized + cross-process-staged single frame: first process per
    * corpus/config builds and publishes, every later process (and every
    * later call in this one) reads the parquet — the build-once/
    * serve-many tier (VERDICT r9 #2 applied to the text-index family). */
  def stagedFrame(spark: SparkSession, tag: String, sfDir: String,
      srcTable: String, cfg: String)(build: => DataFrame): DataFrame =
    graft.Memo(spark, s"staged_$tag:$sfDir") {
      val s = tune(spark)
      val home = stagedHome(tag, sfDir, srcTable, cfg)
      ensureStaged(home) { tmp =>
        build.write.mode("overwrite").parquet(tmp.getAbsolutePath)
      }
      s.read.parquet(home.getAbsolutePath)
    }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")

  /** events with `ts` as epoch-nanos BIGINT — the contract every event
    * query codes against. The driver corpus has shipped two physical
    * spellings of `ts`: INT64 TIMESTAMP(NANOS) (read as LongType via
    * nanosAsLong, already epoch-ns) and µs TIMESTAMP (current corpus).
    * Normalize HERE, once, by schema inspection: downstream operators
    * and the `ts div 1000` µs policy ([[eventsUs]]) stay unchanged, and
    * the DuckDB oracle's epoch_ns(ts)/epoch_us(ts) reads the same
    * instants from either spelling. Session TZ is pinned UTC (tune()),
    * so the NTZ→instant cast is timezone-free. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.LongType
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df
      case _ => df.withColumn(
        "ts", expr("unix_micros(cast(ts AS TIMESTAMP)) * 1000L"))
    }
  }

  /** events with `ts` truncated to epoch-MICROS (BIGINT, integer division —
    * no double round-trip). DuckDB 1.0 reads the same parquet as a
    * microsecond TIMESTAMP (it truncates the nano component), so every
    * cross-checked event query computes on this µs view; `epoch_us(ts)`
    * is the oracle-side equivalent. */
  def eventsUs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    events(s, d).withColumn("ts", expr("ts div 1000"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
