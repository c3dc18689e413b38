package graft.sources

import java.io.File

import org.apache.spark.sql.SparkSession

/** Table-maintenance operations that run UNDER the commit protocol
  * (round 12) — the transactional face of what s18 does on bare
  * directories. Like every [[GraftTxn]] commit: stage outside the
  * live file set, validate the read snapshot under the lock, snapshot
  * the pre-state for time travel, swap, bump the version.
  */
object GraftMaintenance {

  /** Transactional OPTIMIZE: bin-pack the table's data files to
    * ceil(bytes / targetBytes) files. Value-neutral by construction
    * (one read → repartition → write of the same rows); a concurrent
    * commit between the read and the lock conflicts (compaction
    * rewrites EVERY file, so its read snapshot is the whole file set
    * and set-equality is the validation — the deleteWhere rule).
    * Returns (filesBefore, filesAfter); a table already at or under
    * the bin count is left untouched (no version bump — maintenance
    * no-ops must not invalidate anything).
    *
    * CLUSTERED form (round 13 — the `OPTIMIZE ... ZORDER BY` analog,
    * the transactional face of x26's bare-directory layout):
    * `clusterBySql` is a SQL expression over the table's columns (a
    * Morton interleave for 2-D, or a plain key for 1-D); the rewrite
    * then range-repartitions AND sorts by it, so every output file
    * owns a disjoint slice of the clustering curve — min/max file
    * stats become tight and a predicate on EITHER underlying
    * dimension prunes files/row-groups. A clustering request always
    * rewrites (re-layout is the point, even when the bin count
    * already matches).
    *
    * At 100 TB the same op runs per-partition with the same
    * arithmetic ([[compactPartitions]]); the repartition is the only
    * shuffle and its width IS the output layout. */
  def compact(spark: SparkSession, tableDir: File,
      targetBytes: Long = 262144L,
      clusterBySql: Option[String] = None): (Int, Int) =
    GraftTxn.describedNoAqe(spark, "optimize compact") {
      compactBody(spark, tableDir, targetBytes, clusterBySql)
    }

  private def compactBody(spark: SparkSession, tableDir: File,
      targetBytes: Long,
      clusterBySql: Option[String]): (Int, Int) = {
    require(tableDir.isDirectory, s"no graft table at $tableDir")
    require(GraftCatalog.partitionSpec(tableDir).isEmpty,
      s"$tableDir is partitioned — whole-table compact would read its " +
        "files without their path-carried partition values and flatten " +
        "the layout; use compactPartitions (round 14)")
    // round 15: OPTIMIZE materializes deletion vectors first — the
    // raw reads below must not resurrect DV-deleted rows, and folding
    // the DVs in IS part of what OPTIMIZE promises
    if (GraftDv.hasDvs(tableDir))
      GraftDv.materialize(spark, tableDir,
        GraftCatalog.pinned(tableDir)): Unit
    val before = GraftTxn.dataFiles(tableDir)
    val totalBytes = before.toSeq.map(n => new File(tableDir, n).length()).sum
    val bins = math.max(1L,
      (totalBytes + targetBytes - 1) / targetBytes).toInt
    if (clusterBySql.isEmpty && bins >= before.size)
      return (before.size, before.size)
    val stage = GraftTxn.newStageDir(tableDir, "compact")
    val base = spark.read
      .option(GraftParquetTable.FieldIdReadConf, "true") // r15: scoped
      .parquet(
        before.toSeq.map(n => new File(tableDir, n).getAbsolutePath): _*)
    val packed = clusterBySql match {
      case Some(e) =>
        val c = org.apache.spark.sql.functions.expr(e)
        base.repartitionByRange(bins, c).sortWithinPartitions(c)
      case None => base.repartition(bins)
    }
    packed.write.mode("overwrite")
      .option(GraftParquetTable.FieldIdWriteConf, "true") // r15: scoped
      .parquet(stage.getAbsolutePath)
    GraftTxn.commitHook()
    GraftTxn.withCommitLock(tableDir) {
      val now = GraftTxn.dataFiles(tableDir)
      if (now != before) {
        GraftTxn.rmTree(stage)
        throw new GraftTxn.CommitConflictException(tableDir.getName,
          (before diff now) ++ (now diff before))
      }
      GraftTxn.snapshotCurrent(tableDir)
      GraftTxn.promoteStage(stage, tableDir) // promote first, delete after
      before.foreach(n => new File(tableDir, n).delete())
      GraftTxn.bumpVersion(tableDir)
      GraftTxn.pruneSnapshots(tableDir, GraftTxn.retention)
    }
    GraftTxn.rmTree(stage)
    (before.size, GraftTxn.dataFiles(tableDir).size)
  }

  /** VACUUM: drop retained snapshots beyond `retain` (oldest first),
    * under the lock, and sweep ORPHANED WRITE DEBRIS (round 13,
    * VERDICT r12 #4): `_stage_*` dirs, `_snapshots/v*_build_*` temps,
    * and sibling `.rewrite_*`/`.trash_*` dirs a crashed writer left
    * behind, when older than `staleDebrisMs` (default 1 h — far past
    * any live commit's heartbeat window, so an IN-FLIGHT statement's
    * stage is never swept). Returns the number of snapshot dirs
    * removed (the pre-r13 contract; debris count via [[gcDebris]]).
    * The disk-reclaim counterpart of time travel — after a vacuum,
    * `VERSION AS OF` on a dropped version errors with the retained
    * list instead of silently reading stale bytes. */
  def vacuum(tableDir: File, retain: Int,
      staleDebrisMs: Long = 3600000L): Int = {
    require(tableDir.isDirectory, s"no graft table at $tableDir")
    GraftTxn.withCommitLock(tableDir) {
      val beforeVs = GraftTxn.snapshotVersions(tableDir)
      GraftTxn.pruneSnapshots(tableDir, retain)
      gcDebris(tableDir, staleDebrisMs): Unit
      beforeVs.size - GraftTxn.snapshotVersions(tableDir).size
    }
  }

  /** Sweep crashed-writer debris older than `olderThanMs`: staging
    * dirs inside the table ([[GraftTxn.newStageDir]] has no reaper of
    * its own), half-built snapshot temps, and the delete path's
    * sibling rewrite/trash dirs. Live data files, the schema pin, the
    * commit log, version markers and PUBLISHED snapshots are never
    * touched (published snapshots live at `_snapshots/v<N>` — the
    * `_build_` infix is the temp marker). Returns the number of
    * debris roots removed. Caller holds the lock (vacuum) or accepts
    * the race (standalone call on a quiesced table). */
  def gcDebris(tableDir: File, olderThanMs: Long): Int = {
    val cutoff = System.currentTimeMillis() - olderThanMs
    def stale(f: File): Boolean = f.lastModified() < cutoff
    // a stage is debris only when its writer STOPPED HEARTBEATING its
    // alive marker (round 14, ADVICE r13 #1): Spark's task phase writes
    // under <stage>/_temporary, which never touches the stage root's
    // mtime, so dir-mtime alone would sweep a live >1h staging job
    val stages = Option(tableDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("_stage_") &&
        !GraftTxn.stageAlive(f, olderThanMs))
    val snapTemps = Option(
        new File(tableDir, GraftTxn.SnapshotsDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.contains("_build_") &&
        stale(f))
    val abs = tableDir.getAbsoluteFile
    val siblings = Option(abs.getParentFile.listFiles())
      .getOrElse(Array.empty)
      .filter(f => (f.getName.startsWith(abs.getName + ".rewrite_") ||
        f.getName.startsWith(abs.getName + ".trash_")) && stale(f))
    val debris = stages ++ snapTemps ++ siblings
    debris.foreach(GraftTxn.rmTree)
    debris.length
  }

  /** RESTORE TABLE ... TO VERSION (round 13, VERDICT r12 #1): promote
    * a retained snapshot back to live as a NEW validated commit —
    * history keeps moving forward (the pre-restore state is itself
    * snapshotted first, so the restore is undoable), exactly Delta's
    * RESTORE semantics. Under the lock: read-snapshot validation (a
    * concurrent commit between the caller's decision and the lock
    * conflicts rather than being silently erased), then the live file
    * set is diffed against the snapshot's — missing files HARD-LINK
    * back in FIRST, extra files delete AFTER (transient-duplicate
    * crash direction, never loss), and the snapshot's pinned schema
    * rides along (restoring across a schema change restores the
    * schema too). Returns the new current version.
    *
    * File names are write-job-unique, so a name present in both live
    * and snapshot IS the same bytes (hard links to one inode) and is
    * left in place — a restore to a mostly-shared version moves only
    * the delta, the 100-TB property. */
  def restore(tableDir: File, toVersion: Long): Long = {
    import java.nio.file.{Files, StandardCopyOption}
    require(tableDir.isDirectory, s"no graft table at $tableDir")
    val cur = GraftTxn.version(tableDir)
    if (toVersion == cur) return cur // already there: no-op, no bump
    val snap = GraftTxn.snapshotDir(tableDir, toVersion)
    require(snap.isDirectory,
      s"no snapshot v$toVersion at $tableDir (current $cur; retained: " +
        s"${GraftTxn.snapshotVersions(tableDir).mkString(", ")})")
    val before = GraftTxn.dataFiles(tableDir)
    GraftTxn.commitHook()
    GraftTxn.withCommitLock(tableDir) {
      val now = GraftTxn.dataFiles(tableDir)
      if (now != before)
        throw new GraftTxn.CommitConflictException(tableDir.getName,
          (before diff now) ++ (now diff before))
      GraftTxn.snapshotCurrent(tableDir) // the restore is itself undoable
      val want = GraftTxn.dataFiles(snap)
      (want diff now).foreach { n =>
        val target = new File(tableDir, n)
        Option(target.getParentFile)
          .foreach(p => if (!p.isDirectory) p.mkdirs()) // partition dirs
        val src = new File(snap, n).toPath
        try Files.createLink(target.toPath, src)
        catch { case _: UnsupportedOperationException |
            _: java.nio.file.FileSystemException =>
          Files.copy(src, target.toPath,
            StandardCopyOption.REPLACE_EXISTING): Unit
        }
      }
      (now diff want).foreach(n => new File(tableDir, n).delete())
      val snapSchema = new File(snap, GraftCatalog.SchemaFile)
      if (snapSchema.isFile)
        Files.copy(snapSchema.toPath,
          new File(tableDir, GraftCatalog.SchemaFile).toPath,
          StandardCopyOption.REPLACE_EXISTING): Unit
      // deletion-vector state is part of a version (round 15): restore
      // swaps the live sidecar tree for the snapshot's
      val liveDv = GraftDv.dvRoot(tableDir)
      if (liveDv.isDirectory) GraftTxn.rmTree(liveDv)
      val snapDv = new File(snap, GraftDv.DvDir)
      if (snapDv.isDirectory) GraftTxn.linkTree(snapDv, liveDv)
      GraftTxn.bumpVersion(tableDir)
      GraftTxn.pruneSnapshots(tableDir, GraftTxn.retention)
      GraftTxn.version(tableDir)
    }
  }

  /** Partition-scoped transactional OPTIMIZE (round 13, VERDICT r12
    * #7 — the 100-TB form [[compact]]'s scaladoc names): bin-pack ONLY
    * the hive-layout partition directories (`k=v` subdirs of
    * `tableDir`) whose names satisfy `where`, each to
    * ceil(bytes/targetBytes) files. Validation is PER-PARTITION set
    * equality under ONE table lock — a concurrent commit inside a
    * touched partition conflicts; commits in untouched partitions are
    * invisible to the validation and those partitions stay
    * byte-identical (never listed, never rewritten, never moved).
    * One version bump for the whole maintenance statement. Returns
    * (partitionName -> (filesBefore, filesAfter)) for the partitions
    * actually compacted; already-packed partitions are skipped and a
    * fully-skipped call does not bump the version.
    *
    * Scale shape: the heavy work (read + repartition + write per
    * qualifying partition) runs OUTSIDE the lock; the critical
    * section is file moves. At 100 TB `where` is the `OPTIMIZE ...
    * WHERE <partition predicate>` surface — only named partitions pay
    * I/O, the rest of the table is untouched by construction. */
  def compactPartitions(spark: SparkSession, tableDir: File,
      where: String => Boolean,
      targetBytes: Long = 262144L,
      clusterBySql: Option[String] = None): Map[String, (Int, Int)] = {
    require(tableDir.isDirectory, s"no partitioned table at $tableDir")
    // real partition metadata where available (round 14, VERDICT r13
    // #1): a graft table's declared spec pins which `k=` prefixes are
    // partitions — a stray `x=y` directory that is NOT in the spec is
    // not table data and is never compacted. Bare hive directories
    // (no spec file) keep the name-shape rule.
    val declared = GraftCatalog.partitionSpec(tableDir)
    val parts = Option(tableDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.contains("=") &&
        !f.getName.startsWith("_") &&
        (declared.isEmpty ||
          declared.exists(c => f.getName.startsWith(c + "="))) &&
        where(f.getName))
      .sortBy(_.getName)
    // heavy phase, outside the lock: stage each qualifying partition's
    // bin-packed rewrite under its own hidden side-dir
    val staged = parts.flatMap { p =>
      val before = GraftTxn.dataFiles(p)
      val bytes = before.toSeq.map(n => new File(p, n).length()).sum
      val bins = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      // a clustering request always rewrites (re-layout is the point —
      // the whole-table compact's rule, here per partition)
      if (clusterBySql.isEmpty && bins >= before.size) None
      else {
        val stage = GraftTxn.newStageDir(tableDir, s"compactp")
        val base = spark.read
          .option(GraftParquetTable.FieldIdReadConf, "true") // r15
          .parquet(
            before.toSeq.map(n => new File(p, n).getAbsolutePath): _*)
        // PER-PARTITION CLUSTERING (round 14): range-repartition AND
        // sort each partition's rows by the clustering expression, so
        // every output file owns a disjoint slice of the curve WITHIN
        // its partition — the `OPTIMIZE ... WHERE <partition> ZORDER
        // BY` combination (partition pruning from the dir, then
        // min/max file pruning inside it). The expression sees the
        // partition's DATA columns only (partition values live in the
        // path, constant within p — clustering on them is meaningless)
        val packed = clusterBySql match {
          case Some(e) =>
            val c = org.apache.spark.sql.functions.expr(e)
            base.repartitionByRange(bins, c).sortWithinPartitions(c)
          case None => base.repartition(bins)
        }
        packed.write.mode("append")
          .option(GraftParquetTable.FieldIdWriteConf, "true") // r15
          .parquet(stage.getAbsolutePath)
        Some((p, before, stage))
      }
    }
    if (staged.isEmpty) return Map.empty
    GraftTxn.commitHook()
    try GraftTxn.withCommitLock(tableDir) {
      // per-partition set validation: only the TOUCHED partitions'
      // file sets must be unchanged since staging
      staged.foreach { case (p, before, _) =>
        val now = GraftTxn.dataFiles(p)
        if (now != before)
          throw new GraftTxn.CommitConflictException(
            s"${tableDir.getName}/${p.getName}",
            (before diff now) ++ (now diff before))
      }
      // every-version-snapshotted invariant (round 14, ADVICE r13 #2):
      // the pre-optimize state must be time-travelable like every other
      // commit's, or a graft-cdc consumer's versionDiff(v-1, v) over
      // this commit throws "no snapshot"
      GraftTxn.snapshotCurrent(tableDir)
      val out = staged.map { case (p, before, stage) =>
        GraftTxn.promoteStage(stage, p) // promote first, delete after
        before.foreach(n => new File(p, n).delete())
        p.getName -> (before.size, GraftTxn.dataFiles(p).size)
      }.toMap
      GraftTxn.bumpVersion(tableDir)
      GraftTxn.pruneSnapshots(tableDir, GraftTxn.retention)
      out
    } finally staged.foreach { case (_, _, stage) => GraftTxn.rmTree(stage) }
  }
}
