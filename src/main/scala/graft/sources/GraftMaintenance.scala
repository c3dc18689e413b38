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
    * At 100 TB the same op runs per-partition with the same
    * arithmetic; the repartition is the only shuffle and its width IS
    * the output layout. */
  def compact(spark: SparkSession, tableDir: File,
      targetBytes: Long = 262144L): (Int, Int) = {
    require(tableDir.isDirectory, s"no graft table at $tableDir")
    val before = GraftTxn.dataFiles(tableDir)
    val totalBytes = before.toSeq.map(n => new File(tableDir, n).length()).sum
    val bins = math.max(1L,
      (totalBytes + targetBytes - 1) / targetBytes).toInt
    if (bins >= before.size) return (before.size, before.size)
    val stage = GraftTxn.newStageDir(tableDir, "compact")
    spark.read.parquet(
        before.toSeq.map(n => new File(tableDir, n).getAbsolutePath): _*)
      .repartition(bins)
      .write.mode("overwrite").parquet(stage.getAbsolutePath)
    GraftTxn.commitHook()
    GraftTxn.withCommitLock(tableDir) {
      val now = GraftTxn.dataFiles(tableDir)
      if (now != before) {
        GraftTxn.rmTree(stage)
        throw new GraftTxn.CommitConflictException(tableDir.getName,
          (before diff now) ++ (now diff before))
      }
      GraftTxn.snapshotCurrent(tableDir)
      before.foreach(n => new File(tableDir, n).delete())
      GraftTxn.promoteStage(stage, tableDir)
      GraftTxn.bumpVersion(tableDir)
      GraftTxn.pruneSnapshots(tableDir, GraftTxn.retention)
    }
    GraftTxn.rmTree(stage)
    (before.size, GraftTxn.dataFiles(tableDir).size)
  }

  /** VACUUM: drop retained snapshots beyond `retain` (oldest first),
    * under the lock. Returns the number of snapshot dirs removed.
    * The disk-reclaim counterpart of time travel — after a vacuum,
    * `VERSION AS OF` on a dropped version errors with the retained
    * list instead of silently reading stale bytes. */
  def vacuum(tableDir: File, retain: Int): Int = {
    require(tableDir.isDirectory, s"no graft table at $tableDir")
    GraftTxn.withCommitLock(tableDir) {
      val beforeVs = GraftTxn.snapshotVersions(tableDir)
      GraftTxn.pruneSnapshots(tableDir, retain)
      beforeVs.size - GraftTxn.snapshotVersions(tableDir).size
    }
  }
}
