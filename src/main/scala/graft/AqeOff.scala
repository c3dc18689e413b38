package graft

import org.apache.spark.sql.SparkSession

/** Ref-counted session-scoped AQE-off sections (round 17).
  *
  * Engine phases and eager iterative cuts run tiny fixed-shape queries
  * where AQE adds one driver-round-trip job per exchange; scoping
  * `spark.sql.adaptive.enabled=false` around them cuts that fixed cost
  * (see GraftTxn.describedNoAqe / Checkpoints.withAqeOff). Session conf
  * is GLOBAL, though, and the commit protocol is exercised by
  * CONCURRENT statements (Round14Spec's conflict tests): two plain
  * set/restore scopes interleaving non-LIFO across threads would
  * capture each other's "off" state as the restore value and leave AQE
  * permanently disabled on the session. This object makes the section
  * re-entrant and thread-safe: the FIRST scope in saves the session's
  * real values and flips the confs, nested/concurrent scopes only bump
  * a counter, and the LAST scope out restores. The
  * `spark.graft.aqe.freeze` marker keeps [[Tables.tune]] (reached via
  * loaders inside a section) from re-enabling AQE mid-scope. */
object AqeOff {
  private val ThresholdKey =
    "spark.sql.sources.parallelPartitionDiscovery.threshold"
  /** session → (active scope count, saved (freeze, adaptive, threshold)) */
  private val state =
    new java.util.WeakHashMap[SparkSession, (Int, (String, String, String))]()

  def apply[T](spark: SparkSession)(body: => T): T = {
    val c = spark.conf
    state.synchronized {
      state.get(spark) match {
        case null =>
          val saved = (c.get("spark.graft.aqe.freeze", "false"),
            c.get("spark.sql.adaptive.enabled", "true"),
            c.get(ThresholdKey, "32"))
          state.put(spark, (1, saved))
          c.set("spark.graft.aqe.freeze", "true")
          c.set("spark.sql.adaptive.enabled", "false")
          // engine phases read EXPLICIT file lists the protocol already
          // enumerated — the default threshold (32) turns listing >32
          // such paths into a Spark job; driver stat calls are strictly
          // cheaper at engine list sizes
          c.set(ThresholdKey, "100000")
        case (n, saved) => state.put(spark, (n + 1, saved))
      }
    }
    try body
    finally state.synchronized {
      state.get(spark) match {
        case null => () // session collected mid-scope — nothing to restore
        case (1, (f, a, t)) =>
          state.remove(spark)
          c.set("spark.graft.aqe.freeze", f)
          c.set("spark.sql.adaptive.enabled", a)
          c.set(ThresholdKey, t)
        case (n, saved) => state.put(spark, (n - 1, saved))
      }
    }
  }
}
