package org.apache.spark.sql

import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.spark.TaskContext
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.ArrowUtils
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnVector, ColumnarBatch}

import scala.jdk.CollectionConverters._

/** The Arrow-vectorized batch seam, JVM-side — `mapInArrow`'s shape for
  * a Scala-first library.
  *
  * Spark's pandas/Arrow UDF tier (`ArrowEvalPython` / `mapInPandas`) is
  * a PySpark-CLIENT feature: the Python function is pickled by the
  * Python driver process, so a Scala library has no public API to
  * register one, and this environment forbids a Python runtime
  * dependency in library code (SURVEY §2.10 documents the boundary).
  * What a production model-scoring worker actually consumes, though, is
  * not Python — it is COLUMNAR ARROW BATCHES. This operator exposes
  * exactly that seam in-JVM: each partition's rows are encoded into
  * Arrow `VectorSchemaRoot` batches of `batchSize` rows with Spark's own
  * ArrowWriter (the identical wire format `mapInArrow` ships to Python
  * workers), the caller's batch kernel fills a pre-allocated output
  * root, and the results flow back as InternalRows — schema, batching,
  * memory lifecycle and the columnar access pattern are all the real
  * thing; only the kernel body differs (a JNI model, an out-of-process
  * Arrow-IPC worker, or plain JVM loops as in f23's scorer).
  *
  * Scale shape: pure mapPartitions — no shuffle, no driver round-trip;
  * Arrow memory is bounded by ONE input + ONE output batch per task
  * (roots are reused across batches via allocateNew), and the child
  * allocator is closed by a task-completion listener. At 100 TB this
  * runs one kernel instance per core with zero cross-task state.
  */
object GraftArrow {

  /** Apply `kernel` to Arrow-encoded batches of `df`. The kernel
    * receives the filled input root (rowCount set) and an output root
    * whose vectors it must populate (fixed `outSchema`), returning the
    * output row count. Output rows are re-encoded as UnsafeRows, so
    * downstream operators see a normal scan. */
  def mapInArrowBatches(df: DataFrame, outSchema: StructType,
      batchSize: Int)(
      kernel: (VectorSchemaRoot, VectorSchemaRoot) => Int): DataFrame = {
    require(batchSize >= 1, "batchSize >= 1")
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    val inSchema = df.schema
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val rdd = df.asInstanceOf[classic.Dataset[Row]]
      .queryExecution.toRdd.mapPartitions { it =>
        val allocator = ArrowUtils.rootAllocator
          .newChildAllocator("graftArrowSeam", 0, Long.MaxValue)
        val inRoot = VectorSchemaRoot.create(
          ArrowUtils.toArrowSchema(inSchema, tz, true, false), allocator)
        val outRoot = VectorSchemaRoot.create(
          ArrowUtils.toArrowSchema(outSchema, tz, true, false), allocator)
        Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] {
          _ => inRoot.close(); outRoot.close(); allocator.close()
        })
        val writer = ArrowWriter.create(inRoot)
        val proj = UnsafeProjection.create(outSchema)
        new Iterator[Iterator[InternalRow]] {
          override def hasNext: Boolean = it.hasNext
          override def next(): Iterator[InternalRow] = {
            writer.reset()
            var n = 0
            while (it.hasNext && n < batchSize) {
              writer.write(it.next()); n += 1
            }
            writer.finish()
            outRoot.allocateNew()
            val m = kernel(inRoot, outRoot)
            outRoot.setRowCount(m)
            val cols: Array[ColumnVector] = outRoot.getFieldVectors.asScala
              .map(v => new ArrowColumnVector(v): ColumnVector).toArray
            val batch = new ColumnarBatch(cols, m)
            // copy through an UnsafeProjection: the Arrow buffers are
            // reused by the next batch, so rows must own their bytes
            batch.rowIterator().asScala.map(r => proj(r).copy())
              .toArray.iterator
          }
        }.flatten
      }
    spark.internalCreateDataFrame(rdd, outSchema, isStreaming = false)
  }
}
