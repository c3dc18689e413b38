package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Misra-Gries heavy-hitters sketch: one pass over a group's
  * items keeps at most `k` counters and returns them as
  * `array<struct<item string, est bigint>>`, sorted (est desc, item asc).
  *
  * Guarantee (Misra & Gries 1982; mergeable per Agarwal et al. 2012,
  * "Mergeable Summaries", PODS): for every item,
  * `true_count - n/(k+1) <= est <= true_count` where n is the total
  * item count — so every item with frequency above n/(k+1) is present
  * in the output, and the bound survives arbitrary merge trees, which
  * is exactly what Spark's partial/final aggregation performs. The
  * vocabulary-building primitive of a corpus pipeline: top terms at
  * 100 TB with k×(counter) state per partition instead of a full
  * word count shuffle.
  *
  * Buffer is a plain HashMap; the decrement-all step amortizes to O(1)
  * per update. Partial aggregation applies: shuffle volume is
  * groups × k entries, independent of row count.
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def decrementAll(buf: mutable.HashMap[String, Long], by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[String]
    for ((key, c) <- buf) {
      if (c - by <= 0L) dead += key else buf(key) = c - by
    }
    dead.foreach(buf.remove)
  }

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf(item) = c + 1L
        case None if buf.size < k => buf(item) = 1L
        case None => decrementAll(buf, 1L)
      }
    }
    buf
  }

  /** Merge = sum counters, then if over k survive only the top k by
    * subtracting the (k+1)-th largest total from every counter — the
    * Agarwal et al. merge that preserves the n/(k+1) error bound. */
  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    for ((key, c) <- b) a(key) = a.getOrElse(key, 0L) + c
    if (a.size > k) {
      // subtracting the (k+1)-th largest zeroes it and everything at or
      // below it, so at most k strictly-larger counters survive
      val kth = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      decrementAll(a, kth)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray
      .sortBy { case (item, est) => (-est, item) }
      .map { case (item, est) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(item), est))
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  // length-prefixed UTF-8 bytes, NOT writeUTF: writeUTF throws on items
  // whose modified-UTF-8 encoding exceeds 65535 bytes — a shuffle-time
  // task failure on pathological tokens
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    for ((key, c) <- buf) {
      val kb = key.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf(new String(kb, "UTF-8")) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_heavy_hitters"
}

object HeavyHittersAgg {
  /** Aggregate Column: Misra-Gries top-k candidates of a string column,
    * `array<struct<item,est>>` sorted (est desc, item asc). */
  def heavyHitters(item: Column, k: Int): Column =
    GraftBridge.column(
      HeavyHittersAgg(GraftBridge.expression(item), k).toAggregateExpression())
}
