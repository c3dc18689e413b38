package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature aggregate: one pass over a group's hashed
  * shingles produces the full `numPerms`-wide signature as a single
  * `array<bigint>` column.
  *
  * Why not 128 × `min((a*h+b) % p)` aggregate expressions (the obvious
  * declarative spelling): Catalyst plans that as a 128-column
  * HashAggregate whose generated update method is enormous — Janino
  * compile time dominates cold runs and the update loop defeats the JIT.
  * A TypedImperativeAggregate keeps one `Array[Long]` buffer per group,
  * updates it in a tight primitive loop, and only serializes at shuffle
  * boundaries (partial aggregation still applies, so shuffle volume is
  * #docs × numPerms × 8 bytes — identical to the declarative plan).
  *
  * Permutation streams replicate the declarative version bit-for-bit
  * (same seeded RNG draw order, same Java overflow-wrapping arithmetic),
  * so signatures — and therefore LSH candidates — are unchanged.
  */
case class MinHashAgg(
    child: Expression,
    numPerms: Int,
    seed: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val prime = 2147483647L

  // a odd in [1, 2^32), b in [1, 2^31) — same draws as the declarative
  // pipeline used (scala.util.Random(seed), two nextInt per perm)
  @transient private lazy val permA: Array[Long] = perms.map(_._1)
  @transient private lazy val permB: Array[Long] = perms.map(_._2)
  @transient private lazy val perms: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPerms)((rnd.nextInt(Int.MaxValue - 2).toLong * 2 + 1,
      rnd.nextInt(Int.MaxValue - 1).toLong + 1))
  }

  override def children: Seq[Expression] = Seq(child)
  // a group whose inputs are all null never updates the buffer; eval
  // returns null then (matching what per-column min() would produce)
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val as = permA; val bs = permB
      var i = 0
      while (i < numPerms) {
        val m = (as(i) * h + bs(i)) % prime
        if (m < buf(i)) buf(i) = m
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerms) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    // untouched buffer ⇒ no non-null input reached this group: any real
    // update writes (a*h+b) % prime < 2^31, far below the sentinel
    if (numPerms > 0 && buf(0) == Long.MaxValue) null
    else new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(numPerms * 8)
    var i = 0
    while (i < numPerms) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numPerms)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_minhash"
}

object MinHashAgg {
  /** Aggregate Column: MinHash signature (array<bigint>, length
    * `numPerms`) of the group's hashed-shingle column `h`. */
  def minhash(h: Column, numPerms: Int = 128, seed: Long = 42L): Column =
    GraftBridge.column(
      MinHashAgg(GraftBridge.expression(h), numPerms, seed)
        .toAggregateExpression())
}
