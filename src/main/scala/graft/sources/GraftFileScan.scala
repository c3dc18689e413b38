package graft.sources

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Expression => VExpression, Literal => VLiteral}
import org.apache.spark.sql.connector.expressions.filter.{And => VAnd, Predicate}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Per-row `_file` provenance for graft parquet tables — the metadata
  * column the runtime (join-driven) MERGE group filter keys on
  * (VERDICT r10 #2; the Iceberg `_file` convention re-expressed over
  * Spark's own DSv2 parquet scan).
  *
  * Why re-split instead of a bespoke reader: Spark's parquet scan
  * plans [[FilePartition]]s whose
  * [[org.apache.spark.sql.execution.datasources.PartitionedFile]]s
  * each know their file, but one partition may coalesce several
  * files and the row stream carries no file-boundary markers. So the
  * tagged scan RE-SPLITS the inner scan's partitions so every
  * partition reads exactly one file (splits of one large file still
  * fan out — the constant holds per partition either way), then each
  * reader appends the partition's constant `_file` string to every
  * row. All parallelism below the per-file grain is preserved; above
  * it, a >1-file coalesced partition becomes N single-file partitions
  * (more, smaller tasks — fine here: tagged scans serve row-level
  * rewrites and group-filter subqueries, and at the 100-TB grain
  * files are large enough that partitions are single-file splits
  * already). */
object GraftFileScan {
  val FileColumnName = "_file"

  val fileField: StructField = StructField(FileColumnName, StringType,
    nullable = false)

  /** The `_file` string for one single-file partition: the url-encoded
    * spelling (identical to `input_file_name()`), so
    * `new File(new URI(s))` recovers the local path — the same
    * decoding the static group-pruning path already uses. */
  def fileOf(p: InputPartition): String = p match {
    case fp: FilePartition => fp.files.head.filePath.urlEncoded
    case other => sys.error(
      s"GraftFileScan expects FilePartition, got ${other.getClass}")
  }

  /** V2 runtime-filter predicate → allowed `_file` set. Handles the
    * shapes `translateRuntimeFilterV2` emits (IN / = over the single
    * filter attribute, AND of those); anything else returns None and
    * the predicate is IGNORED — sound in both directions (a skipped
    * filter only widens the scanned and committed group). */
  def toFileSet(p: Predicate): Option[Set[String]] = {
    def isFileRef(e: VExpression): Boolean = e match {
      case n: NamedReference =>
        n.fieldNames().sameElements(Array(FileColumnName))
      case _ => false
    }
    def str(e: VExpression): Option[String] = e match {
      case l: VLiteral[_] =>
        Option(CatalystTypeConverters.convertToScala(l.value, l.dataType))
          .map(_.toString)
      case _ => None
    }
    p match {
      case a: VAnd =>
        (toFileSet(a.left()), toFileSet(a.right())) match {
          case (Some(l), Some(r)) => Some(l.intersect(r))
          case (l, r) => l.orElse(r)
        }
      case _ => p.name() match {
        case "IN" if p.children().nonEmpty && isFileRef(p.children()(0)) =>
          val vals = p.children().tail.flatMap(str)
          // a non-literal element would under-approximate the set —
          // bail to "no filtering" instead
          if (vals.length == p.children().length - 1) Some(vals.toSet)
          else None
        case "=" if p.children().length == 2 =>
          if (isFileRef(p.children()(0))) str(p.children()(1)).map(Set(_))
          else if (isFileRef(p.children()(1))) str(p.children()(0)).map(Set(_))
          else None
        case _ => None
      }
    }
  }
}

/** The regular read path of a graft table with `_file` awareness:
  * behaves exactly like Spark's own [[ParquetScanBuilder]] (same
  * pushdown, same pruning, same vectorized scan) unless the required
  * columns include the `_file` metadata column — then the built scan
  * is the tagged subclass so each row carries its file. This is what
  * lets the runtime group-filter SUBQUERY (a plain read of the
  * original table projecting `_file`) plan against the stock parquet
  * machinery. */
private[sources] class GraftFileScanBuilder(ss: SparkSession,
    fileIndex: PartitioningAwareFileIndex, schema: StructType,
    dataSchema: StructType, options: CaseInsensitiveStringMap)
  extends ParquetScanBuilder(ss, fileIndex, schema, dataSchema, options) {

  private var withFile = false

  override def pruneColumns(requiredSchema: StructType): Unit = {
    withFile = requiredSchema.fieldNames.contains(GraftFileScan.FileColumnName)
    super.pruneColumns(StructType(requiredSchema.fields.filterNot(
      _.name == GraftFileScan.FileColumnName)))
  }

  override def build(): ParquetScan = {
    val inner = super.build()
    if (withFile) new GraftTaggedParquetScan(inner) else inner
  }
}

/** A [[ParquetScan]] that re-splits its partitions to one file each
  * and appends the constant `_file` column to every row.
  * `onRuntimeFilter` (the row-level operation's group handshake)
  * observes every runtime narrowing so a MERGE commit deletes exactly
  * the files the statement actually touched.
  *
  * Runtime filtering contract ([[SupportsRuntimeV2Filtering]]):
  * Spark's RowLevelOperationRuntimeGroupFiltering plans
  * `Aggregate(_file)` over the target⋈source matching rows as a
  * dynamic-pruning subquery; BatchScanExec delivers the result here
  * as `IN(_file, …)` before re-planning partitions. `filter` only
  * ever INTERSECTS (monotone narrowing), and an unparseable predicate
  * is ignored — the group can only stay the same or shrink, never
  * grow past the static set or miss a matching file. */
private[sources] class GraftTaggedParquetScan(inner: ParquetScan,
    private val onRuntimeFilter: Set[File] => Unit = _ => ())
  extends ParquetScan(inner.sparkSession, inner.hadoopConf,
    inner.fileIndex, inner.dataSchema, inner.readDataSchema,
    inner.readPartitionSchema, inner.pushedFilters, inner.options,
    inner.pushedAggregate, inner.partitionFilters, inner.dataFilters,
    inner.pushedVariantExtractions)
  with SupportsRuntimeV2Filtering {

  @volatile private var allowed: Option[Set[String]] = None

  override def readSchema(): StructType =
    StructType(super.readSchema().fields :+ GraftFileScan.fileField)

  override def description(): String =
    s"graft-file-tagged(${super.description()})"

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(GraftFileScan.FileColumnName))

  override def filter(predicates: Array[Predicate]): Unit = {
    val sets = predicates.flatMap(GraftFileScan.toFileSet)
    if (sets.nonEmpty) {
      val next = sets.reduce(_ intersect _)
      val merged = allowed.fold(next)(_ intersect next)
      allowed = Some(merged)
      onRuntimeFilter(merged.map(s => new File(new java.net.URI(s))))
      if (GraftDebug.enabled)
        println(s"GraftTaggedParquetScan runtime filter -> " +
          s"${merged.size} files")
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val perFile = super.planInputPartitions().iterator.flatMap {
      case fp: FilePartition =>
        fp.files.groupBy(_.filePath.urlEncoded).valuesIterator
      case other => sys.error(
        s"GraftTaggedParquetScan expects FilePartitions, got ${other.getClass}")
    }.zipWithIndex.map { case (fs, i) =>
      FilePartition(i, fs.toArray): InputPartition
    }.toArray
    allowed match {
      case Some(ok) =>
        perFile.filter(p => ok.contains(GraftFileScan.fileOf(p)))
      case None => perFile
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftTaggedReaderFactory(super.createReaderFactory())

  // a tagged scan is never plan-equal to the stock scan it wraps —
  // exchange/scan reuse must not substitute one for the other. The
  // group-filter CALLBACK is part of identity too (ADVICE r11): two
  // field-equal tagged scans carrying different callbacks must not
  // deduplicate, or a reused scan could feed its runtime narrowing to
  // the wrong row-level operation's groupFiles and the commit's delete
  // set would diverge from the actually scanned file set.
  override def equals(obj: Any): Boolean = obj match {
    case g: GraftTaggedParquetScan =>
      super.equals(g) && (g.onRuntimeFilter eq onRuntimeFilter)
    case _ => false
  }
  override def hashCode(): Int =
    (super.hashCode() * 31 + 1) * 31 +
      System.identityHashCode(onRuntimeFilter)
}

/** Appends the partition-constant `_file` string to each row of the
  * inner (row-based) parquet reader. Columnar reads are declined so
  * the inner factory takes its row path — acceptable here because
  * tagged scans only serve row-level rewrites and group-filter
  * subqueries, whose inputs are the affected-file group, not the
  * table. */
private[sources] class GraftTaggedReaderFactory(
    inner: PartitionReaderFactory) extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean =
    false

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val tag = new GenericInternalRow(
      Array[Any](UTF8String.fromString(GraftFileScan.fileOf(partition))))
    val r = inner.createReader(partition)
    new PartitionReader[InternalRow] {
      private val joined = new JoinedRow
      override def next(): Boolean = r.next()
      override def get(): InternalRow = joined(r.get(), tag)
      override def close(): Unit = r.close()
    }
  }
}
