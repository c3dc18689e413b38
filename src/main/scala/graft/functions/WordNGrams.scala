package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Array-building core shared by the interpreted and codegen paths of
  * [[WordNGrams]]. Kept in its own object (no companion class) so the
  * generated Java can call it as a plain static method. */
object NGramUtil {
  /** (pos, ngram) struct rows for the word n-grams of `text`.
    * Matches `TextPipeline.ngramsCol` + posexplode exactly: words are
    * single-space splits with empties kept (Spark split semantics,
    * limit -1), a document shorter than n words yields an empty array,
    * and each n-gram is the space-join of words[i..i+n-1]. With
    * `distinct`, only the first occurrence of each n-gram is emitted
    * (per-row dedup — the no-shuffle trick the shingle pipeline needs). */
  def build(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    // null-safe here, not only in the expression guard: GenerateExec's
    // whole-stage codegen inlines the generator's value expression
    // without re-checking the child's null flag
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val words = text.toString.split(" ", -1)
    val total = words.length - n + 1
    if (total <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[AnyRef](total)
    val seen = if (distinct) new java.util.HashSet[String]() else null
    val sb = new java.lang.StringBuilder
    var i = 0
    var pos = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val g = sb.toString
      if (seen == null || seen.add(g)) {
        out.add(InternalRow(pos, UTF8String.fromString(g)))
        pos += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Native Catalyst Generator (UDTF tier): word n-grams of a text column
  * as (pos, ngram) rows — the lateral-view primitive under the text
  * pipeline (l6 contract row, shingle builds).
  *
  * Why not the `transform`+`posexplode` chain it replaces: higher-order
  * functions evaluate their lambda through the interpreter
  * (CodegenFallback), paying per-element expression dispatch plus an
  * array_join+slice per n-gram. As a [[CollectionGenerator]] this stays
  * inside GenerateExec's whole-stage codegen: one static call builds the
  * row array in a tight loop, and the surrounding operators consume it
  * without leaving generated code.
  *
  * `distinct = true` emits per-document distinct n-grams (first
  * occurrence), replacing `array_distinct` BEFORE the explode — dedup
  * stays row-local, so the shingle pipeline still never shuffles for it. */
case class WordNGrams(child: Expression, n: Int, distinct: Boolean = false)
    extends UnaryExpression with CollectionGenerator {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def prettyName: String = "graft_ngrams"
  override val inline: Boolean = true
  override def position: Boolean = false
  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))
  override def collectionType: DataType =
    ArrayType(elementSchema, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) {
      Iterator.empty
    } else {
      val arr = NGramUtil.build(t.asInstanceOf[UTF8String], n, distinct)
      (0 until arr.numElements()).iterator
        .map(i => arr.getStruct(i, 2))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NGramUtil.build($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {
  import org.apache.spark.sql.GraftBridge

  /** (pos, ngram) generator column — select alongside other columns and
    * alias the two output fields: `df.select(col("id"),
    * WordNGrams.ngrams(col("text"), 3).as(Seq("pos", "ngram")))`. */
  def ngrams(text: Column, n: Int, distinct: Boolean = false): Column =
    GraftBridge.column(WordNGrams(GraftBridge.expression(text), n, distinct))
}
