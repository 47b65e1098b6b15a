package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word k-grams WITH multiplicity (unlike [[WordShingles]], which
  * de-dups for set-Jaccard). Feeds corpus-level n-gram frequency
  * aggregation (graft.ops.CorpusStats.topNgrams), where per-doc counts
  * must be preserved. Codegen'd for the same reason as WordShingles:
  * the split + transform HOF chain is interpreted per row.
  */
case class WordNgrams(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    NgramStats.ngrams(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NgramStats.ngrams($c, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): WordNgrams = copy(child = newChild)

  override def prettyName: String = "word_ngrams"
}

/** Per-document k-gram repetition statistics in ONE compiled pass
  * (Gopher-style repetition quality signals): returns
  * struct(n_ngrams, max_count, dup_count) where
  *  - n_ngrams  = k-gram occurrences (max(tokens-k+1, 0)),
  *  - max_count = occurrences of the most frequent k-gram,
  *  - dup_count = total occurrences of k-grams appearing more than once.
  * Derived downstream: top-k-gram fraction = max_count / n_ngrams and
  * duplicate-k-gram fraction = dup_count / n_ngrams — the standard
  * "fraction of text in the most common / in any repeated n-gram"
  * pretraining filters. A HOF equivalent would sort + fold the n-gram
  * array per row interpreted; this is a single hash-count pass, O(n).
  */
case class NgramRepetition(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = NgramStats.statsType

  override def nullSafeEval(input: Any): Any =
    NgramStats.repetition(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NgramStats.repetition($c, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): NgramRepetition = copy(child = newChild)

  override def prettyName: String = "ngram_repetition"
}

object NgramStats {

  val statsType: StructType = StructType(Seq(
    StructField("n_ngrams", LongType, nullable = false),
    StructField("max_count", LongType, nullable = false),
    StructField("dup_count", LongType, nullable = false)))

  // tokenization + gram building delegate to WordShingles — the single
  // home of the oracle-contract trim/split(-1) semantics
  private def tokens(text: UTF8String): Array[String] =
    WordShingles.tokenize(text)

  private def gram(words: Array[String], i: Int, k: Int,
      sb: java.lang.StringBuilder): String =
    WordShingles.joinGram(words, i, k, sb)

  /** Java-callable entry for generated code: all k-grams in order. */
  def ngrams(text: UTF8String, k: Int): ArrayData = {
    val words = tokens(text)
    if (words.length < k) return new GenericArrayData(Array.empty[Any])
    val n = words.length - k + 1
    val out = new Array[Any](n)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      out(i) = UTF8String.fromString(gram(words, i, k, sb))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Java-callable entry for generated code: one-pass hash count. */
  def repetition(text: UTF8String, k: Int): InternalRow = {
    val words = tokens(text)
    val n = math.max(words.length - k + 1, 0)
    if (n == 0) return InternalRow(0L, 0L, 0L)
    val counts = new java.util.HashMap[String, Int](n * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      counts.merge(gram(words, i, k, sb), 1, Integer.sum(_, _))
      i += 1
    }
    var maxCount = 0L
    var dupCount = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toLong
      if (c > maxCount) maxCount = c
      if (c > 1) dupCount += c
    }
    InternalRow(n.toLong, maxCount, dupCount)
  }
}
