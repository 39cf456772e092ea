package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `token_stats(text)` — the five per-document token statistics the
  * curation operators live on, in ONE pass over the raw string:
  * `struct(n_tokens, n_distinct_tokens, n_bigrams, n_distinct_bigrams,
  * n_wchars)`.
  *
  * The HOF spelling (`size(toks)`, `size(array_distinct(toks))`,
  * `size(shingles)`, `size(array_distinct(shingles))`,
  * `aggregate(toks, 0L, acc + length)`) materializes the token array,
  * the bigram array, and two sorted-distinct copies per row — five array
  * builds for five scalars. This expression tokenizes once (whitespace
  * scan over the lowercased string — the separators are ASCII, so the
  * scan is char-exact) and counts distincts in hash sets.
  *
  * Bit-parity with the HOF form and the DuckDB oracle fragments:
  * tokenization is `lower(text)` split on runs of space/tab/LF/FF/CR
  * with empties dropped; bigrams are the `"a b"`-joined adjacent pairs;
  * `n_wchars` counts CODE POINTS per token (Spark `length`), not UTF-16
  * units. NULL text yields a NULL struct, matching the HOF chain's null
  * propagation.
  */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "token_stats"

  override def eval(input: InternalRow): Any =
    TokenStats.compute(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} = graft.functions.TokenStats.compute(
          ${childGen.isNull} ? null : ${childGen.value});
        boolean ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenStats {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct_tokens", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("n_distinct_bigrams", IntegerType, nullable = false),
    StructField("n_wchars", LongType, nullable = false)))

  private def isSep(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** One scan; static for codegen. Null in → null out. */
  def compute(text: UTF8String): InternalRow = {
    if (text == null) return null
    val s = text.toLowerCase.toString
    val n = s.length
    val tokens = new java.util.HashSet[String]()
    val bigrams = new java.util.HashSet[String]()
    var nTokens = 0
    var nWchars = 0L
    var prev: String = null
    var i = 0
    while (i < n) {
      while (i < n && isSep(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isSep(s.charAt(i))) i += 1
        val tok = s.substring(start, i)
        nTokens += 1
        nWchars += tok.codePointCount(0, tok.length)
        tokens.add(tok)
        if (prev != null) bigrams.add(prev + " " + tok)
        prev = tok
      }
    }
    val nBigrams = if (nTokens < 2) 0 else nTokens - 1
    new GenericInternalRow(Array[Any](
      nTokens, tokens.size, nBigrams, bigrams.size, nWchars))
  }

  def token_stats(text: Column): Column = toColumn(TokenStats(toExpression(text)))
}
