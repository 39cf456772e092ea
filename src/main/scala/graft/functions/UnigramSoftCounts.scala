package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.math.BigInteger

/** `unigram_soft_counts(word)` — the SOFT-EM E-step of the unigram-LM
  * trainer (Kudo, ACL 2018 §3.2 step 2, the forward–backward
  * formulation SentencePiece actually implements): per-piece EXPECTED
  * occurrence counts over the word's FULL segmentation lattice, not
  * just the Viterbi best path ([[UnigramSegment]] — the hard-EM
  * approximation the round-13/14 verdicts asked to go beyond).
  *
  * EXACTNESS CONTRACT (the [[graft.operators.Importance]] discipline —
  * integer arithmetic end to end so the DuckDB gate is exact equality):
  * the real-valued model p(piece) = n_occ/total is quantized ONCE to
  * `q(piece) = max(1, ⌊n_occ · 2^probBits / total⌋)` (the max-1 clamp
  * keeps every vocabulary piece reachable, so the lattice total is
  * never 0); the quantized model IS the model on both engines. With
  * S = 2^probBits, the scaled forward/backward integers
  *
  *   A[i] = Σ_{p ends at i, |p|=k} A[i−k]·q(p)·S^(k−1)   (A[0] = 1)
  *   B[r] = Σ_{p starts at len−r, |p|=k} q(p)·S^(k−1)·B[r−k]  (B[0] = 1,
  *          r = distance from word END — the oracle's unroll index)
  *
  * are exactly alpha[i]·S^i and beta[len−r]·S^r, so every occurrence of
  * p as word[i+1..i+k] contributes posterior mass
  * A[i]·q(p)·S^(k−1)·B[len−i−k] / A[len] — a ratio of INTEGERS, and
  * the emitted `e_q = ⌊scale · Σ_occ mass⌋` is integer-exact
  * cross-engine. The numerators live in BigInteger here, HUGEINT in
  * the oracle, so the LARGEST oracle intermediate — `scale · numer(p)`
  * — must stay under 127 bits. The bound (round-15 advice tightened
  * it to include the scale multiplier and segmentation-count growth):
  * q ≤ S ⇒ alpha[i] ≤ #segmentations(prefix) ≤ 2^(i−1), so
  * A[n] ≤ 2^(n−1)·S^n, and Σ_p numer(p) = A[n]·E_total with
  * E_total ≤ n, giving bits(scale·numer) ≤ (n−1) + n·probBits +
  * ⌈log₂ n⌉ + ⌈log₂ scale⌉ — at the fixture regime (n = 8,
  * probBits = 8, scale = 10⁶) that is 7 + 64 + 3 + 20 = 94 bits,
  * 33 to spare even at an all-high-q vocabulary. [[compute]] also
  * guards the EXACT value at emission (`bitLength ≤ 126`), so a
  * regime that would overflow the DuckDB mirror fails loudly
  * engine-side instead of desynchronizing. Expected counts are summed over
  * the lattice; Σ_p E(p) is the expected PIECE COUNT of a random
  * segmentation drawn from the posterior — between 1 and len(word).
  *
  * A single character absent from the vocabulary gets q = 1 (the
  * [[UnigramSegment]] UNK convention), keeping the lattice total on
  * ANY input; on the fit corpus the seed vocabulary covers every
  * single char and the branch never fires (oracle-side: no UNK CTE —
  * a fixture drift desynchronizes loudly, the uniHorizon discipline).
  *
  * Input contract: ONE word (no whitespace) — the expression runs over
  * the DISTINCT-WORD table, never the corpus (the corpus-sized pass is
  * the word hash-agg; corpus weighting multiplies `cnt · e_q`
  * afterwards, exact because both factors are integers). Output:
  * array<struct<piece, e_q>> sorted by piece (UTF-8 binary), pieces
  * with e_q = 0 after flooring included whenever they occur in the
  * lattice (the caller's aggregate decides what to do with zeros).
  */
case class UnigramSoftCounts(child: Expression, pieces: Seq[(String, Long)],
    total: Long, probBits: Int = 8, scale: Long = 1000000L)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("piece", StringType, nullable = false),
    StructField("e_q", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "unigram_soft_counts"

  private lazy val model: UnigramSoftCounts.Model =
    UnigramSoftCounts.model(pieces, total, probBits, scale)

  override protected def nullSafeEval(input: Any): Any =
    UnigramSoftCounts.compute(input.toString, model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("model", model,
      classOf[UnigramSoftCounts.Model].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnigramSoftCounts.compute($c.toString(), $mRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramSoftCounts {

  /** Frozen quantized model: piece → q (≥ 1), max piece length, S. */
  final class Model(val q: java.util.HashMap[String, java.lang.Long],
      val maxLen: Int, val probBits: Int, val scale: Long) extends Serializable

  def model(pieces: Seq[(String, Long)], total: Long, probBits: Int,
      scale: Long): Model = {
    require(total > 0, s"total must be positive, got $total")
    require(probBits >= 1 && probBits <= 20,
      s"probBits must be in [1, 20], got $probBits")
    require(scale > 0, s"scale must be positive, got $scale")
    val m = new java.util.HashMap[String, java.lang.Long]()
    var maxLen = 1
    pieces.foreach { case (p, n) =>
      require(n >= 0, s"negative n_occ for piece '$p'")
      // BigInteger shift: n · 2^probBits can exceed Long at corpus scale
      val qv = BigInteger.valueOf(n).shiftLeft(probBits)
        .divide(BigInteger.valueOf(total)).max(BigInteger.ONE).longValueExact()
      m.put(p, java.lang.Long.valueOf(qv))
      if (p.length > maxLen) maxLen = p.length
    }
    new Model(m, maxLen, probBits, scale)
  }

  /** q(word[from, until)) — vocabulary lookup with the single-char UNK
    * floor; null when the span is no piece at all.
    */
  private def qOf(word: String, from: Int, until: Int, m: Model): BigInteger = {
    val piece = word.substring(from, until)
    val v = m.q.get(piece)
    if (v != null) BigInteger.valueOf(v.longValue())
    else if (until - from == 1) BigInteger.ONE // UNK single char
    else null
  }

  /** Static for codegen: forward–backward over one word's lattice. */
  def compute(word: String, m: Model): GenericArrayData = {
    val n = word.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val sPow = new Array[BigInteger](m.maxLen) // S^0 .. S^(maxLen-1)
    sPow(0) = BigInteger.ONE
    var i = 1
    while (i < m.maxLen) { sPow(i) = sPow(i - 1).shiftLeft(m.probBits); i += 1 }

    val a = new Array[BigInteger](n + 1) // A[i], scaled forward
    a(0) = BigInteger.ONE
    i = 1
    while (i <= n) {
      var acc = BigInteger.ZERO
      var k = 1
      val kMax = math.min(m.maxLen, i)
      while (k <= kMax) {
        val q = qOf(word, i - k, i, m)
        if (q != null && a(i - k).signum != 0)
          acc = acc.add(a(i - k).multiply(q).multiply(sPow(k - 1)))
        k += 1
      }
      a(i) = acc
      i += 1
    }
    val z = a(n)
    // the max-1 clamp + UNK floor make every position reachable, so a
    // zero lattice total means a piece longer than maxLen sneaked into
    // the model — impossible by construction, but fail LOUD not /0
    require(z.signum > 0, s"empty segmentation lattice for word '$word'")

    val b = new Array[BigInteger](n + 1) // B[r], r = distance from end
    b(0) = BigInteger.ONE
    var r = 1
    while (r <= n) {
      var acc = BigInteger.ZERO
      var k = 1
      val kMax = math.min(m.maxLen, r)
      while (k <= kMax) {
        // piece spans [n - r, n - r + k)
        val q = qOf(word, n - r, n - r + k, m)
        if (q != null && b(r - k).signum != 0)
          acc = acc.add(q.multiply(sPow(k - 1)).multiply(b(r - k)))
        k += 1
      }
      b(r) = acc
      r += 1
    }

    // numerators per distinct piece over every lattice occurrence
    val numer = new java.util.TreeMap[UTF8String, BigInteger]()
    i = 0
    while (i < n) {
      var k = 1
      val kMax = math.min(m.maxLen, n - i)
      while (k <= kMax) {
        val q = qOf(word, i, i + k, m)
        if (q != null) {
          val term = a(i).multiply(q).multiply(sPow(k - 1))
            .multiply(b(n - i - k))
          if (term.signum != 0) {
            val key = UTF8String.fromString(word.substring(i, i + k))
            val prev = numer.get(key)
            numer.put(key, if (prev == null) term else prev.add(term))
          }
        }
        k += 1
      }
      i += 1
    }

    val scaleB = BigInteger.valueOf(m.scale)
    val out = new Array[Any](numer.size())
    var j = 0
    val it = numer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prod = e.getValue.multiply(scaleB)
      // the DuckDB mirror computes this exact product in HUGEINT
      // (127-bit signed): fail loudly HERE rather than let the oracle
      // overflow on a regime the class doc's envelope bound missed
      require(prod.bitLength <= 126,
        s"scale*numer for piece '${e.getKey}' of word '$word' needs " +
          s"${prod.bitLength} bits — exceeds the oracle's HUGEINT envelope")
      val eq = prod.divide(z).longValueExact()
      out(j) = InternalRow(e.getKey, eq)
      j += 1
    }
    new GenericArrayData(out)
  }
}
