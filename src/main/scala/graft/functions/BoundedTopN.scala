package graft.functions

import org.apache.spark.sql.{Column, Encoder, functions => F}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-N: keeps the `n` best (score, id) pairs by
  * (score DESC, id ASC), with O(n) state per group at every point of the
  * aggregation.
  *
  * This is the scale spelling of "top N rows per key". The window
  * spelling (`row_number() OVER (PARTITION BY key ORDER BY …) <= n`)
  * shuffles EVERY row to its key's reducer and sorts the whole group
  * before discarding all but n — on a skewed key (one hot domain at
  * corpus scale) that reducer receives the domain's entire row set. This
  * aggregator is associative and map-side combinable: each map partition
  * collapses to ≤ n pairs per key before the exchange, so the shuffle
  * carries at most n·partitions rows per key no matter how hot the key —
  * the same state-bound argument as the sketch family (MinHashUnion,
  * count_min_sketch), applied to ranking.
  *
  * Determinism: total order (score DESC, id ASC); merge is a sorted-list
  * merge, so the result is independent of partitioning and arrival
  * order. The buffer is a packed Array[Long] [s0,i0,s1,i1,…] kept in
  * rank order (n is a quota — small — so insertion by linear scan beats
  * heap bookkeeping and keeps the buffer encoder primitive).
  *
  * Redelivery discipline: an exactly-duplicate (score, id) pair —
  * an at-least-once streaming source replaying a row, or duplicated
  * batch input — is recognized in both reduce and merge and holds ONE
  * rank, never a second quota slot. On inputs with duplicated rows this
  * deliberately diverges from the window spelling (which ranks each row
  * instance); ids are unique in any real corpus, so the spellings agree
  * everywhere the equivalence is asserted.
  */
class BoundedTopN(val n: Int) extends Aggregator[(Long, Long), Array[Long], Seq[Long]] {
  require(n >= 1, s"top-n bound must be >= 1, got $n")

  /** (s1,i1) ranks strictly before (s2,i2). */
  @inline private def before(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
    if (in == null) return buf
    val (s, id) = in
    val k = buf.length >> 1
    // full and not better than the current worst: drop on the floor
    if (k == n && !before(s, id, buf(2 * k - 2), buf(2 * k - 1))) return buf
    // insertion position by rank order
    var pos = 0
    while (pos < k && before(buf(2 * pos), buf(2 * pos + 1), s, id)) pos += 1
    // an identical (score, id) pair is already ranked: a redelivered row
    // (at-least-once streaming source, duplicated batch input) must not
    // occupy a second rank or burn a second quota slot
    if (pos < k && buf(2 * pos) == s && buf(2 * pos + 1) == id) return buf
    val outLen = math.min(k + 1, n) * 2
    val out = new Array[Long](outLen)
    System.arraycopy(buf, 0, out, 0, 2 * pos)
    out(2 * pos) = s
    out(2 * pos + 1) = id
    System.arraycopy(buf, 2 * pos, out, 2 * pos + 2,
      math.min(2 * k, outLen - 2) - 2 * pos)
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val cap = math.min((a.length + b.length) >> 1, n) * 2
    val out = new Array[Long](cap)
    var ia = 0; var ib = 0; var io = 0
    while (io < cap && (ia < a.length || ib < b.length)) {
      // a pair present in BOTH buffers is one row seen twice — advance
      // both sides, emit once (same redelivery discipline as reduce)
      if (ia < a.length && ib < b.length &&
          a(ia) == b(ib) && a(ia + 1) == b(ib + 1)) {
        out(io) = a(ia); out(io + 1) = a(ia + 1); ia += 2; ib += 2
      } else {
        val takeA = ib >= b.length ||
          (ia < a.length && before(a(ia), a(ia + 1), b(ib), b(ib + 1)))
        if (takeA) { out(io) = a(ia); out(io + 1) = a(ia + 1); ia += 2 }
        else { out(io) = b(ib); out(io + 1) = b(ib + 1); ib += 2 }
      }
      io += 2
    }
    if (io == cap) out else java.util.Arrays.copyOf(out, io)
  }

  /** Kept ids in rank order (best first). */
  override def finish(buf: Array[Long]): Seq[Long] = {
    val ids = new Array[Long](buf.length >> 1)
    var i = 0
    while (i < ids.length) { ids(i) = buf(2 * i + 1); i += 1 }
    ids.toSeq
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object BoundedTopN {
  /** Column form: ids of the group's `n` best (score DESC, id ASC) rows,
    * best first.
    *
    * INTEGRAL-SCORE CONTRACT: the input encoder is (Long, Long), and
    * Spark's implicit numeric cast will coerce a fractional score column
    * to bigint — silently truncating. Callers must pass an integral
    * score (scale fractional scores to integer units first); the
    * DataFrame-level face ([[graft.operators.Curation.sourceQuota]])
    * enforces this at plan time. Null inputs are rejected by the tuple
    * encoder at runtime — filter nulls upstream.
    */
  def bounded_top_n(score: Column, id: Column, n: Int): Column =
    F.udaf(new BoundedTopN(n)).apply(score, id)
}
