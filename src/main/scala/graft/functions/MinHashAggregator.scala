package graft.functions

import org.apache.spark.sql.{Column, Encoder, functions => F}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Corpus-level MinHash sketch: the elementwise minimum of per-document
  * MinHash signatures is exactly the MinHash signature of the UNION of
  * the documents' shingle sets — so a groupBy with this aggregator yields
  * one near-dup sketch per group (source, shard, day, …) that can be
  * compared across corpora without touching the documents again.
  *
  * This is the `Aggregator[IN, BUF, OUT]` face of the engine (SURVEY.md
  * §2.2/§7.4 — the reference has no UDAF surface; the extended set adds
  * sketch aggregation): merge is elementwise min — associative,
  * commutative, map-side combinable, constant-size state. At 100 TB the
  * shuffle carries `perms` longs per group, not documents.
  */
class MinHashUnion(val perms: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  private val SENTINEL = 1000000007L // empty-set signature value (= P)

  override def zero: Array[Long] = Array.fill(perms)(SENTINEL)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    if (sig != null) {
      // a perms mismatch between minhash_sig and minhash_union would
      // silently yield sentinel-only (empty-set) sketches if skipped
      require(sig.length == perms,
        s"minhash_union(perms=$perms) fed a signature of length ${sig.length}")
      var i = 0
      while (i < perms) {
        val v = sig(i)
        if (v < buf(i)) buf(i) = v
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < perms) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object MinHashUnion {
  /** Column form: `minhash_union(sigCol)` over a group. */
  def minhash_union(sig: Column, perms: Int): Column =
    F.udaf(new MinHashUnion(perms)).apply(sig)
}
