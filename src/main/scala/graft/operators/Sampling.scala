package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * Random `sample()` is useless in a reproducible corpus pipeline (and
  * unverifiable against an oracle): re-runs must keep exactly the same
  * rows, and distributed workers must agree without coordination. Both
  * come free from HASH-based sampling: a row is kept iff an affine hash
  * of its stable id lands under the stratum's threshold — embarrassingly
  * parallel, no shuffle, no RNG state, and exactly reproducible in ANSI
  * SQL. This is how corpus mixtures are actually pinned in large-scale
  * training pipelines.
  */
object Sampling {

  private val A = 48271L
  private val B = 11L
  private val M = 1000003L // prime > bucket space; id*A stays far below 2^63

  /** Per-mille sampling bucket (0..999) of a stable integer id. */
  def bucket(id: Column): Column = pmod(id * A + B, lit(M)) % 1000

  /** Keep each row iff its id-bucket < rateFor(stratum) ‰ — deterministic
    * stratified downsampling (per-language, per-source, …).
    */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
      ratesPerMille: Map[String, Int], defaultPerMille: Int): DataFrame = {
    val rate = ratesPerMille.foldRight(lit(defaultPerMille): Column) {
      case ((k, r), acc) => when(stratum === k, lit(r)).otherwise(acc)
    }
    df.filter(bucket(id) < rate)
  }
}
