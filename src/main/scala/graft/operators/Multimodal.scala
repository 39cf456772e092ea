package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed partition-wise.
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * environment — see `StubDecoder`): the Spark-side plumbing is real and
  * tested — schema, batch shape (one iterator per partition, mirroring
  * `mapInPandas` batches), partitioning, and deterministic metadata
  * extraction that an exact oracle can check.
  *
  * At 100 TB the shape matters: media bytes stay columnar in parquet, the
  * decoder runs once per partition (amortized setup — exactly why
  * mapInPandas/mapPartitions beats a per-row UDF for heavy decoders), and
  * only small typed metadata leaves the stage.
  */
object Multimodal {

  /** Deterministic stand-in for a real media decoder (??? in production —
    * swap for an image/audio library). Derives pseudo metadata from the
    * bytes so tests and the oracle can verify the plumbing end-to-end:
    *  - "format": first byte interpreted as a magic tag
    *  - "width"/"height": byte-derived pseudo dimensions
    *  - content hash: polynomial rolling hash of the bytes (mod 1e9+7)
    */
  object StubDecoder {
    def decode(bytes: Array[Byte]): (String, Int, Int, Long) = {
      if (bytes == null || bytes.isEmpty) ("empty", 0, 0, 0L)
      else {
        // the stub treats media as UTF-8 text: magic/content-hash derive
        // from CODE POINTS so the SQL oracle (unicode()/codepoint fold)
        // computes the identical values on any input; height keeps the
        // raw BYTE length (the binary-side metadata)
        val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        val magic = if (text.isEmpty) 0 else text.codePointAt(0)
        val format = if (magic == '{') "json-ish" else if (magic < 0x80) "ascii" else "binary"
        val w = 1 + (magic % 16)
        val h = 1 + (bytes.length % 16)
        val hash = graft.functions.RollingHash.compute(text)
        (format, w, h, hash)
      }
    }
  }

  val metaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("content_hash", LongType)))

  /** Partition-wise media feature extraction: (media_id, media: binary) →
    * typed metadata. One decoder instantiation per partition (the
    * mapInPandas batch shape), constant memory per task.
    */
  def extractMeta(media: DataFrame): DataFrame = {
    val enc = Encoders.row(metaSchema)
    media.select(col("media_id"), col("media"))
      .mapPartitions { it =>
        // per-partition decoder setup would happen here (amortized)
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (fmt, w, h, hash) = StubDecoder.decode(bytes)
          Row(id, if (bytes == null) 0 else bytes.length, fmt, w, h, hash)
        }
      }(enc)
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("feature", ArrayType(DoubleType))))

  /** Media → embedding plumbing (the feature-extract stage of a
    * multimodal pipeline): one `dims`-dimensional pseudo-embedding per
    * item, derived deterministically from the stub decoder's content hash
    * (integer-hash per dimension scaled to (−0.5, 0.5) — the
    * [[Similarity.hyperplane]] recipe, so the SQL oracle reproduces every
    * value bit-for-bit). In production the body of the loop is the real
    * encoder (CLIP-style image tower, audio frontend); everything around
    * it — partition-wise batching with per-partition setup amortized,
    * columnar binary in, small dense vector out — is the real shape, and
    * the output feeds the [[Similarity]] ANN/dedup operators unchanged.
    */
  def extractFeatures(media: DataFrame, dims: Int = 16): DataFrame = {
    require(dims >= 1, s"dims must be positive, got $dims")
    val enc = Encoders.row(featureSchema)
    val P = 1000000007L
    media.select(col("media_id"), col("media"))
      .mapPartitions { it =>
        // per-partition encoder setup would happen here (amortized)
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (_, _, _, hash) = StubDecoder.decode(bytes)
          // floorMod, matching Similarity.hyperplane's pmod: the stub hash
          // is bounded in [0, P) so the product cannot overflow and the
          // sign-following % would agree, but a full-range 64-bit hash
          // source would wrap negative under % while the SQL twin errors —
          // floorMod keeps the expression non-negative by construction
          val f = Seq.tabulate(dims)(d =>
            Math.floorMod((hash + d + 1) * 2654435761L, P).toDouble / P - 0.5)
          Row(id, f)
        }
      }(enc)
  }

  /** Frame/patch sampling plumbing: split a binary blob into fixed-size
    * chunks with index — the shape of video frame-sampling, minus the real
    * codec. Pure narrow `explode`.
    */
  def sampleChunks(media: DataFrame, chunkSize: Int): DataFrame =
    media.select(
      col("media_id"),
      posexplode(split_binary_chunks(col("media"), chunkSize)).as(Seq("chunk_idx", "chunk")))

  private def split_binary_chunks(media: org.apache.spark.sql.Column, chunkSize: Int) = {
    val n = ceil(length(media).cast("double") / chunkSize).cast("int")
    val idx = when(n <= 0, array().cast("array<int>")).otherwise(sequence(lit(0), n - 1))
    transform(idx, i => substring(media, i * chunkSize + 1, lit(chunkSize)))
  }
}
