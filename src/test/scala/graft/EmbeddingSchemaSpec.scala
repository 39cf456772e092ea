package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The embedding-column twin of [[EpochMicrosSpec]]: the driver has
  * regenerated the harness parquet with a new physical type once
  * already (round 9, `ts`), so pin that the ANN plumbing tolerates the
  * plausible embedding regen — `list<float>` today, `list<double>`
  * tomorrow. Every consumer routes arithmetic through
  * `Similarity.asDouble` / the fused [[graft.functions.CosineSim]]
  * (inputTypes `array<double>`, implicit-cast), so identical values
  * under either physical element type must fold to identical cosines.
  */
class EmbeddingSchemaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("float and double physical embeddings fold to the same cosine") {
    import graft.operators.Similarity
    val vecsF = Seq(
      (1L, Array(0.25f, -0.5f, 0.125f, 1.0f)),
      (2L, Array(0.75f, 0.5f, -0.25f, 0.0f))).toDF("vec_id", "embedding")
    // same VALUES, double physical type — float literals are exact in
    // double, so both encodings carry identical reals (like the same
    // instant under both timestamp encodings)
    val vecsD = vecsF.withColumn("embedding",
      transform(col("embedding"), _.cast("double")))
    assert(vecsF.schema("embedding").dataType.simpleString == "array<float>")
    assert(vecsD.schema("embedding").dataType.simpleString == "array<double>")

    def cosines(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] = {
      val a = df.select(col("vec_id").as("ida"), col("embedding").as("va"))
      val b = df.select(col("vec_id").as("idb"), col("embedding").as("vb"))
      a.crossJoin(b).filter(col("ida") < col("idb"))
        .select(col("ida"), col("idb"),
          Similarity.cosine(Similarity.asDouble(col("va")),
            Similarity.asDouble(col("vb"))).as("cos"))
        .as[(Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    }
    val f = cosines(vecsF)
    val d = cosines(vecsD)
    assert(f.keySet == d.keySet && f.nonEmpty)
    f.foreach { case (k, v) =>
      assert(v == d(k), s"pair $k: float-physical $v != double-physical ${d(k)}")
    }
  }

  test("parquet round-trip under both element types reads back through the same query") {
    import graft.operators.Similarity
    val dir = java.nio.file.Files.createTempDirectory("emb_enc").toString
    val rows = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.6f, 0.8f)), (3L, Array(0.0f, 1.0f)))
    rows.toDF("vec_id", "embedding").write.mode("overwrite").parquet(s"$dir/f")
    rows.toDF("vec_id", "embedding")
      .withColumn("embedding", transform(col("embedding"), _.cast("double")))
      .write.mode("overwrite").parquet(s"$dir/d")
    def top1(path: String): Map[Long, Long] = {
      val df = spark.read.parquet(path)
      val q = df.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = df.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      q.crossJoin(c).filter(col("qid") =!= col("cid"))
        .withColumn("cos", Similarity.cosine(Similarity.asDouble(col("qv")),
          Similarity.asDouble(col("cv"))))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
            .orderBy(col("cos").desc, col("cid"))))
        .filter(col("rk") === 1)
        .select(col("qid"), col("cid")).as[(Long, Long)].collect().toMap
    }
    assert(top1(s"$dir/f") == top1(s"$dir/d"))
  }
}
