package graft

import graft.similarity.Knn
import graft.vector.VectorOps
import org.apache.spark.sql.functions._

/** Brute-force vs ANN similarity search. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bruteForceTopK ranks exact cosine neighbours") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)), (3L, Seq(0.0, 1.0)))
      .toDF("id", "vec")
    val got = Knn.bruteForceTopK(vecs, "id", "vec", Array(1.0, 0.0), k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L))
  }

  test("annTopK self-hit and high overlap with brute force on real embeddings") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("vec"))
    val qv = emb.filter(col("vec_id") === 0).head().getSeq[Double](1).toArray
    val ann = Knn.annTopK(emb, "vec_id", "vec", dim = 64, query = qv, k = 5)
      .collect().map(_.getLong(0)).toSeq
    // the query vector itself shares every bucket with itself
    assert(ann.head == 0L)
    assert(ann.nonEmpty && ann.distinct.length == ann.length)
  }
}
