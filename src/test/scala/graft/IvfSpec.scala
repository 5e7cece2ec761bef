package graft

import graft.similarity.{Ivf, Knn}
import graft.vector.VectorOps
import org.apache.spark.sql.functions._

/** IVF coarse-quantizer ANN: determinism and recall vs brute force. */
class IvfSpec extends SparkSpec {

  private def emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("vec"))

  test("training is deterministic and produces k centroids") {
    val m1 = Ivf.train(emb, "vec_id", "vec", k = 8, iters = 2)
    val m2 = Ivf.train(emb, "vec_id", "vec", k = 8, iters = 2)
    assert(m1.centroids.length == 8)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
  }

  test("probed search self-hits and overlaps brute force") {
    val qv = emb.filter(col("vec_id") === 0).head().getSeq[Double](1).toArray
    val model = Ivf.train(emb, "vec_id", "vec", k = 8, iters = 2)
    val ann = Ivf.topK(emb, "vec_id", "vec", model, qv, k = 10, nprobe = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(ann.head == 0L) // the query's own cell is always probed
    val brute = Knn.bruteForceTopK(emb, "vec_id", "vec", qv, k = 10)
      .collect().map(_.getLong(0)).toSet
    // random 64-dim corpus barely clusters; still expect real overlap
    assert(ann.count(brute.contains) >= 3, s"overlap too low: $ann")
  }

  test("nprobe=k degenerates to exact brute-force ranking") {
    val qv = emb.filter(col("vec_id") === 7).head().getSeq[Double](1).toArray
    val model = Ivf.train(emb, "vec_id", "vec", k = 4, iters = 1)
    val ann = Ivf.topK(emb, "vec_id", "vec", model, qv, k = 15, nprobe = 4)
      .collect().map(_.getLong(0)).toSeq
    val brute = Knn.bruteForceTopK(emb, "vec_id", "vec", qv, k = 15)
      .collect().map(_.getLong(0)).toSeq
    assert(ann == brute)
  }
}
