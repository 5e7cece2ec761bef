package graft.embed

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable embedding seam (SURVEY §2.9). The reference calls a
  * SentenceTransformer (embed.py:10,73-78); the engine's default is a
  * deterministic hashed term-frequency embedder so the whole pipeline is
  * self-contained, offline, and reproducible. Swap `Embedder` for a real
  * model-inference implementation (mapPartitions batching) in production.
  */
trait Embedder {
  def dim: Int

  /** Column of array<double>: embedding of a token-array column. */
  def embedTokens(toks: Column): Column
}

/** Hashed TF embedding: token → bucket via xxhash64, counts L2-normalized.
  * Same family as Spark MLlib's HashingTF, expressed as pure higher-order
  * functions so it stays inside codegen and needs no ML pipeline objects.
  */
final case class HashTfEmbedder(dim: Int = 64) extends Embedder {
  import graft.vector.VectorOps

  def embedTokens(toks: Column): Column = {
    val counts = aggregate(
      toks,
      array_repeat(lit(0.0), dim),
      (acc, t) => {
        val bucket = pmod(xxhash64(t), lit(dim.toLong))
        transform(acc, (x, i) => x + when(bucket === i.cast("long"), 1.0).otherwise(0.0))
      })
    VectorOps.l2normalize(counts)
  }
}
