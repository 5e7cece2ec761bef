package graft.embed

import graft.text.StableHash
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable embedding seam (SURVEY §2.9). The reference calls a
  * SentenceTransformer (embed.py:10,73-78); the engine's default is a
  * deterministic hashed term-frequency embedder so the whole pipeline is
  * self-contained, offline, and reproducible. Swap `Embedder` for a real
  * model-inference implementation (mapPartitions batching) in production.
  */
trait Embedder extends Serializable {
  def dim: Int

  /** Column of array<double>: embedding of a token-array column. */
  def embedTokens(toks: Column): Column

  /** Driver-side embedding of a literal token sequence (query path). */
  def embed(tokens: Seq[String]): Array[Double]
}

/** Hashed TF embedding: token → bucket via StableHash (DuckDB-mirrorable,
  * so hash-seeded queries keep the exact oracle check), counts
  * L2-normalized. Same family as Spark MLlib's HashingTF, implemented as
  * a tight JVM loop behind a Scala UDF — the column-expression
  * formulation (aggregate over tokens updating a dim-width array) is
  * interpreted per element and ~dim× slower.
  */
final case class HashTfEmbedder(dim: Int = 64) extends Embedder {

  def embed(tokens: Seq[String]): Array[Double] = {
    val v = new Array[Double](dim)
    tokens.foreach { t =>
      if (t != null) v(StableHash.bucket(t, dim)) += 1.0
    }
    var ss = 0.0
    var i = 0
    while (i < dim) { ss += v(i) * v(i); i += 1 }
    val n = math.sqrt(ss) + 1e-9
    i = 0
    while (i < dim) { v(i) /= n; i += 1 }
    v
  }

  private val embedUdf = udf((toks: Seq[String]) =>
    if (toks == null) null else embed(toks).toSeq)

  def embedTokens(toks: Column): Column = embedUdf(toks)
}
