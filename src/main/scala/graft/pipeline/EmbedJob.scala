package graft.pipeline

import graft.embed.{Embedder, HashTfEmbedder}
import graft.text.TextOps
import graft.vector.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entry point A of the reference (embed.py as a batch job): scan →
  * clean → min-length filter → per-document embed → mean-pool per group →
  * embedding table. One shuffle (the groupBy); embedding happens map-side
  * before it, so the shuffle carries dim-width vectors, not text.
  */
object EmbedJob {

  /** (groupCol, embedding) — the engine's `embed_Appliances` equivalent.
    * `minTokens` mirrors `len(text.split(' ')) > 5` (embed.py:61).
    */
  def groupEmbeddings(docs: DataFrame, textCol: String, groupCol: String,
                      embedder: Embedder = HashTfEmbedder(64),
                      minTokens: Int = 5): DataFrame = {
    val clean = TextOps.cleanText(col(textCol))
    docs
      .withColumn("__clean", clean)
      .filter(TextOps.tokenCount(col("__clean")) > minTokens)
      .withColumn("__vec", embedder.embedTokens(TextOps.tokens(col("__clean"))))
      .groupBy(col(groupCol))
      .agg(VectorOps.meanPool(col("__vec")).as("embedding"))
  }
}
