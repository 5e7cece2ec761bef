package graft.similarity

import graft.dedup.Dedup
import graft.vector.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column.
  *
  * `bruteForceTopK` is the correctness baseline (exactly the reference's
  * full cosine scan, semantic.py:36-41): one pass, per-partition top-k
  * heap (TakeOrderedAndProject), no global sort — O(n·d) work, O(k)
  * driver result, scales to any corpus the scan scales to.
  *
  * `annTopK` is the scale path: restrict the scan to candidates sharing a
  * hyperplane-LSH bucket with the query (any of `tables` independent
  * tables), then exact-rank the survivors. At 100 TB the bucketed join
  * touches ~n/2^bits of the corpus per table instead of all of it; recall
  * is tunable via (tables, bitsPerTable).
  */
object Knn {

  /** (id, sim) top-k by cosine against a literal query vector. */
  def bruteForceTopK(vecs: DataFrame, idCol: String, vecCol: String,
                     query: Array[Double], k: Int,
                     roundScale: Int = 6): DataFrame = {
    val q = typedLit(query)
    vecs.select(col(idCol).as("id"),
        round(VectorOps.cosine(col(vecCol), q), roundScale).as("sim"))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
  }

  /** ANN top-k: hyperplane-LSH candidate pruning + exact rerank. */
  def annTopK(vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
              query: Array[Double], k: Int,
              tables: Int = 8, bitsPerTable: Int = 4,
              roundScale: Int = 6): DataFrame = {
    val q = typedLit(query)
    val queryBuckets = Dedup.hyperplaneBuckets(q, dim, tables, bitsPerTable)
    vecs.select(col(idCol).as("id"), col(vecCol).as("vec"),
        explode(Dedup.hyperplaneBuckets(col(vecCol), dim, tables, bitsPerTable)).as("bucket"))
      .filter(array_contains(queryBuckets, col("bucket")))
      .dropDuplicates("id")
      .select(col("id"), round(VectorOps.cosine(col("vec"), q), roundScale).as("sim"))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
  }
}
