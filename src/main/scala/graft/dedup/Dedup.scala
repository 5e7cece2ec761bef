package graft.dedup

import graft.text.TextOps
import graft.vector.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale dedup operators (the LLM-training-pipeline extensions):
  * exact hash-dedup, MinHash+LSH banding, SimHash, and embedding-cosine
  * near-dup via random-hyperplane LSH.
  *
  * Scale notes: every variant is shuffle-on-key — exact dedup shuffles on
  * the content hash; MinHash shuffles on (band_idx, band_key); vector LSH
  * shuffles on (table_idx, bucket-bits). Candidate verification (true
  * Jaccard / true cosine) happens only inside buckets, so the O(n²)
  * pair explosion never materializes. All hash functions are seeded,
  * deterministic column expressions (xxhash64), so results are stable
  * across runs and partitionings.
  */
object Dedup {

  /** Word n-gram shingles of a token array; documents shorter than n
    * collapse to a single whole-document shingle.
    */
  def wordShingles(toks: Column, n: Int = 3): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /** k-component MinHash signature: one aggregate pass over the shingles,
    * maintaining the element-wise min of k seeded hashes (seed mixed in
    * as an extra xxhash64 argument).
    */
  def minHashSignature(shingles: Column, k: Int = 64): Column =
    aggregate(
      shingles,
      array_repeat(lit(Long.MaxValue), k),
      (acc, s) => zip_with(
        acc,
        transform(sequence(lit(0), lit(k - 1)), i => xxhash64(i, s)),
        (a, b) => least(a, b)))

  /** LSH band keys: signature → `bands` keys of `rowsPerBand` components
    * each (banded so a pair colliding on ANY band becomes a candidate).
    */
  def bandKeys(sig: Column, bands: Int = 32, rowsPerBand: Int = 2): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, concat_ws("_", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)))))

  /** Exact token-set Jaccard between two pre-distinct token arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  /** MinHash-LSH near-dup pairs over (id, text): candidates from band
    * collisions, verified with exact Jaccard over the distinct SHINGLE
    * sets — the same metric the signatures estimate, so LSH recall
    * guarantees apply (verifying on a different metric than you hashed
    * silently loses pairs). Returns (id_a, id_b, jaccard) with
    * id_a < id_b, deduplicated.
    */
  def minHashDupPairs(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.5,
                      k: Int = 64, bands: Int = 32): DataFrame = {
    val rowsPerBand = k / bands
    val base = docs.select(
      col(idCol).as("id"),
      array_distinct(
        wordShingles(TextOps.tokens(TextOps.cleanText(col(textCol))))).as("shingles"))
    val sigs = base
      .withColumn("sig", minHashSignature(col("shingles"), k))
      .select(col("id"), col("shingles"),
        posexplode(bandKeys(col("sig"), bands, rowsPerBand)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band")
    val a = sigs.select(col("band_idx"), col("band"),
      col("id").as("id_a"), col("shingles").as("sh_a"))
    val b = sigs.select(col("band_idx"), col("band"),
      col("id").as("id_b"), col("shingles").as("sh_b"))
    a.join(b, Seq("band_idx", "band"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash from token stream: per-bit vote of seeded token
    * hashes; emitted as the lower 32 bits (non-negative long) plus the
    * full bit array for Hamming comparisons.
    */
  def simHashBits(toks: Column, bits: Int = 64): Column = {
    val votes = aggregate(
      toks,
      array_repeat(lit(0), bits),
      (acc, t) => {
        val h = xxhash64(t)
        transform(acc, (x, i) =>
          x + when(call_function("getbit", h, i) === 1, 1).otherwise(-1))
      })
    transform(votes, v => when(v > 0, 1).otherwise(0))
  }

  /** Hamming distance between two equal-length bit arrays. */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x =!= y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)

  /** Random-hyperplane LSH bucket bits for one table: sign pattern of the
    * vector against `bitsPerTable` deterministic pseudo-random planes.
    * Planes are generated driver-side from a seeded java.util.Random —
    * stable across JVMs — and folded into the plan as literals.
    */
  def hyperplaneBuckets(vec: Column, dim: Int, tables: Int = 8,
                        bitsPerTable: Int = 4, seed: Long = 42L): Column = {
    val rnd = new java.util.Random(seed)
    val planes = Array.fill(tables, bitsPerTable, dim)(rnd.nextGaussian())
    val tableKeys = (0 until tables).map { t =>
      val bits = (0 until bitsPerTable).map { j =>
        val plane = typedLit(planes(t)(j).toSeq)
        when(VectorOps.dot(vec, plane) >= 0, lit(1)).otherwise(lit(0))
      }
      concat_ws("", lit(t.toString) +: lit("_") +: bits: _*)
    }
    array(tableKeys: _*)
  }

  /** Embedding near-dup pairs: multi-table hyperplane LSH candidates,
    * verified with exact cosine ≥ threshold. (id_a < id_b, deduplicated.)
    */
  def cosineDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
                     dim: Int, threshold: Double = 0.99,
                     tables: Int = 8, bitsPerTable: Int = 4): DataFrame = {
    val base = vecs.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", explode(hyperplaneBuckets(col("vec"), dim, tables, bitsPerTable)))
    val a = base.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = base.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        VectorOps.cosine(col("vec_a"), col("vec_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
