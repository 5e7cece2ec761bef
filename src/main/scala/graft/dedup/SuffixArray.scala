package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed suffix array over a document corpus by prefix doubling
  * (Manber–Myers 1990). This is the general-purpose index behind
  * exact-substring dedup at corpus scale (Lee et al. 2022 build suffix
  * arrays to find arbitrary-length repeated spans; q213's fixed 8-token
  * windows are the special case this generalizes).
  *
  * Suffixes never cross document boundaries, so positions stay
  * (doc_id, off) pairs and no global concatenation is materialized; the
  * doubling join is a per-doc (off → off+k) equi-join. Ranks, however,
  * are global: each round re-ranks all suffixes by their (rank of first
  * k chars, rank of next k chars) pair.
  *
  * The global re-rank is the scale-critical step, done with NO
  * single-partition window: sort the pair frame (Spark's sample-based
  * range partitioner — the distributed sort), tag rows with
  * monotonically_increasing_id (order-preserving across range-sorted
  * partitions: partition index occupies the high bits, and Catalyst
  * never reorders a nondeterministic projection below the Sort), and
  * take min(id) per distinct pair — equal pairs share a rank, and rank
  * VALUES are only ever compared, so the non-contiguity of the ids is
  * irrelevant. Each round is cut with an eager localCheckpoint (the same
  * lesson as Dedup.connectedComponentsDistributed: without the cut,
  * Catalyst analysis grows exponentially with rounds).
  *
  * Rounds: k doubles until it covers the longest document or every
  * suffix rank is already unique — ⌈log₂ maxLen⌉ worst case, with the
  * early exit firing much sooner on natural text (global LCPs are short).
  */
object SuffixArray {

  /** Suffix ranks for every (doc, offset): `r` orders all suffixes of all
    * documents lexicographically; identical suffixes (e.g. from duplicate
    * documents) share a rank, so callers break ties by (doc_id, off).
    * Offsets are 1-based to line up with substr semantics in both
    * engines.
    */
  def ranks(docs: DataFrame, docCol: String, textCol: String,
            maxRounds: Int = 40): DataFrame = {
    val base = docs.select(col(docCol).cast("long").as("doc_id"),
      col(textCol).as("text"))
    val maxLen: Long =
      base.agg(max(length(col("text"))).cast("long")).head().getLong(0)

    val chars = base
      .select(col("doc_id"), posexplode(split(col("text"), "")))
      .filter(col("col") =!= "") // guard a trailing empty split token
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("off"),
        col("col").as("ch"))

    // base ranks from the bounded character census (alphabet-sized — the
    // one window here runs over ≤ |alphabet| rows)
    val censusW = org.apache.spark.sql.expressions.Window.orderBy("ch")
    val census = chars.select(col("ch")).distinct()
      .withColumn("r", row_number().over(censusW).cast("long"))

    var state = chars.join(broadcast(census), "ch")
      .select(col("doc_id"), col("off"), col("r"))
      .localCheckpoint(true)
    val total = state.count()

    var k = 1L
    var rounds = 0
    var done = total == 0
    while (!done && k < maxLen && rounds < maxRounds) {
      // the suffix at off sees the rank of the suffix k chars further in;
      // absent (suffix shorter than 2k) ranks as -1 so a strict prefix
      // sorts before everything it prefixes — substr comparison semantics
      val shifted = state.select(col("doc_id"), (col("off") - k).as("off"),
        col("r").as("r2"))
      val paired = state.join(shifted, Seq("doc_id", "off"), "left")
        .na.fill(-1L, Seq("r2"))
      val tagged = paired.orderBy("r", "r2")
        .withColumn("mid", monotonically_increasing_id())
      // one aggregate-window exchange re-ranks in place (vs a groupBy +
      // join-back, which costs two more exchanges per round); the loop is
      // job-count-bound, not data-bound, at local scale
      val wrr = org.apache.spark.sql.expressions.Window.partitionBy("r", "r2")
      state = tagged
        .withColumn("nr", min(col("mid")).over(wrr))
        .select(col("doc_id"), col("off"), col("nr").as("r"))
        .localCheckpoint(true)
      // the early-exit census is pointless while 2k chars can't yet
      // distinguish typical suffixes — skip its job for the first rounds
      if (k >= 16) {
        val nd = state.agg(countDistinct(col("r"))).head().getLong(0)
        done = nd == total
      }
      k *= 2
      rounds += 1
    }
    state
  }
}
