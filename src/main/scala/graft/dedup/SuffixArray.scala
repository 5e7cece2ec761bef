package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  * Scale shape, per round:
  *   1. range-sort the pair frame (Spark's sample-based range
  *      partitioner — the distributed sort; equal keys land in one
  *      partition because the partitioner is a pure function of the key);
  *   2. dense-rank it with the boundary-stitch trick: a
  *      within-partition lag change-flag marks each first row of a
  *      distinct key group, a running within-partition sum numbers the
  *      groups locally, and a partition-count-sized census of per-
  *      partition group counts supplies each partition's global offset
  *      (collected — the driver holds ONE long per partition, a bounded
  *      census, and re-attaches it as an array literal, so the stitch
  *      costs no join and no broadcast exchange).
  * There is NO single-partition window and NO exchange keyed on the
  * rank pair itself: in early rounds the hottest (r, r2) value is a
  * short-n-gram class covering a constant fraction of natural text, so
  * hash-clustering on it would hand one task that whole fraction of a
  * 100 TB corpus. Equal keys share a rank (peers take the same running-
  * sum value under the RANGE frame), and rank VALUES are only ever
  * compared, so dense ranks are a drop-in for any order-isomorphic
  * labeling.
  *
  * Round count: the base rank is the dense rank of the FIRST `initK`
  * CHARS directly (one string-keyed sort of substr(text, off, initK) —
  * truncated-prefix comparison equals suffix comparison up to depth
  * initK, strict prefixes first), so doubling starts at k = initK
  * instead of k = 1: ⌈log₂(maxLen/initK)⌉ + 1 sorts worst case. Each
  * round's census also yields the new distinct-rank count for free
  * (Σ per-partition group counts), giving two EXACT early exits with no
  * extra job: all ranks distinct, or no refinement this round — if
  * doubling at k splits nothing, classes are closed under the k-shift
  * and members are wholly identical suffixes, so no later round can
  * split them either (this fires on corpora full of duplicate
  * documents, where "all distinct" never happens). Each round is cut
  * with an eager localCheckpoint (the same lesson as
  * Dedup.connectedComponentsDistributed: without the cut, Catalyst
  * analysis grows exponentially with rounds).
  */
object SuffixArray {

  /** Range-sort `df` by `keys` and flag/number key-group starts within
    * each physical partition — the lazy half of the dense re-rank,
    * exposed so PlanShapeSpec can hold it to its scale claim (the only
    * exchanges are the range sort itself and pid-clustering for the
    * windows; a hash exchange on the skewed key pair never appears).
    * The stitch that follows ([[denseRank]]) is a pure projection over
    * this frame plus a partition-count-sized census — it can add no
    * further exchange.
    */
  private[graft] def sortAndFlag(df: DataFrame, keys: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    // EXPLICIT partition counts: AQE's partition coalescing treats a
    // bare repartitionByRange/window exchange as fair game and at small
    // data collapses the sort into one or two partitions — which turns
    // the per-partition windows below into single-task stragglers (the
    // exact pathology this design exists to avoid). A user-specified
    // count is exempt from coalescing, keeping the round's parallelism
    // pinned to the configured shuffle width at every data size.
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df
      // range ROUTING only (no local sort yet): pid depends on the
      // partition, not the row order, and the window below sorts by
      // (pid, keys) anyway — one local sort per round, not two
      .repartitionByRange(n, kc: _*)
      .withColumn("pid", spark_partition_id())
      // explicit pid-clustering the window below reuses — whole,
      // size-balanced physical partitions, immune to key-value skew
      // (the intervening nondeterministic projection also keeps
      // CollapseRepartition from merging the two user exchanges)
      .repartition(n, col("pid"))
    val wp = Window.partitionBy("pid").orderBy(kc: _*)
    val changed = keys
      .map(k => lag(col(k), 1).over(wp) =!= col(k))
      .reduce(_ || _)
    sorted
      .withColumn("chg",
        when(lag(col(keys.head), 1).over(wp).isNull || changed, 1L)
          .otherwise(0L))
      // default RANGE frame: key peers share the cumulative value, so
      // equal keys get equal local group numbers
      .withColumn("loc", sum(col("chg")).over(wp))
  }

  /** Materialize the dense rank of `df` by `keys` as column `r`
    * (checkpoint-cut), carrying (doc_id, off). Returns the frame and
    * the number of distinct key groups (read from the same census that
    * stitches the offsets — no extra job).
    */
  private def denseRank(df: DataFrame, keys: Seq[String]): (DataFrame, Long) = {
    val flagged = sortAndFlag(df, keys).persist()
    try {
      // bounded census: one (pid, group-count) row per partition
      val counts = flagged.groupBy("pid").agg(sum(col("chg")).as("ng"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val nGroups = counts.values.sum
      val bases = new Array[Long](if (counts.isEmpty) 1 else counts.keys.max + 1)
      var acc = 0L
      for (pid <- counts.keys.toSeq.sorted) {
        bases(pid) = acc
        acc += counts(pid)
      }
      val out = flagged
        .select(col("doc_id"), col("off"),
          (element_at(typedlit(bases.toSeq), col("pid") + 1) + col("loc"))
            .as("r"))
        .localCheckpoint(true)
      (out, nGroups)
    } finally flagged.unpersist()
  }

  /** Suffix ranks for every (doc, offset): `r` orders all suffixes of all
    * documents lexicographically; identical suffixes (e.g. from duplicate
    * documents) share a rank, so callers break ties by (doc_id, off).
    * Offsets are 1-based to line up with substr semantics in both
    * engines.
    */
  private val debug = sys.env.get("SPARK_GRAFT_SA_DEBUG").contains("1")
  private def dbg(msg: => String): Unit =
    if (debug) System.err.println(s"[sa] $msg")
  private def timed[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val out = body
    dbg(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    out
  }

  def ranks(docs: DataFrame, docCol: String, textCol: String,
            initK: Int = 64, maxRounds: Int = 40): DataFrame = {
    val base = docs.select(col(docCol).cast("long").as("doc_id"),
      col(textCol).as("text"))

    // one row per suffix, keyed by its first initK chars — a bounded
    // (initK-byte) sort key per row, never a whole suffix
    val prefixes = base
      // sequence(1, 0) would DESCEND ([1, 0]) — empty docs must not
      // reach the explode
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")))).as("off32"))
      .select(col("doc_id"), col("off32").cast("long").as("off"),
        expr(s"substr(text, off32, $initK)").as("pfx"))

    val (state0, groups0) = timed(s"base rank (initK=$initK)") {
      denseRank(prefixes, Seq("pfx"))
    }
    var state = state0
    var distinct = groups0
    // emptiness first: an empty/all-null corpus exits on the empty frame
    // path before any null-aggregate can NPE
    if (distinct == 0L) return state
    // one tiny job on the skinny frame: size + longest document
    // (max offset = max length)
    val ag = state.agg(count(lit(1)), max(col("off"))).head()
    val total = ag.getLong(0)
    val maxLen = ag.getLong(1)

    var k = initK.toLong
    var rounds = 0
    var done = distinct == total
    while (!done && k < maxLen && rounds < maxRounds) {
      // the suffix at off sees the rank of the suffix k chars further in;
      // absent (suffix shorter than 2k) ranks as -1 so a strict prefix
      // sorts before everything it prefixes — substr comparison semantics
      val shifted = state.select(col("doc_id"), (col("off") - k).as("off"),
        col("r").as("r2"))
      val paired = state.join(shifted, Seq("doc_id", "off"), "left")
        .na.fill(-1L, Seq("r2"))
      val (next, nd) = timed(s"round $rounds (k=$k)") {
        denseRank(paired, Seq("r", "r2"))
      }
      // exact early exits, both free from the census: every suffix
      // separated, or a no-refinement fixpoint (identical-suffix classes
      // only — see object doc)
      done = nd == total || nd == distinct
      state = next
      distinct = nd
      k *= 2
      rounds += 1
    }
    state
  }

  // ----------------------------------------------------------- index reuse

  /** Build-once cache: every consumer of the same corpus (the SA-head
    * report, the repeated-substring scan, prospective substring dedup)
    * shares ONE index build per (session, corpus key) — a real index
    * engine amortizes its Ω(n) construction across queries rather than
    * rebuilding per consumer. The cached frame is localCheckpoint-backed
    * (RDD-level storage, untouched by `spark.catalog.clearCache()`), so
    * holding the reference keeps the materialized blocks alive.
    *
    * Bench clears this cache at the start of each pass
    * ([[clearCache]]), so the published artifact still prices exactly
    * one build per suite pass — reuse within a pass is the design,
    * a warm second pass hiding the build cost would not be.
    */
  private val builds =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def build(spark: SparkSession, corpusKey: String, docs: => DataFrame,
            docCol: String, textCol: String): DataFrame =
    builds.computeIfAbsent(
      s"${spark.sparkContext.applicationId}|${System.identityHashCode(spark)}|$corpusKey",
      _ => ranks(docs, docCol, textCol))

  /** Drop all cached builds (bench pass isolation, test hygiene). The
    * checkpoint blocks of dropped frames are reclaimed by the
    * ContextCleaner once unreferenced.
    */
  def clearCache(): Unit = builds.clear()
}
