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

  private def embLabeled = graft.sources.Tables
    .embeddings(spark, "/root/testdata/sf0.001")
    .select(col("vec_id"), col("label"),
      VectorOps.asDouble(col("embedding")).as("vec"))

  /** Exact n² hard negatives (the q69 small-corpus formula), in-test. */
  private def exactHardNegatives: Map[Long, (Long, Double)] = {
    val e = embLabeled
    val nb = e.select(col("vec_id").as("nb_id"), col("label").as("nb_label"),
      col("vec").as("nb_vec"))
    e.crossJoin(broadcast(nb))
      .filter(col("nb_label") =!= col("label"))
      .select(col("vec_id"), col("nb_id"),
        round(VectorOps.cosine(col("vec"), col("nb_vec")), 6).as("sim"))
      .groupBy("vec_id")
      .agg(max(struct(col("sim"), (-col("nb_id")).as("neg_nb"))).as("m"))
      .select(col("vec_id"), (-col("m.neg_nb")).as("hard_negative"),
        col("m.sim").as("sim"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
  }

  test("the size-aware nprobe default is pinned at the measured 5k boundary") {
    // round-12 recall addendum (BASELINE.md, balanced quantizer):
    // nprobe=16 buys recall@1 0.534 → 0.700 at sf1 for ~20% ANN wall
    // (still ~6× under the exact scan), so delegated
    // corpora above the ~5k exact/ANN crossover default to 16; at or
    // below it (reachable only by lowering exactMax) the cheap 8 stays.
    // The production-floor test below exercises the n=500 branch
    // end-to-end through q69; changing either branch changes shipped
    // quality and must show up here first.
    assert(Ivf.defaultNprobe(500L) === 8)
    assert(Ivf.defaultNprobe(5000L) === 8)
    assert(Ivf.defaultNprobe(5001L) === 16)
    assert(Ivf.defaultNprobe(20000L) === 16)
  }

  test("hardNegatives with nprobe=k degenerates to the exact n² result") {
    // probing every cell makes the candidate set ALL different-label
    // pairs — the ANN machinery must then reproduce the exact top-1
    // including the lowest-nb_id tie-break
    val got = Ivf.hardNegatives(embLabeled, "vec_id", "label", "vec",
        k = 8, nprobe = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == exactHardNegatives)
  }

  test("hardNegatives ANN path: valid pairs, sim bounded by exact, high recall") {
    val exact = exactHardNegatives
    val labels = embLabeled.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Ivf.hardNegatives(embLabeled, "vec_id", "label", "vec",
        k = 8, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every pair crosses labels; the probed top-1 can never beat exact
    assert(got.forall { case (id, nb, _) => labels(id) != labels(nb) })
    assert(got.forall { case (id, _, sim) => sim <= exact(id)._2 + 1e-9 })
    // coverage: a query drops out only if its probed cells are all
    // same-label — with 10 labels that should be (deterministically) rare
    assert(got.length >= (exact.size * 95) / 100,
      s"coverage ${got.length}/${exact.size}")
    // recall@1 on sim value (id ties aside): deterministic floor
    val hit = got.count { case (id, _, sim) => sim == exact(id)._2 }
    assert(hit >= (got.length * 60) / 100,
      s"recall@1 too low: $hit/${got.length}")
  }

  test("q69 auto-delegates above spark.graft.hardNegatives.exactMax") {
    val q = SparkEntry.queries("q69_hard_negatives")
    // default gate (5000): 500 vectors stay on the exact broadcast-n² plan
    val exactPlan = q(spark, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan.toString
    assert(exactPlan.contains("Join"), s"exact path lost its join:\n$exactPlan")
    spark.conf.set("spark.graft.hardNegatives.exactMax", "0")
    try {
      val delegated = q(spark, "/root/testdata/sf0.001")
      // the ANN result is materialized (lineage cut): no n² join survives
      val plan = delegated.queryExecution.optimizedPlan.toString
      assert(!plan.contains("Join"), s"delegated path still joins:\n$plan")
      assert(delegated.columns.toSeq == Seq("vec_id", "hard_negative", "sim"))
      assert(delegated.count() > 0)
    } finally spark.conf.unset("spark.graft.hardNegatives.exactMax")
  }

  test("hardNegatives at PRODUCTION parameters holds the measured quality floor") {
    // Mirrors graft.RecallProbe: the exact n² plan grades the SHIPPED
    // q69 delegation (k = √(n·nprobe/3) clamped [64,4096], nprobe = 8 —
    // the size-aware default at n = 500, see Ivf.defaultNprobe) on the
    // 500-vector corpus. Ivf has
    // no RNG, so the measured values are exact for this corpus —
    // recall@1 = 0.686, dropout = 0, mean sim-gap = 0.0131, max = 0.199
    // (BASELINE.md round-11 recall table); the floors carry slack so a
    // benign quantizer tweak doesn't flap the suite, but a recall
    // regression past them is a real quality break for exactMax buyers.
    val q = SparkEntry.queries("q69_hard_negatives")
    val exact = exactHardNegatives
    spark.conf.set("spark.graft.hardNegatives.exactMax", "0")
    try {
      val ann = q(spark, "/root/testdata/sf0.001")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(ann.size == exact.size,
        s"dropout at production parameters: ${exact.size - ann.size}")
      val hits = exact.count { case (id, (_, sim)) => ann.get(id).exists(_._2 == sim) }
      assert(hits >= (exact.size * 65) / 100,
        s"recall@1 below floor: $hits/${exact.size}")
      val gaps = exact.toSeq.map { case (id, (_, sim)) => sim - ann(id)._2 }
      // ANN candidates are a subset of exact's: the gap is never negative
      assert(gaps.forall(_ >= -1e-9))
      assert(gaps.sum / gaps.size <= 0.02,
        s"mean sim-gap above floor: ${gaps.sum / gaps.size}")
    } finally spark.conf.unset("spark.graft.hardNegatives.exactMax")
  }

  test("the nprobe conf knob reaches the delegated plan and degenerates to exact") {
    // spark.graft.hardNegatives.nprobe ≥ k makes every query probe all
    // cells, so the FULL q69 path (conf → k formula → Ivf) must
    // byte-match the exact plan's result, tie-breaks included — pins
    // both the knob plumbing and the degenerate-equality contract
    val q = SparkEntry.queries("q69_hard_negatives")
    spark.conf.set("spark.graft.hardNegatives.exactMax", "0")
    spark.conf.set("spark.graft.hardNegatives.nprobe", "4096")
    try {
      val got = q(spark, "/root/testdata/sf0.001")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got == exactHardNegatives)
    } finally {
      spark.conf.unset("spark.graft.hardNegatives.exactMax")
      spark.conf.unset("spark.graft.hardNegatives.nprobe")
    }
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

  /** 40 distinct vectors × 25 copy-major copies (id = copy·40 + j, the
    * ScaleGen layout): the evenly-spaced seed positions land on the
    * same few distinct vectors over and over, so training on the RAW
    * corpus collapses to a handful of distinct centroids — the round-12
    * sf10 failure (40-min probe join from an effectively ~40-cell
    * model). hardNegatives trains through `trainOnDistinct`, which must
    * keep the full centroid diversity.
    */
  private def dupCorpus = {
    import spark.implicits._
    val rows = for (copy <- 0 until 25; j <- 0 until 40) yield {
      val vec = Seq.tabulate(8)(d => math.sin(j * 13 + d * 5) * (j + 1))
      (copy.toLong * 40 + j, (j % 4).toLong, vec)
    }
    rows.toDF("id", "label", "vec")
  }

  test("trainOnDistinct keeps centroid diversity and balanced cell mass on duplicates") {
    // Raw training on this corpus seeds only 4 distinct centroids
    // (positions 0,50,…,750 of the id-ordered prefix all hit vectors
    // j ∈ {0,10,20,30}); Lloyd's keep-stale-centroid rule then revives
    // SOME duplicates over the 3 iterations — at toy scale that can
    // fully re-diversify, but at sf10 scale (k=1033, 40 distinct seed
    // values) revival adds ≤ ~40 distinct cells per iteration and the
    // model stays collapsed, which is the measured 2440 s probe-join
    // blowup. So the pin is on the FIX's guarantees, which hold at
    // every scale: all k centroids distinct, and no cell hoards the
    // corpus (bounded mass ⇒ bounded per-cell pair volume).
    val deduped = Ivf.trainOnDistinct(dupCorpus, k = 16)
    assert(deduped.centroids.map(_.toSeq).distinct.length == 16,
      "dedup-train lost centroid diversity")
    val cells = Ivf.assign(dupCorpus, "id", "vec", deduped)
      .collect().map(_.getInt(1))
    val byCell = cells.groupBy(identity).view.mapValues(_.length)
    val mean = cells.length.toDouble / 16
    assert(byCell.values.max <= 4 * mean,
      s"cell mass skew: max=${byCell.values.max}, mean=$mean")
  }

  test("cellSaltWidths: exact and estimate terms each trigger; clamped at 64") {
    // index-estimate term (i²·nprobe/2e7): a heavy index cell salts even
    // when the query histogram under-reads it
    assert(Ivf.cellSaltWidths(Map(0 -> 3000L), Map(0 -> 100L), 4) == Map(0 -> 2))
    // exact term (q·i/2e7): probe concentration on a modest index cell —
    // the skew the index-side estimate alone cannot see
    assert(Ivf.cellSaltWidths(Map(0 -> 1000L), Map(0 -> 100000L), 1) == Map(0 -> 5))
    // balanced cells keep width 1 (the common-case no-op)
    assert(Ivf.cellSaltWidths(Map(0 -> 1000L, 1 -> 900L),
      Map(0 -> 4000L, 1 -> 3600L), 4) == Map(0 -> 1, 1 -> 1))
    // width is clamped at 64 however extreme the histogram
    assert(Ivf.cellSaltWidths(Map(0 -> 10000000L), Map.empty, 8) == Map(0 -> 64))
  }

  /** One vector duplicated 1800× + 500 distinct: distinct-training keeps
    * the CENTROIDS balanced, but the duplicate mass still lands in one
    * cell — the residual-skew shape the per-cell salt exists for.
    */
  private def heavyCellCorpus = {
    import spark.implicits._
    val heavy = (0 until 1800).map { i =>
      (i.toLong, (i % 4).toLong,
        Seq.tabulate(8)(d => math.cos(d * 3).abs + 2.0))
    }
    val tail = (0 until 500).map { j =>
      val vec = Seq.tabulate(8)(d => math.sin(j * 7 + d * 11) * ((j % 9) + 1))
      (1800L + j, (j % 4).toLong, vec)
    }
    (heavy ++ tail).toDF("id", "label", "vec")
  }

  test("per-cell widths salt ONLY the overloaded cell, pair set unchanged") {
    // the same histograms hardNegatives measures internally, recomputed
    // driver-side: this corpus must produce NON-UNIFORM widths (measured:
    // the duplicate cell gets 2, the 15 cold cells keep 1), or the test
    // isn't exercising the per-cell path at all
    import spark.implicits._
    val model = Ivf.trainOnDistinct(heavyCellCorpus, k = 16)
    val rows = heavyCellCorpus.select("id", "vec")
      .as[(Long, Seq[Double])].collect()
    val iCounts = rows.map(r => model.nearestCell(r._2))
      .groupBy(identity).map { case (c, a) => c -> a.length.toLong }
    val qCounts = rows.flatMap(r => model.nearestCells(r._2, 8))
      .groupBy(identity).map { case (c, a) => c -> a.length.toLong }
    val widths = Ivf.cellSaltWidths(iCounts, qCounts, 8)
    assert(widths.values.max >= 2, s"no hot cell salted: $widths")
    assert(widths.values.count(_ == 1) >= 10,
      s"cold cells paying replication: $widths")
    // byte-equality against the UNSALTED join (forced width 1): per-cell
    // salting replicates hot-cell index rows across salt keys, but every
    // (query, nb) pair still meets exactly once, on the query's salt
    def run(): Map[Long, (Long, Double)] =
      Ivf.hardNegatives(heavyCellCorpus, "id", "label", "vec",
          k = 16, nprobe = 8)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val auto = run()
    spark.conf.set("spark.graft.hardNegatives.saltWidth", "1")
    try assert(run() == auto)
    finally spark.conf.unset("spark.graft.hardNegatives.saltWidth")
    assert(auto.size == 2300) // every query keeps a cross-label negative
  }

  test("a malformed saltWidth conf fails loudly, naming the knob") {
    spark.conf.set("spark.graft.hardNegatives.saltWidth", "eight")
    try {
      val e = intercept[IllegalArgumentException] {
        Ivf.hardNegatives(dupCorpus, "id", "label", "vec", k = 8, nprobe = 2)
          .collect()
      }
      assert(e.getMessage.contains("spark.graft.hardNegatives.saltWidth"),
        s"error does not name the conf key: ${e.getMessage}")
    } finally spark.conf.unset("spark.graft.hardNegatives.saltWidth")
  }

  test("duplicated-corpus recall holds the measured floor at shipped q69 parameters") {
    // The round-12 honesty, regression-proofed: the BALANCED quantizer's
    // quality on a duplicate-heavy corpus (the shape that subsidized the
    // collapsed model's 0.824 before the fix). dupCorpus at the shipped
    // q69 parameter chain for n=1000 — nprobe = defaultNprobe(1000) = 8,
    // k = max(64, √(n·nprobe/3)) = 64 (40 distinct vectors ⇒ 40 effective
    // cells). Ivf has no RNG, so measured-exact for this fixture:
    // dropout = 0, recall@1 = 0.40, mean sim-gap = 0.0341, max = 0.1067.
    // Floors carry slack for benign tweaks; a drop past them means
    // seeding, salting, or defaultNprobe changed shipped ANN quality on
    // duplicate mass and must be re-priced, not absorbed.
    val nb = dupCorpus.select(col("id").as("nb_id"), col("label").as("nb_label"),
      col("vec").as("nb_vec"))
    val exact = dupCorpus.crossJoin(broadcast(nb))
      .filter(col("nb_label") =!= col("label"))
      .select(col("id"), col("nb_id"),
        round(VectorOps.cosine(col("vec"), col("nb_vec")), 6).as("sim"))
      .groupBy("id")
      .agg(max(struct(col("sim"), (-col("nb_id")).as("neg_nb"))).as("m"))
      .select(col("id"), (-col("m.neg_nb")).as("hard_negative"),
        col("m.sim").as("sim"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val nprobe = Ivf.defaultNprobe(1000L)
    val k = math.max(64L, math.min(4096L,
      math.round(math.sqrt(1000.0 * nprobe / 3)))).toInt
    val ann = Ivf.hardNegatives(dupCorpus, "id", "label", "vec",
        k = k, nprobe = nprobe)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(ann.size == exact.size,
      s"dropout on the duplicated corpus: ${exact.size - ann.size}")
    val hits = exact.count { case (id, (_, sim)) => ann.get(id).exists(_._2 == sim) }
    assert(hits >= (exact.size * 35) / 100,
      s"duplicated-corpus recall@1 below floor: $hits/${exact.size}")
    val gaps = exact.toSeq.map { case (id, (_, sim)) => sim - ann(id)._2 }
    assert(gaps.forall(_ >= -1e-9)) // ANN candidates ⊆ exact's
    assert(gaps.sum / gaps.size <= 0.05,
      s"duplicated-corpus mean sim-gap above floor: ${gaps.sum / gaps.size}")
  }

  test("salting the probe join redistributes but never changes the pair set") {
    // forced saltWidth values must produce byte-identical hard negatives
    // (salting replicates index rows across salt keys; every (query, nb)
    // pair still meets exactly once)
    def run(): Map[Long, (Long, Double)] =
      Ivf.hardNegatives(dupCorpus, "id", "label", "vec", k = 16, nprobe = 4)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val default = run()
    spark.conf.set("spark.graft.hardNegatives.saltWidth", "8")
    try {
      assert(run() == default)
    } finally spark.conf.unset("spark.graft.hardNegatives.saltWidth")
    assert(default.nonEmpty)
  }
}
