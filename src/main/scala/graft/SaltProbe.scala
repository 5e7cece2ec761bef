package graft

import graft.similarity.Ivf
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the PER-CELL probe-join salt (round 13): on an
  * sf10-scale corpus with an injected residual-skew block — one vector
  * duplicated into a heavy cell the balanced quantizer cannot split
  * (duplicates all share one nearest cell however diverse the
  * centroids) — report the measured per-cell widths, the salted index
  * leg's row volume under per-cell widths vs the old global width, and
  * the end-to-end hardNegatives wall for both. The artifact is the
  * VERDICT r12 item-1 evidence: probe-join input ≈ n + (heavy cell's
  * rows × its extra width), not n × worst-cell width.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_PARTS=64 \
  *     tools/run_graft.sh graft.SaltProbe SALT_PROBE_sf10_r13.json
  *
  * Env: SPARK_GRAFT_SALT_HEAVY — rows in the injected duplicate block
  * (default 5000: width ≈ 20 on the 2·10⁷ pair budget at nprobe=16,
  * informative without hitting the 64 clamp).
  */
object SaltProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("SALT_PROBE_sf10_r13.json")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", cpus)
    val heavyN = sys.env.getOrElse("SPARK_GRAFT_SALT_HEAVY", "5000").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val canary0 = BoxCanary.sample()
    val emb = sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").cast("long").as("id"), col("label").cast("long").as("label"),
        graft.vector.VectorOps.asDouble(col("embedding")).as("vec"))
    val baseN = emb.count()
    val maxId = emb.agg(max("id")).head().getLong(0)
    // heavy block: vec_id 0's vector duplicated heavyN times under fresh
    // ids with a label distinct from its own (so the pairs survive the
    // cross-label filter and the cell really is join-hot)
    val v0 = emb.filter(col("id") === 0).head()
    val heavy = spark.range(heavyN)
      .select((col("id") + maxId + 1).as("id"),
        lit((v0.getLong(1) + 1) % 10).as("label"),
        typedLit(v0.getSeq[Double](2)).as("vec"))
    val corpus = emb.unionByName(heavy)
    val n = baseN + heavyN
    val nprobe = Ivf.defaultNprobe(n)
    val k = math.max(64L, math.min(4096L,
      math.round(math.sqrt(n.toDouble * nprobe / 3)))).toInt

    // the widths hardNegatives will compute, measured independently so
    // the artifact can decompose replication volume per cell
    val model = Ivf.trainOnDistinct(corpus, k)
    val bc = spark.sparkContext.broadcast(model)
    val iCounts = corpus.select("id", "vec").as[(Long, Seq[Double])]
      .map { case (_, v) => bc.value.nearestCell(v) }
      .groupByKey(identity).count().collect().toMap
    val qCounts = corpus.select("id", "vec").as[(Long, Seq[Double])]
      .flatMap { case (_, v) => bc.value.nearestCells(v, nprobe) }
      .groupByKey(identity).count().collect().toMap
    val widths = Ivf.cellSaltWidths(iCounts, qCounts, nprobe)
    val maxW = widths.values.max
    val hot = widths.filter(_._2 > 1)
    val perCellRows = iCounts.map { case (c, ic) => ic * widths(c) }.sum
    val globalRows = n * maxW

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    // end-to-end: auto per-cell widths vs the old global-width behavior
    // (forced via the conf knob to the same worst-cell width)
    val (autoSec, autoRows) = timed {
      Ivf.hardNegatives(corpus, "id", "label", "vec", k = k, nprobe = nprobe).count()
    }
    spark.conf.set("spark.graft.hardNegatives.saltWidth", maxW.toString)
    val (globalSec, globalRowsOut) = timed {
      Ivf.hardNegatives(corpus, "id", "label", "vec", k = k, nprobe = nprobe).count()
    }
    spark.conf.unset("spark.graft.hardNegatives.saltWidth")
    val canary1 = BoxCanary.sample()

    val hotStr = hot.toSeq.sortBy(-_._2)
      .map { case (c, w) => s""""$c":$w""" }.mkString("{", ",", "}")
    import Bench.num4
    val line =
      s"""{"sf":"$sfDir","parts":$parts,"n":$n,"heavyN":$heavyN,"k":$k,"nprobe":$nprobe,""" +
      s""""cells":${iCounts.size},"hotCells":${hot.size},"maxWidth":$maxW,""" +
      s""""hotWidths":$hotStr,""" +
      s""""saltedIndexRowsPerCell":$perCellRows,"saltedIndexRowsGlobal":$globalRows,""" +
      s""""replicationRatio":${num4(globalRows.toDouble / perCellRows)},""" +
      s""""autoSec":${num4(autoSec)},"globalSec":${num4(globalSec)},""" +
      s""""autoOutRows":$autoRows,"globalOutRows":$globalRowsOut,"outEqual":${autoRows == globalRowsOut},""" +
      s""""canarySec":{"oneCore":[${num4(canary0._1)},${num4(canary1._1)}],"allCores":[${num4(canary0._2)},${num4(canary1._2)}]}}"""
    println(line)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[saltprobe] could not write $out: ${e.getMessage}")
    }
    spark.stop()
  }
}
