package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Clusterability probe data for the ANN recall table: rewrites
  * `embeddings.parquet` with each vector blended toward its label
  * centroid — `vec' = α·centroid(label) + (1−α)·vec` — so the same
  * RecallProbe run measures how q69's IVF delegation behaves when the
  * corpus actually clusters (real embedding corpora do; the synthetic
  * testdata is near-random, IVF's worst case). α=0 is the original
  * corpus; larger α concentrates each label's vectors around its
  * centroid. Writes only embeddings.parquet — the one table the q69
  * path reads.
  *
  * Usage: runMain graft.ClusterGen <inSfDir> <outDir> [alpha]
  */
object ClusterGen {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ClusterGen <inSfDir> <outDir> [alpha]")
    val alpha = args.lift(2).map(_.toDouble).getOrElse(0.7)
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    // overwrite-while-lazily-reading would corrupt the source corpus:
    // the output embeddings.parquet must not be the input one
    val inP = java.nio.file.Paths.get(args(0)).toAbsolutePath.normalize
    val outP = java.nio.file.Paths.get(args(1)).toAbsolutePath.normalize
    require(inP != outP,
      s"outDir must differ from inSfDir ($inP): mode(overwrite) on the " +
        "parquet being read can fail mid-job or corrupt the source")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-clustergen")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = spark.read.parquet(s"${args(0)}/embeddings.parquet")
      .select(col("vec_id").cast("long"), col("label").cast("int"),
        col("embedding"))
      .as[(Long, Int, Seq[Float])]

    // per-label centroid: label count is tiny (10 here), so the map is
    // driver-sized and broadcasts; the blend stays a narrow map
    val cents = emb
      .map { case (_, l, v) => (l, (v.map(_.toDouble).toArray, 1L)) }
      .groupByKey(_._1).mapValues(_._2)
      .reduceGroups { (a: (Array[Double], Long), b: (Array[Double], Long)) =>
        val s = a._1.clone()
        var i = 0
        while (i < s.length && i < b._1.length) { s(i) += b._1(i); i += 1 }
        (s, a._2 + b._2)
      }
      .map { case (l, (sum, n)) => (l, sum.map(_ / n)) }
      .collect().toMap
    val bc = spark.sparkContext.broadcast(cents)

    emb.map { case (id, l, v) =>
        val c = bc.value(l)
        val out = new Array[Float](v.length)
        var i = 0
        while (i < v.length) {
          out(i) = (alpha * c(i) + (1 - alpha) * v(i)).toFloat
          i += 1
        }
        (id, out.toSeq, l)
      }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"${args(1)}/embeddings.parquet")
    println(s"""{"out":"${args(1)}","alpha":$alpha,"labels":${cents.size}}""")
    spark.stop()
  }
}
