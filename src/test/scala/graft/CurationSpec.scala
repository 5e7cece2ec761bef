package graft

import graft.queries.CurationQueries
import org.apache.spark.sql.functions._

/** Invariants of the curation operators (q79–q83) beyond the DuckDB
  * oracle: split proportions and disjointness, lossless chunk coverage,
  * surprisal ordering, repetition-screen extremes, and quantization
  * error bounds. Runs on the sf0.001 fixtures.
  */
class CurationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    CurationQueries.all.find(_.name == name).get.fn(spark, sf)

  test("q79: splits are exhaustive and roughly 80/10/10") {
    val rows = run("q79_split_assign")
      .groupBy("split").agg(sum("n_docs").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = rows.values.sum
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(total == docs, s"split counts $total != corpus $docs")
    // hash buckets are uniform enough that train lands in [60%, 95%]
    assert(rows("train") > total * 0.6 && rows("train") < total * 0.95)
    assert(rows.keySet == Set("train", "val", "test"))
  }

  test("q80: chunks reconstruct every token (stride overlap accounted)") {
    val chunks = run("q80_chunk_windows")
    // every doc's token count == tokens of chunk 0..last with stride 24,
    // window 32: n = 24*(k-1) + len(last chunk) when k>1, else len(chunk 0)
    val perDoc = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("k"), max("chunk_idx").as("last_idx"),
        max(struct(col("chunk_idx"), col("n_chunk"))).as("last"))
      .select(col("doc_id"), col("k"), col("last.n_chunk").as("last_len"))
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        size(graft.text.TextOps.tokens(
          graft.text.TextOps.cleanText(col("text")))).cast("long").as("n"))
    val bad = perDoc.join(toks, "doc_id")
      .filter(col("n") =!= (col("k") - 1) * 24 + col("last_len"))
      .count()
    assert(bad == 0, s"$bad docs with token-coverage mismatch")
  }

  test("q81: rarer tokens score higher surprisal than common ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common common common common common common common"),
      (2L, "common rare")).toDF("doc_id", "text")
      .withColumn("source", lit("s")).withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = graft.sources.Staging.scratchDir("curation-spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CurationQueries.all.find(_.name == "q81_surprisal").get
      .fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 2 contains the rare token → higher average surprisal
    assert(out(2L) > out(1L), s"expected surprisal(doc2) > surprisal(doc1): $out")
  }

  test("q82: fully repeated text maxes the dup fraction; distinct text zeroes it") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
      .withColumn("source", lit("s")).withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = graft.sources.Staging.scratchDir("curation-spec2").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CurationQueries.all.find(_.name == "q82_repetition").get
      .fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(5))).toList
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 == 0.8, s"5 grams, 1 distinct -> 0.8, got ${byId(1L)._2}")
    assert(byId(2L)._2 == 0.0)
    // 'spam spam' covers 9 chars x 5 occurrences vs 29 chars of text
    assert(byId(1L)._3 > 1.0, "overlapping top-gram char share exceeds 1 on degenerate spam")
  }

  test("q83: quantization keeps cosine ≈ 1 and bounded per-element error") {
    val out = run("q83_quantize_int8")
    val worst = out.agg(min("cos_dq"), max("l2_err"), max("scale")).head()
    assert(worst.getDouble(0) > 0.999, s"cosine drift too large: ${worst.getDouble(0)}")
    // per-element error ≤ scale/2, so l2_err ≤ sqrt(64)*scale/2 = 4*scale
    assert(worst.getDouble(1) <= 4 * worst.getDouble(2) + 1e-9)
  }
}
