package graft

import graft.sources.Jsonl
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gzipped-JSONL round-trip: the reference's embedding interchange
  * format (embed.py:84-86 → semantic.py:26-31).
  */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  test("embedding table round-trips through gzipped JSONL") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString + "/emb"
    val df = Seq(
      ("p1", Seq(0.1, 0.2, 0.3)),
      ("p2", Seq(0.4, 0.5, 0.6))).toDF("parent_asin", "embed")
    Jsonl.write(df, dir)

    // files actually gzip-compressed
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".json.gz")), files.mkString(","))

    val schema = StructType(Seq(
      StructField("parent_asin", StringType),
      StructField("embed", ArrayType(DoubleType))))
    val back = Jsonl.read(spark, schema, dir)
    val got = back.orderBy("parent_asin").collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got == Map("p1" -> Seq(0.1, 0.2, 0.3), "p2" -> Seq(0.4, 0.5, 0.6)))
  }

  test("schema-explicit read tolerates missing fields as nulls") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl2").toString + "/d"
    Seq("""{"parent_asin":"x"}""").toDF("value")
      .write.mode("overwrite").text(dir)
    val schema = StructType(Seq(
      StructField("parent_asin", StringType),
      StructField("embed", ArrayType(DoubleType))))
    val back = Jsonl.read(spark, schema, dir)
    val row = back.head()
    assert(row.getString(0) == "x" && row.isNullAt(1))
  }
}
