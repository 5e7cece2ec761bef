package graft.queries

import graft.multimodal.Multimodal
import graft.pipeline.EmbedJob
import graft.qa.Retriever
import graft.similarity.Knn
import graft.sources.Tables
import graft.text.StableHash
import graft.vector.VectorOps
import org.apache.spark.sql.functions._

/** Pipeline extensions: ANN similarity search, multimodal decode
  * plumbing, the offline embedding job (reference entry point A), and
  * the RAG retrieval dataflow (reference entry point C).
  */
object PipelineQueries {
  import Helpers._

  val all: Seq[Q] = Seq(

    // ANN top-k: hyperplane-LSH bucket pruning + exact rerank. Candidate
    // set depends on seeded xxhash/Random planes → rows-only check;
    // recall-vs-brute-force is asserted in SimilaritySpec.
    Q("q25_ann_topk", (s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("vec"))
      val qv = emb.filter(col("vec_id") === 0).head().getSeq[Double](1).toArray
      Knn.annTopK(emb, "vec_id", "vec", dim = 64, query = qv, k = 20)
    }, None),

    // IVF ANN: deterministic coarse k-means cells + nprobe search.
    // Centroid model depends on the training loop → rows-only; IvfSpec
    // proves determinism and the nprobe=k ≡ brute-force degeneracy.
    Q("q26_ivf_topk", (s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("vec"))
      val qv = emb.filter(col("vec_id") === 0).head().getSeq[Double](1).toArray
      val model = graft.similarity.Ivf.train(emb, "vec_id", "vec", k = 16, iters = 3)
      graft.similarity.Ivf.topK(emb, "vec_id", "vec", model, qv, k = 20, nprobe = 4)
    }, None),

    // Multimodal decode: binary payload + metadata → batched partition-
    // wise feature extraction (deterministic stub decoder). For ASCII
    // payloads brightness == mean codepoint, which DuckDB can mirror —
    // so even the stub is oracle-checked.
    Q("q50_multimodal_features", (s, dir) => {
      Multimodal.decodeFeatures(
          Multimodal.mediaFromDocuments(Tables.documents(s, dir)))
        .select(col("id"), col("kind"), col("n_bytes").cast("long").as("n_bytes"),
          round(col("brightness"), 6).as("brightness"))
        .orderBy("id")
    }, Some(
      """SELECT doc_id AS id,
        | (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
        | CAST(length(text) AS BIGINT) AS n_bytes,
        | round(CAST(list_sum(list_transform(string_split(text, ''), c -> ascii(c))) AS DOUBLE)
        |   / greatest(length(text), 1), 6) AS brightness
        |FROM documents ORDER BY id""".stripMargin)),

    // Offline embedding build (embed.py end-to-end): clean → len-filter →
    // hash-embed → mean-pool per source. StableHash's DuckDB mirror makes
    // the hashed-TF vectors exactly reproducible in SQL; output exploded
    // to scalar rows (source, pos, value) for the driver's comparator.
    Q("q51_embed_job", (s, dir) => {
      EmbedJob.groupEmbeddings(Tables.documents(s, dir), "text", "source")
        .select(col("source"),
          posexplode(VectorOps.roundVec(col("embedding"), 6)).as(Seq("pos", "value")))
        .select(col("source"), col("pos").cast("long").as("pos"), col("value"))
        .orderBy("source", "pos")
    }, Some(
      s"""WITH f AS (SELECT source, string_split(clean, ' ') AS toks FROM
         |    (SELECT source, ${cleanTextSql("text")} AS clean FROM documents)
         |  WHERE len(string_split(clean, ' ')) > 5),
         |e AS (SELECT source, ${StableHash.hashEmbedSql("toks", 64)} AS vec FROM f)
         |SELECT source, pos1 - 1 AS pos, round(avg(val), 6) AS value FROM (
         |  SELECT source, unnest(vec) AS val, generate_subscripts(vec, 1) AS pos1 FROM e)
         |GROUP BY source, pos1 ORDER BY source, pos""".stripMargin)),

    // RAG retrieval (rag.py dataflow): field-chunked meta of the focused
    // doc, hash-embedded, cosine top-3 vs the question — the whole
    // retrieval dataflow (chunking, embedding, ranking) replayed in SQL.
    Q("q52_rag_retrieve", (s, dir) => {
      val meta = metaAnalog(Tables.documents(s, dir))
      val chunks = Retriever.chunksFromMeta(meta, "id",
        Seq("title", "summary", "rating", "review_count", "price"))
      Retriever.retrieve(chunks, focusId = 1L,
        question = "what is the price and rating of this product")
    }, Some {
      val fields = Seq("title", "summary", "rating", "review_count", "price")
      val chunkRows = fields.map { f =>
        s"SELECT '$f' AS field, CASE WHEN $f IS NULL THEN '$f' " +
          s"ELSE '$f: ' || CAST($f AS VARCHAR) END AS chunk FROM meta WHERE id = 1"
      }.mkString("\n  UNION ALL ")
      val qToks = "what is the price and rating of this product"
        .split("\\s+").map(t => s"'$t'").mkString("[", ",", "]")
      s"""WITH meta AS ($metaAnalogSql),
         |chunks AS ($chunkRows),
         |emb AS (SELECT field, chunk,
         |  ${StableHash.hashEmbedSql(s"string_split(${cleanTextSql("chunk")}, ' ')", 64)} AS vec
         |  FROM chunks),
         |q AS (SELECT ${StableHash.hashEmbedSql(qToks, 64)} AS qv)
         |SELECT field, chunk, round(${cosineSql("vec", "qv")}, 6) AS sim
         |FROM emb CROSS JOIN q
         |ORDER BY sim DESC, field ASC LIMIT 3""".stripMargin
    }),

    // Extractive blurb template — the deterministic substitute for the
    // reference's LLaVA summarizer (summarize.py:44-57, SURVEY §2.9).
    // Rating values are exact one-decimal doubles, so %.1f renders
    // identically in Java and C printf.
    Q("q53_blurbs", (s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id").as("id"),
          format_string("%s (%s) - rated %.1f/5",
            substring(col("text"), 1, 40), col("source"),
            coalesce(when(col("doc_id") % 5 === 0, lit(null))
              .otherwise(lit(3.0) + (col("doc_id") % 21) / lit(10.0)), lit(4.3))).as("blurb"))
        .orderBy("id")
    }, Some(
      """SELECT doc_id AS id,
        | printf('%s (%s) - rated %.1f/5', substr(text, 1, 40), source,
        |   coalesce(CASE WHEN doc_id % 5 = 0 THEN NULL
        |            ELSE 3.0 + (doc_id % 21)/10.0 END, 4.3)) AS blurb
        |FROM documents ORDER BY id""".stripMargin)),

    // Model-output cleanup (summarize.py:11-25): strip outer quotes, keep
    // text after the last ASSISTANT: marker, strip end markers.
    Q("q54_extract_summary", (s, dir) => {
      val raw = concat(lit("\"USER: "), substring(col("text"), 1, 20),
        lit(" ASSISTANT: "), substring(col("text"), 21, 40), lit("</s>\""))
      Tables.documents(s, dir)
        .select(col("doc_id").as("id"),
          graft.text.TextOps.extractSummary(raw).as("summary"))
        .orderBy("id")
    }, Some(
      """SELECT doc_id AS id,
        | trim(regexp_replace(
        |   CASE WHEN strpos(unq, 'ASSISTANT:') > 0
        |        THEN string_split(unq, 'ASSISTANT:')[-1] ELSE unq END,
        |   '(</s>|\[END\]|\[/ASSISTANT\])+$', '', 'g')) AS summary
        |FROM (SELECT doc_id,
        |  regexp_replace(regexp_replace(
        |    '"USER: ' || substr(text, 1, 20) || ' ASSISTANT: ' || substr(text, 21, 40) || '</s>"',
        |    '^"', ''), '"$', '') AS unq
        | FROM documents)
        |ORDER BY id""".stripMargin)))
}
