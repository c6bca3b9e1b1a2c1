package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** Multimodal-column surface (SURVEY.md §2.2 Q43): media as opaque
  * `binary` columns carrying a typed metadata struct. The fixture corpus
  * has no real media, so the "payload" is the UTF-8 encoding of the text
  * column — the Spark-side plumbing (binary column, struct metadata,
  * per-batch decode via mapPartitions) is real and is what's tested; the
  * decoder itself is the deterministic stub in
  * [[graft.operators.MediaPipeline]].
  */
object Multimodal {

  def defs: ListMap[String, Q] = ListMap(

    // ---- binary column + metadata struct construction and inspection
    "q70_multimodal_meta" -> Q(
      (s, d) => {
        Tables(s, d, "documents")
          .select(col("doc_id"),
            encode(col("text"), "UTF-8").as("content"),
            struct(col("lang"), col("source"), col("n_chars")).as("meta"))
          .select(col("doc_id"),
            expr("octet_length(content)").as("n_bytes"),
            col("meta.lang").as("lang"),
            col("meta.source").as("source"),
            col("meta.n_chars").as("n_chars"))
      },
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
             |  lang, source, n_chars
             |FROM documents""".stripMargin)),

    // ---- batched decode → feature frame (the stubbed-codec pipeline as
    //      a catalog entry; rows-only check — the 16-bucket byte
    //      histogram has no tractable SQL oracle, its determinism is
    //      asserted in FunctionsSpec instead)
    "q71_media_features" -> Q(
      (s, d) => {
        val media = graft.operators.MediaPipeline.documentsAsMedia(
          Tables.spread(Tables(s, d, "documents")))
        graft.operators.MediaPipeline.extractFeatures(media)
          .toDF()
          .select(col("id"), col("kind"), col("n_bytes"),
            element_at(col("histogram"), 7).as("bucket6"),
            col("fake_width"), col("fake_height"))
      },
      None)
  )
}
