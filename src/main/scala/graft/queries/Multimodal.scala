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
    //      a catalog entry). The stub payload is the UTF-8 encoding of
    //      pure-ASCII text, so every selected column IS SQL-expressible:
    //      bucket6 = histogram[6] = count of bytes with high nibble 6
    //      (regexp byte class [\x60-\x6f]), fake_width/height = first two
    //      bytes + 1 — an exact oracle, not rows-only.
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
      Some("""WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents)
             |SELECT doc_id AS id, 'text/plain' AS kind,
             |  CAST(n AS INT) AS n_bytes,
             |  CAST(len(regexp_extract_all(text, '[\x60-\x6f]')) AS BIGINT) AS bucket6,
             |  CAST(CASE WHEN n >= 1 THEN ascii(substr(text, 1, 1)) + 1 ELSE 1 END AS INT) AS fake_width,
             |  CAST(CASE WHEN n >= 2 THEN ascii(substr(text, 2, 1)) + 1 ELSE 1 END AS INT) AS fake_height
             |FROM d""".stripMargin)),

    // ---- frame-sample plumbing (MediaPipeline.sampleFrames): 64-byte
    //      pseudo-frames, keep every 4th. Frame boundaries and sizes are
    //      pure integer arithmetic, so the oracle is exact.
    "q85_media_frames" -> Q(
      (s, d) => {
        val media = graft.operators.MediaPipeline.documentsAsMedia(
          Tables.spread(Tables(s, d, "documents")))
        graft.operators.MediaPipeline.sampleFrames(media, frameBytes = 64, stride = 4)
          .toDF()
          .select(col("id"), col("frame_no"),
            expr("octet_length(frame)").as("frame_bytes"))
      },
      Some("""WITH f AS (SELECT doc_id AS id,
             |    unnest(range(0, CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT))) AS fno,
             |    octet_length(encode(text)) AS n
             |  FROM documents)
             |SELECT id, CAST(fno AS INT) AS frame_no,
             |       CAST(least(64, n - fno * 64) AS INT) AS frame_bytes
             |FROM f WHERE fno % 4 = 0""".stripMargin)),

    // ---- resize plumbing (MediaPipeline.resize): stride-sample to 100
    //      bytes. The fixture text is pure ASCII (byte i == char i+1), so
    //      the oracle rebuilds the exact resized payload with substr and
    //      the digest check is byte-level, not just size-level.
    "q86_media_resize" -> Q(
      (s, d) => {
        val media = graft.operators.MediaPipeline.documentsAsMedia(
          Tables.spread(Tables(s, d, "documents")))
        graft.operators.MediaPipeline.resize(media, target = 100)
          .toDF()
          .select(col("id"), md5(col("content")).as("digest"),
            expr("octet_length(content)").as("n_bytes"))
      },
      Some("""WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
             |j AS (SELECT unnest(range(0, 100)) AS j),
             |big AS (SELECT doc_id,
             |    string_agg(substr(text, CAST((j * n) // 100 AS INT) + 1, 1), '' ORDER BY j) AS rz
             |  FROM d, j WHERE n > 100 GROUP BY doc_id),
             |rz AS (SELECT doc_id, rz FROM big
             |       UNION ALL SELECT doc_id, text AS rz FROM d WHERE n <= 100)
             |SELECT doc_id AS id, md5(rz) AS digest,
             |       CAST(octet_length(encode(rz)) AS INT) AS n_bytes
             |FROM rz""".stripMargin))
  )
}
