package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal decode plumbing (SURVEY.md §2.2 Q43): media rows are
  * (id, content: binary, meta struct); decoding runs partition-local in
  * fixed-size batches via mapPartitions — the Spark-side shape (schema,
  * partitioning, batch grouping) is the real design; the decoder itself
  * is STUBBED deterministically because no image/audio libraries exist in
  * this container. On a real cluster the stub body is replaced by the
  * codec call (e.g. JPEG decode / audio frame sample); nothing else
  * changes.
  */
object MediaPipeline {

  final case class MediaRow(id: Long, content: Array[Byte], kind: String)
  final case class MediaFeature(
      id: Long, kind: String, n_bytes: Int,
      histogram: Array[Long], // 16-bucket byte histogram — the stub "decode"
      fake_width: Int, fake_height: Int)

  val DecodeBatchSize = 64

  /** STUB decoder — deterministic fake feature extraction standing in for
    * a real codec: a 16-bucket byte histogram plus "dimensions" derived
    * from the first bytes. Runs over one decode batch, mimicking a
    * batched-codec call shape (batch in, batch out).
    */
  private def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeature] =
    rows.map { r =>
      val hist = new Array[Long](16)
      r.content.foreach(b => hist((b & 0xff) >> 4) += 1)
      val w = if (r.content.length >= 1) (r.content(0) & 0xff) + 1 else 1
      val h = if (r.content.length >= 2) (r.content(1) & 0xff) + 1 else 1
      MediaFeature(r.id, r.kind, r.content.length, hist, w, h)
    }

  /** Partition-local batched decode: groups each partition's iterator
    * into DecodeBatchSize chunks (bounded memory — never materializes a
    * partition) and runs the stub codec per chunk.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(DecodeBatchSize).flatMap(decodeBatch))
  }

  /** Documents table → media-shaped frame (binary payload + typed
    * metadata), the fixture stand-in for an image/audio corpus.
    */
  def documentsAsMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("id"),
        encode(col("text"), "UTF-8").as("content"),
        lit("text/plain").as("kind"))
      .as[MediaRow]
  }

  // ---- STUB codec verbs: each has the real Spark-side shape (schema,
  // partition-local batching, deterministic output) with the actual
  // codec call replaced by a byte-level fake, clearly marked. On a
  // cluster with codecs installed only the marked line changes.

  /** "Resize": deterministic byte-domain downsample to `target` bytes
    * (stride sampling — stands in for pixel-domain resampling).
    */
  def resize(media: Dataset[MediaRow], target: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val n = r.content.length
      val out =
        if (n <= target) r.content
        else Array.tabulate(target)(i => r.content((i.toLong * n / target).toInt)) // STUB: real impl = image resample
      r.copy(content = out)
    })
  }

  /** "Frame sample": split the payload into fixed-size pseudo-frames and
    * keep every `stride`-th one (stands in for video frame extraction).
    * Output schema carries (id, frame_no, frame bytes).
    */
  final case class MediaFrame(id: Long, frame_no: Int, frame: Array[Byte])

  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, stride: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.content.grouped(frameBytes).zipWithIndex // STUB: real impl = container demux
        .collect { case (f, i) if i % stride == 0 => MediaFrame(r.id, i, f) }
    }
  }
}
