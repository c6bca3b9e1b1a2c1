package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Gzip scalar surface (reference R9/R10: record-level conditional gzip on
  * the Kinesis path, `GzipUtil.java:27-70` — compress, magic-byte sniff,
  * transparent-passthrough decompress). Spark has no gzip scalar, so these
  * are Scala UDFs; they sit outside the hot relational path (payload
  * compression happens once per record at the sink edge, reference
  * `KinesisJob.java:66-73`), so codegen parity is not worth a custom
  * Expression here.
  */
object Gzip {

  def compress(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bytes.length / 2 + 16)
    val gz = new GZIPOutputStream(bos)
    try gz.write(bytes) finally gz.close()
    bos.toByteArray
  }

  /** Reference `GzipUtil.isCompressed`: leading gzip magic 0x1f 0x8b. */
  def isCompressed(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && bytes(0) == 0x1f.toByte && bytes(1) == 0x8b.toByte

  /** Transparent decompress: gunzip if the magic matches, else identity
    * (reference ships small records uncompressed below a size threshold).
    */
  def decompress(bytes: Array[Byte]): Array[Byte] = {
    if (!isCompressed(bytes)) return bytes
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
    val out = new ByteArrayOutputStream(bytes.length * 3 + 16)
    val buf = new Array[Byte](8192)
    try {
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    out.toByteArray
  }

  /** Conditional compression, reference R9: gzip only above `threshold`
    * UTF-8 bytes (`a2.kinesis.file.size.threshold`, default 512).
    */
  def compressIfLarge(s: String, threshold: Int): Array[Byte] = {
    val raw = s.getBytes(UTF_8)
    if (raw.length > threshold) compress(raw) else raw
  }

  private val gzipConditionalUdf =
    udf((s: String, t: Int) => if (s == null) null else compressIfLarge(s, t))
  private val gunzipStrUdf =
    udf((b: Array[Byte]) => if (b == null) null else new String(decompress(b), UTF_8))

  /** Column API: conditional gzip of a string column → binary. */
  def gzip_if_large(c: Column, threshold: Column): Column = gzipConditionalUdf(c, threshold)

  /** Column API: sniffing gunzip of a binary column → string. */
  def gunzip_str(c: Column): Column = gunzipStrUdf(c)
}
