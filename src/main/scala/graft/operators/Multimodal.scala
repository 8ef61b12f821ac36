package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder prompt): image/audio/video as
  * opaque `binary` payloads with typed metadata, decoded per partition.
  *
  * The Spark-side shape is real and tested — binary column, metadata
  * struct, per-partition batch "decode" via `mapPartitions` (the pattern
  * a JNI/FFmpeg/PIL decoder needs: one decoder instance per partition,
  * batched rows through it, no per-row init cost). The decode itself is
  * STUBBED with a deterministic fake (this container has no media libs):
  * it derives features from payload bytes/metadata only. Swap
  * [[fakeDecode]] for a real decoder at deployment; everything around it
  * (schema, partitioning, batch shape) stays.
  *
  * Scale notes: payloads never shuffle — features are extracted in the
  * scan stage and the payload column is pruned immediately after;
  * metadata-only queries never touch the binary (columnar parquet).
  */
object Multimodal {

  /** Decoded feature row (what a real image decoder would emit). */
  case class MediaFeature(
      doc_id: Long, fmt: String, width: Int, height: Int,
      n_pixels: Long, n_bytes: Long, digest: String)

  /** Attach an opaque binary payload + typed metadata struct to a
    * document frame (models ingestion of raw media alongside text).
    */
  def withPayload(df: DataFrame, key: Column, text: Column, nChars: Column): DataFrame =
    df.withColumn("payload", encode(text, "UTF-8"))
      .withColumn("meta", struct(
        (nChars % 640 + 1).cast("int").as("width"),
        (nChars % 480 + 1).cast("int").as("height"),
        when(nChars % 2 === 0, "png").otherwise("jpeg").as("fmt")))

  /** STUB decoder: deterministic features from bytes + metadata. A real
    * implementation would hand `it` (a partition's rows) to a native
    * decoder in batches.
    */
  private def fakeDecode(docId: Long, fmt: String, w: Int, h: Int, payload: Array[Byte]): MediaFeature = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(payload).map("%02x".format(_)).mkString
    MediaFeature(docId, fmt, w, h, w.toLong * h.toLong, payload.length.toLong, digest)
  }

  /** Per-partition batch decode: mapPartitions so a real decoder is
    * initialized once per partition, not per row (the same pattern the
    * reference uses for its per-partition HTTP client,
    * extraction.py:240-246).
    */
  def decodeFeatures(withPayloads: DataFrame): DataFrame = {
    val enc = Encoders.product[MediaFeature]
    withPayloads
      .select(col("doc_id"), col("meta.fmt").as("fmt"), col("meta.width").as("w"),
        col("meta.height").as("h"), col("payload"))
      .mapPartitions { it =>
        // decoder init would happen HERE, once per partition
        it.map(r => fakeDecode(r.getLong(0), r.getString(1), r.getInt(2),
          r.getInt(3), r.getAs[Array[Byte]]("payload")))
      }(enc)
      .toDF()
  }
}
