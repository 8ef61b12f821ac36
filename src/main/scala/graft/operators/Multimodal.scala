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

  /** Resize planning: aspect-preserving fit into `target`×`target`
    * (the standard vision-model input prep). Pure integer/double column
    * arithmetic — the actual pixel resample happens inside the
    * per-partition decoder ([[decodeFeatures]]'s stub); planning the
    * output geometry as columns keeps it in whole-stage codegen and lets
    * a filter like "skip already-small images" push down BEFORE any
    * payload is decoded.
    */
  def resizePlan(df: DataFrame, target: Int): DataFrame = {
    val scale = least(
      lit(target.toDouble) / col("meta.width"),
      lit(target.toDouble) / col("meta.height"),
      lit(1.0)) // never upscale
    // floor(x + 0.5), not floor(x): the driving dimension computes
    // w·(target/w), which IEEE rounds to 223.999… for many widths — bare
    // floor would emit target−1 on exactly the dimension that must land
    // on target. +0.5 is also the fixed op sequence both engines
    // evaluate identically (round() rounding modes differ).
    df.withColumn("scale", scale)
      .withColumn("out_w", floor(col("meta.width") * col("scale") + lit(0.5)).cast("int"))
      .withColumn("out_h", floor(col("meta.height") * col("scale") + lit(0.5)).cast("int"))
      .withColumn("resized", col("scale") < 1.0)
  }

  /** Sampled video frame (what a real frame decoder would emit). */
  case class FrameFeature(
      doc_id: Long, frame_idx: Int, n_frames: Int, frame_digest: String)

  /** Video-ish payload: opaque bytes + typed metadata declaring the
    * frame count (derived deterministically from the doc so the oracle
    * can reproduce it).
    */
  def withVideoMeta(df: DataFrame, text: Column, nChars: Column): DataFrame =
    df.withColumn("payload", encode(text, "UTF-8"))
      .withColumn("vmeta", struct(
        (nChars % 120 + 30).cast("int").as("n_frames"),
        lit(24).as("fps")))

  /** Every-`stride`-th frame sampling: `sequence` + `explode` generate
    * the sampled frame indexes as a NARROW per-row fan-out (no shuffle —
    * the expansion happens inside the scan stage), then each sampled
    * frame is "decoded" per partition. The decode is the same
    * deterministic stub pattern as [[decodeFeatures]] (md5 over payload
    * + frame index standing in for a real frame extractor); the
    * mapPartitions batch shape — one decoder instance per partition,
    * rows streamed through it — is what a JNI/FFmpeg binding needs.
    *
    * Scale: a 100-TB video corpus fans out frames *after* payload
    * pruning and filter pushdown; only (doc_id, payload, frame_idx)
    * reach the decoder, and the payload column is dropped before
    * anything shuffles.
    */
  def sampleFrames(withPayloads: DataFrame, stride: Int): DataFrame = {
    val enc = Encoders.product[FrameFeature]
    withPayloads
      .select(col("doc_id"), col("payload"),
        col("vmeta.n_frames").as("n_frames"),
        explode(sequence(lit(0), col("vmeta.n_frames") - 1, lit(stride)))
          .as("frame_idx"))
      .mapPartitions { it =>
        // real frame decoder init would happen HERE, once per partition
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val idx = r.getAs[Int]("frame_idx")
          md.reset()
          md.update(payload)
          md.update(s":$idx".getBytes("UTF-8"))
          FrameFeature(r.getAs[Long]("doc_id"), idx, r.getAs[Int]("n_frames"),
            md.digest().map("%02x".format(_)).mkString)
        }
      }(enc)
      .toDF()
  }

  /** Blockhash-style perceptual fingerprint over an opaque image
    * payload (Yang/Weng's block mean value hash — the aHash family):
    * treat the payload's byte stream as the pixel stream, split it into
    * `nBlocks` contiguous blocks, bit b = 1 iff block b's mean exceeds
    * the global mean. Robust to small local edits (one edit moves one
    * block's mean slightly; a bit flips only near the global-mean
    * threshold) — which is exactly what makes it a NEAR-dup key where
    * [[fakeDecode]]'s md5 digest is an exact-dup key. Pure arithmetic
    * on bytes: deterministic, no decoder, oracle-replayable.
    *
    * Implemented over the codepoints of the payload's UTF-8 decode,
    * which EQUALS the byte stream on all-ASCII payloads (the synthetic
    * corpus — spec-asserted) and lets the DuckDB oracle replay via
    * ascii(); a real deployment would swap the codepoint stream for a
    * decoded-pixel stream inside the same aggregate.
    *
    * Plan shape: one narrow explode (scan-stage fan-out, payload
    * pruned immediately), then ONE aggregate computing all block sums
    * as conditional columns — no per-block shuffle, group size bounded
    * by payload length. Returns (key, blockhash: nBlocks-char
    * '0'/'1' string), the same fingerprint form as
    * [[NearDup.simhashBits]] so the Hamming-band pair miner is reused
    * verbatim.
    */
  def imageBlockHash(df: DataFrame, key: Column, payload: Column,
      nBlocks: Int): DataFrame = {
    require(nBlocks >= 1 && nBlocks <= 63,
      s"imageBlockHash: nBlocks must be in [1, 63], got $nBlocks")
    val rows = df.select(key.as("key"), decode(payload, "UTF-8").as("t"))
      // empty payloads emit NO fingerprint row: Spark's sequence(1, 0)
      // is DESCENDING ([1, 0]), not empty like DuckDB's generate_series,
      // so without this guard an empty doc would fabricate divergent
      // pixel rows instead of dropping out on both engines
      .filter(length(col("t")) > 0)
      .select(col("key"), col("t"),
        explode(sequence(lit(1), length(col("t")))).as("i"))
      .select(col("key"),
        floor(((col("i") - 1) * nBlocks).cast("double") /
          length(col("t")).cast("double")).cast("int").as("blk"),
        ascii(col("t").substr(col("i"), lit(1))).as("c"))
    val aggs = (0 until nBlocks).flatMap(b => Seq(
      sum(when(col("blk") === b, col("c"))).as(s"s$b"),
      sum(when(col("blk") === b, 1L).otherwise(0L)).as(s"n$b"))) ++ Seq(
      sum(col("c")).as("gs"), count(lit(1)).as("gn"))
    val g = rows.groupBy("key").agg(aggs.head, aggs.tail: _*)
    // block mean > global mean, strictly; an empty block (payload
    // shorter than nBlocks) reads 0. Double division of exact integer
    // sums — IEEE-identical on every engine.
    val bits = (0 until nBlocks).map(b =>
      when(col(s"n$b") > 0 &&
        col(s"s$b").cast("double") / col(s"n$b").cast("double") >
          col("gs").cast("double") / col("gn").cast("double"), "1")
        .otherwise("0"))
    g.select(col("key"), concat(bits: _*).as("blockhash"))
  }

  /** Perceptual near-dup pair mining for the multimodal columns —
    * [[imageBlockHash]] fingerprints fed through the SAME
    * pigeonhole-banded Hamming miner as text SimHash
    * ([[NearDup.simhashPairs]]): nBands contiguous bands, pairs
    * agreeing on ≥ 1 band are candidates (zero false negatives for
    * hamming < nBands), exact Hamming verified per candidate. Closes
    * the modality gap where the repo stored/decoded media but only
    * exact-deduped it.
    */
  def imageNearDupPairs(withPayloads: DataFrame, key: Column,
      nBlocks: Int, nBands: Int, maxHam: Int): DataFrame =
    NearDup.simhashPairs(
      imageBlockHash(withPayloads, key, col("payload"), nBlocks)
        .withColumnRenamed("blockhash", "simhash"),
      nBlocks, nBands, maxHam)

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
