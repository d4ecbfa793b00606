package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the engine
  * as opaque `binary` columns plus a typed metadata struct; decode /
  * feature-extraction runs per partition in batches.
  *
  * The actual media decode is STUBBED (no codec libraries in this
  * environment — see `FakeDecoder`): the Spark-side contract — schema,
  * batch shape, partition-local decoder lifecycle, deterministic output —
  * is real and tested. Swapping `FakeDecoder.decode` for a JNI/javacpp
  * decoder changes nothing upstream.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  case class MediaMeta(mime: String, sizeBytes: Long, sourceUri: String)

  /** One media row entering the decode stage. */
  case class MediaRow(mediaId: Long, payload: Array[Byte], meta: MediaMeta)

  /** Decoded features leaving the decode stage. */
  case class MediaFeatures(
      mediaId: Long,
      width: Int,
      height: Int,
      nFrames: Int,
      embedding: Array[Double]
  )

  /** The decoder seam: a real implementation opens its native handle
    * (libjpeg/ffmpeg via JNI) lazily inside the task and decodes batches;
    * the engine's contract is only this interface. Must be Serializable —
    * the FACTORY ships to executors, one instance is built per partition.
    */
  trait MediaDecoder extends Serializable {
    def decode(row: MediaRow): MediaFeatures
  }

  /** STUB decoder — deterministic fake standing in for a real codec.
    * A real implementation would decode `payload` (e.g. libjpeg/ffmpeg via
    * JNI); this derives stable pseudo-features from the bytes (Java
    * Arrays.hashCode over the payload — replicable byte-for-byte by the
    * DuckDB oracle) so the pipeline is end-to-end verifiable. One instance
    * per partition, mirroring how a native decoder handle would be opened
    * once per task.
    */
  final class FakeDecoder extends MediaDecoder {
    def decode(row: MediaRow): MediaFeatures = {
      val h = java.util.Arrays.hashCode(row.payload).toLong & 0x7fffffffL
      val width = (h % 640L).toInt + 16
      val height = ((h / 640L) % 480L).toInt + 16
      val nFrames = if (row.meta.mime.startsWith("video/")) (h % 120L).toInt + 1 else 1
      val emb = Array.tabulate(8) { i =>
        (((h * 2654435761L + i * 40503L) & 0xffffL).toDouble / 65535.0) * 2.0 - 1.0
      }
      MediaFeatures(row.mediaId, width, height, nFrames, emb)
    }
  }

  /** Decode stage: per-partition batch decode with a partition-local
    * decoder instance. `mapPartitions` (not `map`) so decoder setup cost is
    * amortized per task — the shape that matters when decode is a native
    * library call.
    */
  def decodeFeatures(media: Dataset[MediaRow],
      mkDecoder: () => MediaDecoder = () => new FakeDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = mkDecoder() // one per partition/task
      rows.map(decoder.decode)
    }
  }

  /** Demo ingestion: wrap the `documents` table's text bytes as fake media
    * payloads (the environment has no real media files) — exercises the
    * binary column + metadata struct + decode pipeline end to end.
    * `mimeCol` lets callers assign media types (the default marks nothing
    * as video; pass a CASE over doc ids to exercise the video path).
    */
  def documentsAsMedia(spark: SparkSession, docs: DataFrame,
      mimeCol: org.apache.spark.sql.Column = null): Dataset[MediaRow] = {
    import spark.implicits._
    val mime = Option(mimeCol).getOrElse(concat(lit("fake/"), col("source")))
    docs.select(
      col("doc_id").as("mediaId"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        mime.as("mime"),
        col("n_chars").as("sizeBytes"),
        concat(lit("mem://doc/"), col("doc_id")).as("sourceUri")
      ).as("meta")
    ).as[MediaRow]
  }

  /** Resize stage: fit decoded dimensions within (maxW, maxH) preserving
    * aspect ratio, never upscaling. The dimension math is codec-independent
    * and runs as pure codegen'd column arithmetic — only the pixel
    * resampling itself belongs behind the `MediaDecoder` seam.
    */
  def resizeTo(features: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val factor = least(lit(1.0),
      lit(maxW.toDouble) / col("width"), lit(maxH.toDouble) / col("height"))
    features
      .withColumn("r_width", greatest(lit(1L), round(col("width") * factor).cast("long")))
      .withColumn("r_height", greatest(lit(1L), round(col("height") * factor).cast("long")))
  }

  /** Frame-sampling stage: up to `targetFrames` evenly-spaced frame indices
    * per media row (step = ceil(nFrames / target)), exploded to one row per
    * kept frame — the planning half of video decode ("which frames reach
    * the decoder"), as pure column ops; images sample their single frame.
    */
  def sampleFrames(features: DataFrame, targetFrames: Int): DataFrame = {
    val step = greatest(lit(1L),
      ceil(col("nFrames") / lit(targetFrames.toDouble)).cast("long"))
    // a frame-less row (nFrames <= 0) contributes no rows rather than
    // making sequence() throw on an empty 0..-1 range
    features
      .filter(col("nFrames") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("nFrames").cast("long") - 1, step)))
  }
}
