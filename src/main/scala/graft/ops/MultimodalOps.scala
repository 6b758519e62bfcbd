package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque
  * `BINARY` columns with a typed metadata struct; decode / feature
  * extraction runs batched per partition so a real codec (JNI image
  * lib, ffmpeg bindings) can amortize init cost per task, exactly like
  * a Pandas-UDF batch would.
  *
  * The decode kernel itself is a clearly marked STUB (this container
  * ships no image/audio codecs): it derives deterministic pseudo
  * features from the bytes. Everything around it — schema, batch
  * iteration, partitioning, output shape — is the real Spark plumbing
  * a production decoder would drop into.
  */
object MultimodalOps {

  /** Canonical media row: payload + typed metadata. */
  case class MediaRow(
      media_id: Long,
      media: Array[Byte],
      format: String,
      width: Int,
      height: Int)

  case class MediaFeatures(
      media_id: Long,
      byte_len: Long,
      mean_byte: Double,
      feature: Array[Float])

  /** Wrap a DataFrame with binary payloads into the canonical schema.
    * `media` must be BINARY; metadata columns are normalized.
    */
  def asMediaTable(df: DataFrame, idCol: String, mediaCol: String,
      format: String, width: Int = 0, height: Int = 0): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(mediaCol).cast("binary").as("media"),
      lit(format).as("format"),
      lit(width).as("width"),
      lit(height).as("height"))

  /** Batched decode + feature extraction over partitions.
    *
    * STUB KERNEL: a real implementation replaces the body of
    * `decodeOne` with an actual codec call; the iterator shape (one
    * task = one batch of rows, codec initialized once per partition)
    * is what a production decoder needs and is preserved here.
    */
  def decodeAndFeaturize(media: DataFrame, featureDim: Int = 8)
      : Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.selectExpr("media_id", "media").as(
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        // per-partition "codec init" happens here (once per task)
        rows.map { case (id, bytes) => decodeOne(id, bytes, featureDim) }
      }
  }

  /** ??? real codec goes here ??? — deterministic stand-in features:
    * byte statistics + a folded histogram, stable across runs.
    */
  private def decodeOne(id: Long, bytes: Array[Byte], dim: Int)
      : MediaFeatures = {
    val len = if (bytes == null) 0L else bytes.length.toLong
    var sum = 0.0
    val hist = new Array[Float](dim)
    var i = 0
    while (i < len) {
      val b = bytes(i.toInt) & 0xff
      sum += b
      hist(b % dim) += 1.0f
      i += 1
    }
    MediaFeatures(id, len, if (len == 0) 0.0 else sum / len, hist)
  }

  /** "Resize" stub: records the target dims in metadata; payload is
    * passed through untouched (a codec would re-encode here). Keeps
    * the schema contract a real resize operator needs.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("width", lit(w)).withColumn("height", lit(h))

  /** Frame sampling stub for video payloads: emits `n` (media_id,
    * frame_idx, frame_bytes) rows per input by slicing the payload —
    * the explode shape and per-frame binary column are real.
    */
  def sampleFrames(media: DataFrame, n: Int): DataFrame =
    media.select(col("media_id"),
      posexplode(transform(sequence(lit(0), lit(n - 1)),
        i => substring(col("media"), i * 16 + lit(1), lit(16)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")
}
