package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing: media as opaque binary + typed metadata.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic stub ([[decodeStub]]); everything around
  * it — the binary column representation, the typed record schema, the
  * per-partition batch shape a real decoder needs (load model/codec once
  * per partition, stream records through it), and the downstream feature
  * aggregation — is real Spark and runs in tests and Verify.
  *
  * At scale: media bytes stay columnar in parquet, decode is
  * mapPartitions (one codec init per partition, no per-row setup),
  * features are small fixed-width vectors so downstream aggregation
  * shuffles features, never raw media.
  */
object Multimodal {

  /** A media record: opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, format: String, byte_size: Long, payload: Array[Byte])

  /** Extracted features (what a real image/audio model would emit). */
  case class MediaFeatures(media_id: Long, format: String, byte_size: Long,
      checksum: Long, brightness: Double, n_frames: Int)

  /** The decode/feature-extract stub: deterministic byte statistics standing
    * in for a real codec. A production build replaces ONLY this function
    * (e.g. JNI to ffmpeg/libjpeg); the pipeline shape does not change.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < r.payload.length) { sum = sum * 31 + (r.payload(i) & 0xff); i += 1 }
    MediaFeatures(
      media_id = r.media_id,
      format = r.format,
      byte_size = r.byte_size,
      checksum = sum,
      brightness = if (r.payload.isEmpty) 0.0
        else r.payload.map(b => (b & 0xff).toDouble).sum / r.payload.length / 255.0,
      n_frames = 1 + (r.media_id % 30).toInt)
  }

  /** Documents recast as a media table: payload = utf8 bytes (stand-in for
    * image/audio bytes), format from source, size from n_chars.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        $"doc_id".as("media_id"),
        concat(lit("fmt_"), pmod($"doc_id", lit(3))).as("format"),
        $"n_chars".cast("long").as("byte_size"),
        encode($"text", "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** Full pipeline: media scan → per-partition decode (stub) → per-format
    * feature rollup. mapPartitions is the mapInPandas-equivalent batch
    * boundary: a real codec initializes once per iterator.
    */
  def multimodalPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val features = mediaTable(spark, dir)
      .mapPartitions { it => it.map(decodeStub) } // codec plug point
    features.toDF()
      .groupBy($"format")
      .agg(
        count(lit(1)).as("n_media"),
        sum($"byte_size").as("total_bytes"),
        avg($"brightness").as("avg_brightness"),
        sum($"n_frames").as("total_frames"),
        countDistinct($"checksum").as("distinct_payloads"))
      .orderBy($"format")
  }

  /** Frame sampling + resize planning over decoded media: every 4th frame
    * index is kept (stride sampling — the "sample N frames per video" step
    * of a vision-training pipeline), each sampled frame gets a
    * deterministic checksum and a per-format resize target; the rollup
    * counts sampled frames and estimated post-resize bytes per format.
    *
    * The frame stream is generated per row (sequence + explode — map-side,
    * no shuffle until the final rollup); a real build replaces the
    * checksum/resize stubs with the codec's frame grab + scaler inside the
    * same mapPartitions boundary as [[decodeStub]].
    */
  def multimodalFrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stride = 4
    val features = mediaTable(spark, dir)
      .mapPartitions(_.map(decodeStub)) // codec plug point (once per partition)
      .toDF()
    val resizeTarget = when($"format" === "fmt_0", 224)
      .when($"format" === "fmt_1", 336)
      .otherwise(512) // per-format target edge length (stub policy table)
    features
      .select($"media_id", $"format", $"byte_size",
        explode(sequence(lit(1), $"n_frames")).as("frame_idx"))
      .filter(pmod($"frame_idx", lit(stride)) === 1)
      .withColumn("frame_checksum", xxhash64($"media_id", $"frame_idx"))
      .withColumn("resize_edge", resizeTarget)
      .withColumn("resized_bytes", ($"resize_edge" * $"resize_edge" * 3).cast("long"))
      .groupBy($"format")
      .agg(
        countDistinct($"media_id").as("n_media"),
        count(lit(1)).as("n_sampled_frames"),
        countDistinct($"frame_checksum").as("distinct_frames"),
        max($"resize_edge").as("resize_edge"),
        sum($"resized_bytes").as("total_resized_bytes"))
      .orderBy($"format")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_pipeline"    -> (multimodalPipeline _),
    "multimodal_framesample" -> (multimodalFrameSample _)
  )
}
