package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.RollingHashExpression

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract
  * run as partition-local batch transforms.
  *
  * The Spark-side architecture here is real and tested — schema, typed
  * Dataset boundary, `mapPartitions` batching (the Scala analogue of
  * `mapInPandas`: one iterator per partition, amortized per-batch setup,
  * no per-row interpreter crossings), partition sizing. The actual codec
  * call is STUBBED with a deterministic fake (this container has no image/
  * audio libraries): `fakeDecode` derives metadata and a feature vector
  * from the payload bytes via rolling hashes. Swapping in a real decoder
  * changes ONE function (`decodeBatch`'s body), not the pipeline.
  */
object Multimodal {

  /** Typed media record at the decode boundary. */
  final case class MediaRecord(media_id: Long, source: String, payload: Array[Byte])

  /** Decoded features: metadata + fixed-dim feature vector. */
  final case class MediaFeatures(
      media_id: Long, source: String,
      width: Int, height: Int, channels: Int, format: String,
      n_bytes: Long, features: Array[Float])

  val FeatureDim = 16

  /** STUB decode — deterministic pure function of the payload bytes.
    * Replace with a real codec (e.g. javax.imageio / ffmpeg bindings) here;
    * everything upstream/downstream is production-shaped. */
  private def fakeDecode(r: MediaRecord): MediaFeatures = {
    var h = 1125899906842597L
    var i = 0
    while (i < r.payload.length) { h = h * 31 + r.payload(i); i += 1 }
    val feats = new Array[Float](FeatureDim)
    var j = 0
    var s = h
    while (j < FeatureDim) {
      s = s * 6364136223846793005L + 1442695040888963407L // LCG walk
      feats(j) = (s >>> 11).toFloat / (1L << 53).toFloat
      j += 1
    }
    MediaFeatures(
      r.media_id, r.source,
      width = 1 + math.floorMod(h, 1920).toInt,
      height = 1 + math.floorMod(h >> 16, 1080).toInt,
      channels = 1 + math.floorMod(h >> 32, 4).toInt,
      format = if (math.floorMod(h, 2) == 0) "png" else "jpeg",
      n_bytes = r.payload.length.toLong,
      features = feats)
  }

  /** Batch decode over one partition's iterator — the seam where a real
    * implementation would allocate its codec once per partition. */
  private def decodeBatch(it: Iterator[MediaRecord]): Iterator[MediaFeatures] = {
    // per-partition setup would go here (codec handles, model weights, ...)
    it.map(fakeDecode)
  }

  /** Attach a binary payload column to any (id, source, text) table — the
    * stand-in ingest for media blobs in the test corpus. */
  def payloadFromText(df: DataFrame, idCol: String, srcCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(srcCol).as("source"),
      col(textCol).cast("binary").as("payload"))

  /** The decode pipeline: DataFrame → typed boundary → partition-batched
    * decode → DataFrame of features. Repartitions so each task holds a
    * bounded byte volume (at scale: tune target bytes/task, not task count). */
  def decodeFeatures(payloads: DataFrame, partitions: Int = 0): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    val ds: Dataset[MediaRecord] = {
      val base = payloads.as[MediaRecord]
      if (partitions > 0) base.repartition(partitions) else base
    }
    ds.mapPartitions(decodeBatch _).toDF()
  }

  /** Resized media record: same payload identity, target geometry attached.
    * A real implementation transforms pixels in `resizeBatch`; the stub
    * rescales the fake geometry deterministically. */
  final case class ResizedMedia(
      media_id: Long, source: String,
      width: Int, height: Int, resized_payload: Array[Byte])

  /** Resize pipeline: decode-shaped partition-batched transform with a
    * target box (aspect-preserving fit — the geometry every image pipeline
    * wants). Stub keeps the payload bytes; a real codec would re-encode. */
  def resizeTo(payloads: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.as[MediaRecord].mapPartitions { it =>
      // per-partition codec setup seam (same as decodeBatch)
      it.map { r =>
        val d = fakeDecode(r)
        val scale = math.min(1.0,
          math.min(maxW.toDouble / d.width, maxH.toDouble / d.height))
        ResizedMedia(r.media_id, r.source,
          math.max(1, (d.width * scale).toInt),
          math.max(1, (d.height * scale).toInt),
          r.payload)
      }
    }.toDF()
  }

  /** Frame sampling for video-shaped payloads: emit every `stride`-th
    * frame index up to the stub-derived frame count — the explode-shaped
    * transform (one row in, k rows out) a video pipeline runs before
    * per-frame decode. Frame payload extraction is the stubbed seam. */
  def sampleFrames(payloads: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.as[MediaRecord].mapPartitions { it =>
      it.flatMap { r =>
        val d = fakeDecode(r)
        val nFrames = 1 + math.floorMod(d.n_bytes, 240L).toInt // stub: ≤10s@24fps
        (0 until nFrames by stride).map(f => (r.media_id, r.source, f, nFrames))
      }
    }.toDF("media_id", "source", "frame_index", "n_frames")
  }

  /** Per-source feature statistics over the decoded output — the query
    * shape a training pipeline runs to monitor a media corpus.
    *
    * The per-row feature energy (a full-mantissa double) goes through an
    * exact DECIMAL(18,9) intermediate before the cross-row mean, so the
    * result is independent of distributed summation order (the q03
    * pattern): both engines round the same double to the same 9-dp
    * decimal, sum exactly, and divide in double. Width/height sums are
    * exact integers in double, so their plain averages are already
    * order-independent. */
  def featureStats(features: DataFrame): DataFrame = {
    val energy = aggregate(col("features"), lit(0.0), (acc, v) => acc + v * v)
    features.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        avg(col("width").cast("double")).as("avg_width"),
        avg(col("height").cast("double")).as("avg_height"),
        count_if(col("format") === "png").as("n_png"),
        (sum(energy.cast("decimal(18,9)")).cast("double")
          / count(lit(1)).cast("double")).as("avg_feature_energy"))
      .orderBy(col("source"))
  }
}
