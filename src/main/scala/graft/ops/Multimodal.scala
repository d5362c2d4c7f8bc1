package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) plumbing: opaque `binary` payload
  * columns + typed metadata, with decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side plumbing (schema, per-partition batching, partition
  * sizing) is real and tested; the codec itself is STUBBED with a
  * deterministic fake (this container ships no image/audio libraries):
  * payloads carry a 16-byte fake header [magic, kind, width, height,
  * duration_ms] that `decodeStub` parses. Swapping `decodeStub` for a
  * real JNI/ffmpeg decoder changes no schema or partitioning.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, duration_ms: Int)

  case class MediaFeatures(media_id: Long, kind: String, width: Int,
      height: Int, duration_ms: Int, n_bytes: Int, mean_byte: Double,
      feature: Seq[Float])

  val Magic = 0x4D4D /* "MM" */

  /** Deterministic fake payload: header + seeded body bytes. */
  def fakeBytes(id: Long, kind: String, w: Int, h: Int, dur: Int): Array[Byte] = {
    val rng = new scala.util.Random(id * 0x9E3779B97F4A7C15L)
    val body = new Array[Byte](64 + rng.nextInt(192))
    rng.nextBytes(body)
    val bb = java.nio.ByteBuffer.allocate(16 + body.length)
    bb.putShort(Magic.toShort)
    bb.putShort(kind match { case "image" => 1; case "audio" => 2; case _ => 3 })
    bb.putInt(w); bb.putInt(h); bb.putInt(dur)
    bb.put(body)
    bb.array()
  }

  /** Deterministic synthetic media table. */
  def synth(spark: SparkSession, n: Long, partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val rng = new scala.util.Random(i * 0xC2B2AE3D27D4EB4FL)
      val kind = Vector("image", "audio", "video")(rng.nextInt(3))
      val w = if (kind == "audio") 0 else 160 + 16 * rng.nextInt(100)
      val h = if (kind == "audio") 0 else 90 + 9 * rng.nextInt(100)
      val dur = if (kind == "image") 0 else 1000 + rng.nextInt(600000)
      MediaRow(i, kind, fakeBytes(i, kind, w, h, dur), w, h, dur)
    }
  }

  /** The codec injection seam: a REAL decoder (JNI ffmpeg/turbojpeg/
    * soundfile) implements this trait and drops into [[decodeWith]]'s
    * mapPartitions slot — the Spark-side plumbing (schema, batching,
    * per-partition codec lifecycle, partitioning) is codec-agnostic,
    * so swapping the stub changes NO plan, schema or partitioning
    * (locked by the OpsSpec injection test). Implementations must be
    * Serializable: the object ships to executors once; `open()` runs
    * once per partition (allocate codec contexts there, the reference's
    * model-resident-per-process analogue), `close()` on task
    * completion.
    */
  trait MediaCodec extends Serializable {
    /** Per-PARTITION codec context (native handles, scratch buffers).
      * `open()` returns a fresh one per task and `close(ctx)` tears
      * down exactly that one — so a codec shipped as a JVM singleton
      * (executors share one instance across concurrent tasks) can
      * never have task A's completion listener free state task B is
      * still decoding with. Stateless codecs use `type Ctx = Unit`.
      */
    type Ctx
    def open(): Ctx
    def decode(ctx: Ctx, m: MediaRow): MediaFeatures
    def close(ctx: Ctx): Unit = ()
  }

  /** STUB codec: parses the fake header + computes cheap deterministic
    * "features" (this container ships no media libraries).
    */
  object StubCodec extends MediaCodec {
    type Ctx = Unit
    def open(): Unit = ()
    def decode(ctx: Unit, m: MediaRow): MediaFeatures = {
      val bb = java.nio.ByteBuffer.wrap(m.bytes)
      val magic = bb.getShort(); val kindId = bb.getShort()
      require(magic == Magic.toShort, "bad media magic")
      val w = bb.getInt(); val h = bb.getInt(); val dur = bb.getInt()
      val body = m.bytes.drop(16)
      val mean = if (body.isEmpty) 0.0
        else body.map(b => (b & 0xFF).toDouble).sum / body.length
      // fake embedding: 8 bucketed byte-histogram ratios
      val hist = new Array[Float](8)
      body.foreach(b => hist(((b & 0xFF) >> 5)) += 1f)
      val feat = hist.map(x => if (body.isEmpty) 0f else x / body.length)
      MediaFeatures(m.media_id, m.kind, w, h, dur, m.bytes.length, mean,
        feat.toSeq)
    }
  }

  /** Per-partition batched decode with an injected codec — the real
    * decoder slot. Partitioning, schema and the surrounding plan are
    * independent of the codec implementation.
    */
  def decodeWith(media: Dataset[MediaRow],
      codec: MediaCodec): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val ctx = codec.open() // once per partition: context allocation
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => codec.close(ctx)))
      it.map(m => codec.decode(ctx, m))
    }
  }

  /** Decode with the deterministic stub codec (the default path while
    * the container ships no media libraries).
    */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] =
    decodeWith(media, StubCodec)

  /** Resize plan (metadata-level): target box, preserve aspect. The byte
    * transform is the stub slot; the column math is real.
    */
  def withResizePlan(df: DataFrame, maxW: Int = 336, maxH: Int = 336): DataFrame = {
    val scale = least(lit(maxW) / col("width"), lit(maxH) / col("height"),
      lit(1.0))
    df.withColumn("resize_w",
        when(col("width") > 0, floor(col("width") * scale).cast("int"))
          .otherwise(lit(0)))
      .withColumn("resize_h",
        when(col("height") > 0, floor(col("height") * scale).cast("int"))
          .otherwise(lit(0)))
  }

  /** Frame sampling: one row per sampled timestamp (every `stepMs`). */
  def sampleFrames(df: DataFrame, stepMs: Int = 10000): DataFrame =
    df.filter(col("duration_ms") > 0)
      .select(col("media_id"), col("kind"),
        posexplode(sequence(lit(0),
          greatest(floor((col("duration_ms") - 1) / stepMs).cast("int"),
            lit(0)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumn("frame_ts_ms", col("col") * stepMs)
      .drop("col")
}
