package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.11 — no reference analog):
  * treat image/audio/video payloads as opaque `BINARY` columns with typed
  * metadata, and run decode / feature-extraction per partition.
  *
  * The decode step is a clearly-marked STUB — this container ships no
  * image/audio codecs — producing deterministic fake features from the raw
  * bytes. Everything around it is the real at-scale shape:
  *   - payloads stay in a `BINARY` column (columnar parquet, never
  *     stringified),
  *   - extraction runs via `mapPartitions` (one decoder init per
  *     partition, not per row — the pattern a JNI codec needs),
  *   - output is a fixed `StructType` so downstream relational/vector
  *     operators compose (e.g. the features feed SimilaritySearch).
  */
object Multimodal {

  /** Attach the payload as an opaque binary column: (idCol, blob). In a
    * real pipeline the blob comes off parquet/object storage as-is.
    */
  def withBlob(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol), col(payloadCol).cast("binary").as("blob"))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_channels", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** ======================= DECODE STUB =======================
    * Deterministic fake "decode": pseudo-dimensions and an 8-dim feature
    * derived from byte statistics. A real deployment replaces ONLY the body
    * of `decodeOne` with a codec call (e.g. libjpeg/ffmpeg via JNI); the
    * partition iteration, schema, and batching shape stay as-is.
    */
  private[graft] def decodeOne(id: Long, bytes: Array[Byte]): Row = {
    val n = bytes.length
    val w = 16 + (if (n > 0) (bytes(0) & 0xff) % 48 else 0)
    val h = 16 + (if (n > 1) (bytes(1) & 0xff) % 48 else 0)
    val feature = new Array[Float](8)
    var i = 0
    while (i < n) {
      feature(i % 8) += (bytes(i) & 0xff).toFloat / 255f
      i += 1
    }
    Row(id, n.toLong, w, h, 3, feature.toSeq)
  }

  /** Per-partition decode of (idCol, blob) rows into [[featureSchema]]. */
  def decodeFeaturesStub(blobs: DataFrame, spark: SparkSession): DataFrame = {
    val idIdx = blobs.schema.fieldIndex(blobs.columns.head)
    val blobIdx = blobs.schema.fieldIndex("blob")
    val enc = RowEncoder.encoderFor(featureSchema)
    blobs.mapPartitions { it =>
      // decoder init would go here, once per partition
      it.map { r =>
        decodeOne(r.getLong(idIdx), r.getAs[Array[Byte]](blobIdx))
      }
    }(enc)
  }

  /** Resize step over DECODED features: scale (width, height) to fit
    * inside `maxSide` preserving aspect ratio (never upscale), and carry
    * the feature vector through. Pure column arithmetic over the decoded
    * table — the decode stub owns the pixel work; resize of the actual
    * pixels happens inside the same codec call in a real deployment, so
    * what the engine owns is exactly this metadata/plan shape: a narrow
    * projection, no shuffle, composable with any downstream operator.
    */
  def resizeMeta(decoded: DataFrame, maxSide: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val scale = least(
      lit(1.0d),
      lit(maxSide.toDouble) / greatest(col("width"), col("height")).cast("double"))
    decoded.select(
      col("doc_id"), col("width"), col("height"),
      greatest(lit(1), ceil(col("width") * scale).cast("int")).as("out_width"),
      greatest(lit(1), ceil(col("height") * scale).cast("int")).as("out_height"),
      round(scale, 6).as("scale"),
      col("feature"))
  }

  /** "Frame sampling" for a chunked binary stream: split the blob into
    * fixed-size chunks, keep every `stride`-th chunk, fingerprint each kept
    * chunk (64-bit FNV-1a). Mirrors video-frame subsampling where the
    * per-frame payload is opaque. Pure per-row work — no shuffle.
    */
  def sampleChunks(
      blobs: DataFrame,
      spark: SparkSession,
      chunkSize: Int = 16,
      stride: Int = 4): DataFrame = {
    val idIdx = blobs.schema.fieldIndex(blobs.columns.head)
    val blobIdx = blobs.schema.fieldIndex("blob")
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_chunks", IntegerType, nullable = false),
      StructField("sampled_fp", ArrayType(LongType, containsNull = false), nullable = false)))
    val enc = RowEncoder.encoderFor(schema)
    blobs.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        val nChunks = (bytes.length + chunkSize - 1) / chunkSize
        val fps = (0 until nChunks by stride).map { c =>
          var h = 0xcbf29ce484222325L
          var i = c * chunkSize
          val end = math.min(i + chunkSize, bytes.length)
          while (i < end) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
          h
        }
        Row(r.getLong(idIdx), nChunks, fps)
      }
    }(enc)
  }
}
