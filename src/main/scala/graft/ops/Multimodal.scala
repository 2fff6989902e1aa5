package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads carried as
  * opaque `binary` columns with a typed metadata struct, processed in
  * batches via `mapPartitions`.
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * container): [[stubDecode]] derives deterministic fake
  * width/height/duration from the payload's md5, so the Spark-side
  * contract — schema, batch shape, partitioning, null behavior — is
  * real and tested while the codec is swappable.
  *
  * Scale notes: payloads never enter a shuffle key (metadata-only
  * projections are pushed before any groupBy/join); partition sizing is
  * bytes-based (`repartitionForPayloads`) because row counts are
  * meaningless when one row is 10 MB of video.
  */
object Multimodal {

  /** Typed metadata carried beside every payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("modality", StringType),   // image | audio | video | text
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),     // image/video; null otherwise
    StructField("height", IntegerType),
    StructField("duration_ms", LongType))) // audio/video; null otherwise

  /** Wrap a raw binary column into (payload, meta) with byte-accurate
    * n_bytes and everything codec-derived left null (to be filled by a
    * decode pass). */
  def ingest(df: DataFrame, binCol: String, modality: String, mime: String): DataFrame =
    df.withColumn("meta", struct(
      lit(modality).as("modality"), lit(mime).as("mime"),
      octet_length(col(binCol)).cast(LongType).as("n_bytes"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      lit(null).cast(LongType).as("duration_ms")))

  /** Deterministic fake decode of a payload: width/height/duration are
    * functions of the md5 digest — STAND-IN for a real codec. Replace
    * the body with an actual decoder; the signature (bytes → metadata
    * fields) is the real contract. */
  def stubDecode(payload: Array[Byte]): (Int, Int, Long) = {
    if (payload == null || payload.isEmpty) return (0, 0, 0L)
    val d = java.security.MessageDigest.getInstance("MD5").digest(payload)
    def u(i: Int) = d(i) & 0xff
    val width = 64 + (u(0) * 256 + u(1)) % 1985          // 64..2048
    val height = 64 + (u(2) * 256 + u(3)) % 1985
    val dur = 1000L + (u(4).toLong * 65536 + u(5) * 256 + u(6)) % 600000L
    (width, height, dur)
  }

  /** Batch decode pass: fills width/height/duration via [[stubDecode]]
    * over `mapPartitions` — one codec instance per partition, payloads
    * streamed, output schema fixed. This is the slot where a real
    * image/audio library drops in. */
  def decode(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("decoded", StructType(Seq(
        StructField("width", IntegerType), StructField("height", IntegerType),
        StructField("duration_ms", LongType)))))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = Encoders.row(outSchema)
    df.mapPartitions { it =>
      // per-partition codec init would go here
      it.map { r =>
        val (w, h, dur) = stubDecode(
          if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx))
        Row.fromSeq(r.toSeq :+ Row(w, h, dur))
      }
    }(enc)
  }

  /** Stub feature extractor: payload → dim-dimensional embedding,
    * deterministic in the payload bytes (components derived from md5 —
    * engine-portable, so the DuckDB oracle replays it exactly). STAND-IN
    * for a real image/audio encoder; the signature (binary column →
    * Array[Double] column) is the real contract, and the output feeds
    * the Similarity/Dedup family directly (near-dup over payloads =
    * embedStub → cosineNearDupBucketed). Pure codegen expressions — no
    * UDF, no driver state. */
  def embedStub(payload: Column, dim: Int): Column = {
    val digest = md5(payload) // hex string, 128 bits of payload identity
    array((0 until dim).map { j =>
      // 28-bit integer from md5(digest || "#j") → uniform [-1, 1)
      conv(substring(md5(concat(digest, lit(s"#$j")).cast(BinaryType)), 1, 7), 16, 10)
        .cast(DoubleType) / 268435456.0 * 2.0 - 1.0
    }: _*)
  }

  /** Frame-sample offsets for a video payload: every `everyMs` ms over
    * the (decoded) duration — pure expression, no codec needed. */
  def frameSampleOffsets(durationMs: Column, everyMs: Int): Column =
    when(durationMs <= 0, array().cast(ArrayType(LongType)))
      .otherwise(sequence(lit(0L), durationMs - 1, lit(everyMs.toLong)))

  /** Bytes-aware repartition: target ~`targetMB` of payload per
    * partition using the metadata's n_bytes (NOT row counts). */
  def repartitionForPayloads(df: DataFrame, nBytesCol: Column, targetMB: Int = 128): DataFrame = {
    val totalBytes = df.agg(sum(nBytesCol)).head().getLong(0)
    val parts = math.max(1, (totalBytes / (targetMB.toLong << 20)).toInt)
    df.repartition(parts)
  }
}
