package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media (image/audio/video) carried as
  * opaque `binary` columns + typed metadata structs, with
  * decode/feature steps as `mapPartitions` over the binary payloads.
  *
  * The container has no media codecs, so the decode itself is a
  * clearly-marked DETERMINISTIC STUB (parses a fake 8-byte header we
  * synthesize); everything Spark-side — schema, batch shape,
  * partition-parallel decode, metadata pruning — is real. At 100 TB the
  * binary column stays columnar in parquet, metadata-only queries never
  * touch the payload bytes (column pruning), and decode parallelism is
  * per-partition with no shuffle.
  */
object Multimodal {

  /** Typed metadata for a decoded media payload. */
  case class MediaMeta(doc_id: Long, width: Int, height: Int,
      n_bytes: Long, mean_byte: Double)

  /** Synthesize a deterministic fake "image": 8-byte header
    * (width:int32 BE, height:int32 BE) + UTF-8 payload from text. */
  private def fakeMedia(df: DataFrame): DataFrame = {
    val payload = encode(col("text"), "UTF-8")
    val w = (col("n_chars") % 64 + 1).cast("int")
    val h = (col("n_chars") % 48 + 1).cast("int")
    df.select(col("doc_id"), w.as("w"), h.as("h"), payload.as("payload"))
      .select(col("doc_id"),
        concat(
          // 4-byte big-endian ints via bit arithmetic → binary
          expr("unhex(lpad(hex(w), 8, '0'))"),
          expr("unhex(lpad(hex(h), 8, '0'))"),
          col("payload")).as("media"))
  }

  /** STUB decoder — stands in for a real image codec. Parses the fake
    * header + byte stats; deterministic so tests/oracles are stable.
    * A real deployment swaps `decodeOne` for an actual codec call; the
    * partition-batched plumbing around it is production-shaped. */
  def decodeBatch(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeOne(id, bytes) })
  }

  private[graft] def decodeOne(id: Long, bytes: Array[Byte]): MediaMeta = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val w = bb.getInt(0)
    val h = bb.getInt(4)
    val body = bytes.drop(8)
    val mean =
      if (body.isEmpty) 0.0
      else body.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / body.length
    MediaMeta(id, w, h, bytes.length.toLong, mean)
  }

  /** Frame sampling stub: every `stride`-th 16-byte block of the payload
    * as a "frame" (video analog; keeps the explode-shaped plumbing). */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.select(col("doc_id"),
      posexplode(expr(
        s"transform(sequence(0, int((octet_length(media) - 9) / ${16 * stride})), " +
          s"i -> substring(media, 9 + i * ${16 * stride}, 16))"))
        .as(Seq("frame_idx", "frame")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary-column metadata path: payload size + content digest —
    // metadata queries must not decode (and here don't).
    "m1_binary_meta" -> ((s, d) =>
      fakeMedia(Tables.load(s, d, "documents"))
        .select(col("doc_id"),
          length(col("media")).cast("long").as("n_bytes"),
          // digest over lowercase hex — DuckDB's md5 is varchar-only
          md5(lower(hex(col("media")))).as("digest"))
        .orderBy("doc_id")),

    // Decode + feature-extract via partition-parallel stub codec.
    // Header fields are SQL-derivable from the synthesis rule, so the
    // oracle checks the full decode round-trip.
    "m2_decode_features" -> ((s, d) => {
      val meta = decodeBatch(s, fakeMedia(Tables.load(s, d, "documents")))
      meta.toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("n_bytes"), round(col("mean_byte"), 4).as("mean_byte"))
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    // Reconstruct the synthesized binary in DuckDB: 2×int32-BE header +
    // utf8 text payload.
    "m1_binary_meta" ->
      """SELECT doc_id,
         8 + octet_length(text::blob) AS n_bytes,
         md5(lower(lpad(to_hex(n_chars % 64 + 1), 8, '0') ||
                   lpad(to_hex(n_chars % 48 + 1), 8, '0') ||
                   hex(text::blob))) AS digest
         FROM documents ORDER BY doc_id""",
    "m2_decode_features" ->
      """SELECT doc_id,
         (n_chars % 64 + 1)::int AS width,
         (n_chars % 48 + 1)::int AS height,
         8 + octet_length(text::blob) AS n_bytes,
         round(list_sum([ascii(c)::double for c in split(text, '')]) /
               octet_length(text::blob), 4) AS mean_byte
         FROM documents ORDER BY doc_id"""
  )
}
