package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media (image/audio/video) carried as
  * opaque `binary` columns + typed metadata structs, with
  * decode/feature steps as `mapPartitions` over the binary payloads.
  *
  * The IMAGE path (m2 decode, m3 resize, m6 near-dup) runs a REAL
  * codec: payloads are genuine PNG bytes (encoded executor-side with
  * `javax.imageio` — pure-JVM, public API, zero new dependencies) and
  * every query decodes them back through `ImageIO.read`. The AUDIO
  * path (m5 energy, m7 trim) likewise runs a real codec: genuine
  * RIFF/WAVE payloads (8-bit PCM mono) parsed by
  * `javax.sound.sampled.AudioSystem`. The VIDEO path (m4 frame
  * sampling, m8 scene-cut) runs a real MULTI-FRAME container: animated
  * GIF89a — the one multi-frame format the JDK can both write and
  * read — with each sampled frame a grayscale strip whose pixels are
  * the payload bytes of that frame ([[encodeGif]]). The modality
  * accounting (m9) routes every modality through ITS real codec. All
  * fixture GENERATORS are deterministic — the PNG raster tiles the
  * document's ASCII text, the WAV frames ARE its bytes, the GIF frame
  * strips carry the m4 sampling rule's byte blocks — so geometry,
  * pixel, sample and frame statistics are known by construction and
  * the DuckDB oracles replay them in closed form without a codec; the
  * lossless round-trips make the structural parity exact. The one
  * remaining honest boundary: a COMPRESSED video codec (H.264 etc.)
  * has no JDK implementation — the container/frame plumbing is real,
  * the inter-frame compression stage is where a JNI codec would slot
  * in. At 100 TB the binary column stays columnar in parquet,
  * metadata-only queries never touch the payload bytes (column
  * pruning), and codec parallelism is per-partition with no shuffle.
  */
object Multimodal {

  /** Synthesize m1's deterministic opaque binary: 8-byte header
    * (width:int32 BE, height:int32 BE) + UTF-8 payload from text. The
    * metadata-path fixture — m1 never decodes it (that is the point);
    * the codec queries use the real PNG/WAV/GIF generators below. */
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

  /** One RMS-energy window of a decoded audio payload. */
  case class AudioWin(doc_id: Long, win_idx: Int, n_samples: Int,
      rms: Double)

  /** Deterministic WAV fixture generator: a REAL RIFF/WAVE container
    * (8-bit unsigned PCM mono, 8 kHz) whose frames are the given
    * sample bytes — encoded through `javax.sound.sampled`
    * (pure-JVM, public API). The corpus generator feeds the doc's
    * ASCII bytes as samples, so decoded sample i = code point i and
    * the oracles replay the windows in closed form. */
  private[graft] def encodeWav(samples: Array[Byte]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      8000f, 8, 1, /*signed=*/ false, /*bigEndian=*/ false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** `(doc_id, media)` with REAL WAV payloads (samples = the doc's
    * UTF-8 bytes; see [[encodeWav]]). */
  private[graft] def wavMedia(spark: SparkSession, d: String): DataFrame =
    stagedMedia(spark, d, "graft_wavmedia")(t =>
      encodeWav(t.getBytes("UTF-8")))

  /** REAL audio decode + windowed RMS energy: the WAV container is
    * parsed by `javax.sound.sampled.AudioSystem` (the codec boundary —
    * a compressed format would swap in here), then samples centered at
    * 64 fold into one RMS per `win`-sample window. Partition-parallel,
    * shuffle-free; the squared-sum is integer-exact in double so the
    * division + sqrt replay bit-identically in the oracle. */
  def audioEnergy(spark: SparkSession, media: DataFrame,
      win: Int): Dataset[AudioWin] = {
    import spark.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val body = decodeWavSamples(bytes)
        val nWin = (body.length + win - 1) / win
        (0 until nWin).map { wi =>
          val from = wi * win
          val until = math.min(from + win, body.length)
          var acc = 0.0
          var i = from
          while (i < until) {
            val s = body(i) - 64.0
            acc += s * s
            i += 1
          }
          AudioWin(id, wi, until - from, math.sqrt(acc / (until - from)))
        }
      }
  }

  /** Unsigned 8-bit PCM frames of a WAV payload, via the real JDK
    * audio codec. */
  private[graft] def decodeWavSamples(bytes: Array[Byte]): Array[Int] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try ais.readAllBytes().map(b => b & 0xff)
    finally ais.close()
  }

  /** `(doc_id, n_samples)` through the real WAV decode — the m9 audio
    * accounting input (token cost scales with decoded sample count,
    * not container bytes). */
  private[graft] def wavSampleCounts(spark: SparkSession,
      media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        (id, decodeWavSamples(b).length.toLong) })
      .toDF("doc_id", "n_samples")
  }

  /** (doc_id, 60-bit average-hash) of a media payload. */
  case class MediaHash(doc_id: Long, ahash: Long)

  /** Decoded-raster metadata for the REAL image path. */
  case class ImageMeta(doc_id: Long, width: Int, height: Int,
      n_pixels: Long, mean_px: Double)

  /** Deterministic PNG fixture generator: a REAL grayscale PNG whose
    * w×h raster is known by construction — w = n%64+1, h = n%48+1,
    * and pixel k (row-major) is the byte of `text` at position
    * k mod n (0 for an empty doc — also the m6 empty-payload guard).
    * Encoded with `javax.imageio` (lossless 8-bit gray), so the
    * decode queries exercise a genuine codec while the oracle
    * replays the raster rule in closed form. */
  private[graft] def encodePng(text: String): Array[Byte] = {
    val n = text.length
    val w = n % 64 + 1
    val h = n % 48 + 1
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var k = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        r.setSample(x, y, 0,
          if (n == 0) 0 else text.charAt(k % n).toInt & 0xff)
        x += 1; k += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** ONE staging path behind the real-codec media generators:
    * `(doc_id, media)` encoded ONCE per dataset and parked as parquet
    * in the cross-process [[graft.core.Artifacts]] store — queries,
    * repeated bench iterations AND fresh processes re-READ the
    * encoded corpus, never re-run the codec per call. Keyed by
    * Tables.fileSig (directory-aware: part files rewritten in place
    * must re-encode — the drainSessions trap) AND the `where`
    * filter's rendered SQL — two callers sharing a prefix with
    * different filters must never reuse each other's staged payloads.
    * `CALL cat.stage_media(dir, kind)` runs the same builders
    * explicitly. */
  private def stagedMediaPath(spark: SparkSession, d: String,
      prefix: String, where: org.apache.spark.sql.Column)(
      encode: String => Array[Byte]): String =
    graft.core.Artifacts.resolveOrBuild(spark, prefix,
      s"$d|where=${where.toString}",
      Tables.fileSig(s"$d/documents.parquet")) { tmp =>
      import spark.implicits._
      Tables.load(spark, d, "documents").filter(where)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, t) => (id, encode(t)) })
        .toDF("doc_id", "media")
        .write.mode("overwrite").parquet(s"$tmp/media")
    }
  private def stagedMedia(spark: SparkSession, d: String, prefix: String,
      where: org.apache.spark.sql.Column = lit(true))(
      encode: String => Array[Byte]): DataFrame =
    spark.read.parquet(
      stagedMediaPath(spark, d, prefix, where)(encode) + "/media")

  /** The `CALL cat.stage_media(dir, kind)` entry point: stage the
    * named media kind for a dataset directory, returning the artifact
    * path (a warm artifact is returned without re-encoding). */
  private[graft] def stageMediaKind(spark: SparkSession, d: String,
      kind: String): String = kind match {
    case "png" => stagedMediaPath(spark, d, "graft_pngmedia",
      lit(true))(encodePng)
    case "wav" => stagedMediaPath(spark, d, "graft_wavmedia",
      lit(true))(t => encodeWav(t.getBytes("UTF-8")))
    case "gif" => stagedMediaPath(spark, d, "graft_gifmedia",
      length(col("text")) > 0)(encodeGif)
    case other => throw new IllegalArgumentException(
      s"stage_media: unknown kind '$other' — expected png, wav or gif")
  }

  /** `(doc_id, media)` with REAL PNG payloads (see [[encodePng]]). */
  private[graft] def pngMedia(spark: SparkSession, d: String): DataFrame =
    stagedMedia(spark, d, "graft_pngmedia")(encodePng)

  /** REAL image decode via `javax.imageio`: geometry + mean luma of
    * the decoded raster. Partition-parallel, shuffle-free; the sum is
    * integer-exact so the one division replays bit-identically. */
  def decodeImageBatch(spark: SparkSession,
      media: DataFrame): Dataset[ImageMeta] = {
    import spark.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        val (w, h) = (img.getWidth, img.getHeight)
        val r = img.getRaster
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += r.getSample(x, y, 0); x += 1 }
          y += 1
        }
        val npx = w.toLong * h
        ImageMeta(id, w, h, npx, sum.toDouble / npx)
      })
  }

  /** REAL decode + nearest-neighbor resample to `tw`×`th`: target
    * pixel (x,y) reads source pixel (x·w/tw, y·h/th) — exact integer
    * index arithmetic, so the oracle replays the resample rule on the
    * synthesized raster. A production bilinear/Lanczos kernel slots
    * into the same partition-parallel loop. */
  def resizeImage(spark: SparkSession, media: DataFrame,
      tw: Int, th: Int): Dataset[ImageMeta] = {
    import spark.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        val (w, h) = (img.getWidth, img.getHeight)
        val r = img.getRaster
        var sum = 0L
        var y = 0
        while (y < th) {
          var x = 0
          while (x < tw) {
            sum += r.getSample(x * w / tw, y * h / th, 0)
            x += 1
          }
          y += 1
        }
        val npx = tw.toLong * th
        ImageMeta(id, tw, th, npx, sum.toDouble / npx)
      })
  }

  /** Perceptual hash over the DECODED raster: 60 evenly-sampled
    * pixels (index i·npx/60, row-major), standard AVERAGE HASH
    * (bit i = pixel i above the sample mean). The mean compare is
    * kept integer (`px*60 > sum`) so both engines agree on every
    * edge case without a division in sight; 60 bits (not 64) so the
    * value stays positive in a signed long. A production pHash swaps
    * the sampling for an 8×8 luma downsample + DCT; the hash rule
    * and everything downstream stay. */
  def imageHash(spark: SparkSession, media: DataFrame): Dataset[MediaHash] = {
    import spark.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        val (w, h) = (img.getWidth, img.getHeight)
        val r = img.getRaster
        val npx = w.toLong * h
        val px = new Array[Long](60)
        var s = 0L
        var i = 0
        while (i < 60) {
          val idx = i * npx / 60
          px(i) = r.getSample((idx % w).toInt, (idx / w).toInt, 0).toLong
          s += px(i)
          i += 1
        }
        var hsh = 0L
        i = 0
        while (i < 60) { if (px(i) * 60L > s) hsh |= 1L << i; i += 1 }
        MediaHash(id, hsh)
      })
  }

  /** Deterministic multi-frame GIF fixture generator: a REAL animated
    * GIF89a — the one multi-frame container `javax.imageio` both
    * writes and reads — whose frame i is a w×1 grayscale strip
    * carrying the payload bytes of the m4 sampling rule (every 4th
    * 16-byte block: frame i = UTF-8 bytes of `text` at
    * [i·64, i·64+16), the tail strip narrower when the text ends
    * mid-block). Pixel x of frame i = that byte, encoded losslessly
    * (GIF's LZW over an 8-bit palette), so decode reconstructs the
    * exact byte blocks and the m4/m8 oracles keep replaying the frame
    * rule in closed form, unchanged. Requires text.length ≥ 1 — a
    * zero-frame GIF does not exist, so [[gifMedia]] skips empty docs
    * (whose oracle frame table is empty too). */
  private[graft] def encodeGif(text: String): Array[Byte] = {
    val bytes = text.getBytes("UTF-8")
    require(bytes.nonEmpty, "encodeGif: empty payload has no frames")
    val nFrames = (bytes.length - 1) / 64 + 1
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    writer.prepareWriteSequence(writer.getDefaultStreamMetadata(param))
    var i = 0
    while (i < nFrames) {
      val from = i * 64
      val w = math.min(16, bytes.length - from)
      val img = new java.awt.image.BufferedImage(w, 1,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      var x = 0
      while (x < w) { r.setSample(x, 0, 0, bytes(from + x) & 0xff); x += 1 }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
        param)
      i += 1
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  /** `(doc_id, media)` with REAL multi-frame GIF payloads (see
    * [[encodeGif]]); empty docs carry no media row — their frame table
    * is empty by the m4 rule. */
  private[graft] def gifMedia(spark: SparkSession, d: String): DataFrame =
    stagedMedia(spark, d, "graft_gifmedia",
      where = length(col("text")) > 0)(encodeGif)

  /** REAL multi-frame decode: every frame of each GIF payload through
    * `javax.imageio`'s sequence reader, pixels mapped back to bytes →
    * `(doc_id, frame_idx, frame_txt)`. Partition-parallel and
    * shuffle-free — frames of one payload never leave their partition;
    * a compressed-video codec would swap in at the reader line. */
  def gifFrames(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val reader =
          javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        reader.setInput(iis)
        try {
          val n = reader.getNumImages(true)
          (0 until n).map { i =>
            val img = reader.read(i)
            val w = img.getWidth
            val out = new Array[Byte](w)
            var x = 0
            // getRGB goes through the palette's color model — the
            // decoded gray value, not the palette index
            while (x < w) {
              out(x) = (img.getRGB(x, 0) & 0xff).toByte; x += 1
            }
            (id, i.toLong, new String(out, "UTF-8"))
          }
        } finally { reader.dispose(); iis.close() }
      }
      .toDF("doc_id", "frame_idx", "frame_txt")
  }

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

    // Modality-aware TOKEN accounting — what a multimodal training
    // budget actually counts, with EVERY modality routed through ITS
    // real codec: image docs (doc_id%3=0) decode their genuine PNG and
    // cost ⌈w/16⌉·⌈h/16⌉ ViT patches; audio docs (%3=1) decode their
    // genuine WAV and cost one token per 320-sample hop (+1 partial);
    // video docs (%3=2) decode their genuine multi-frame GIF and cost
    // the per-frame patch count summed over sampled frames. Every
    // published figure derives from DECODED geometry/sample/frame
    // counts, so the oracle's closed-form replay of the generator
    // rules genuinely checks all three codecs. Per modality: items,
    // tokens and the integer-bp share of the total token budget.
    // Partition-parallel decode + one 3-group aggregation — scan-speed.
    "m9_modal_tokens" -> ((s, d) => {
      val img = decodeImageBatch(s,
          pngMedia(s, d).filter(col("doc_id") % 3 === 0)).toDF()
        .select(lit("image").as("modality"),
          (expr("(width + 15) div 16") * expr("(height + 15) div 16"))
            .cast("long").as("tok"))
      val aud = wavSampleCounts(s,
          wavMedia(s, d).filter(col("doc_id") % 3 === 1))
        .select(lit("audio").as("modality"),
          (expr("n_samples div 320") + 1L).as("tok"))
      val vid = gifFrames(s, gifMedia(s, d).filter(col("doc_id") % 3 === 2))
        .groupBy("doc_id")
        .agg(sum(expr("(octet_length(frame_txt) + 15) div 16")).as("tok"))
        .select(lit("video").as("modality"), col("tok"))
      val tok = img.unionByName(aud).unionByName(vid)
      val tot = tok.agg(sum("tok").as("tt"))
      tok.groupBy("modality")
        .agg(count(lit(1)).as("n_items"), sum("tok").as("total_tokens"))
        .crossJoin(broadcast(tot))
        .select(col("modality"), col("n_items"), col("total_tokens"),
          expr("total_tokens * 10000 div tt").as("share_bp"))
        .orderBy("modality")
    }),

    // REAL codec decode + feature-extract: genuine PNG payloads
    // through javax.imageio, partition-parallel. Raster geometry and
    // pixel stats are SQL-derivable from the generator rule, so the
    // oracle checks the full encode→decode round-trip.
    "m2_decode_features" -> ((s, d) =>
      decodeImageBatch(s, pngMedia(s, d)).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("n_pixels"), round(col("mean_px"), 4).as("mean_px"))
        .orderBy("doc_id")),

    // REAL decode + nearest-neighbor resize to a fixed 16×12 target —
    // exact integer source indexing, so the oracle replays the
    // resample over the synthesized raster.
    "m3_resize" -> ((s, d) =>
      resizeImage(s, pngMedia(s, d), tw = 16, th = 12).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("n_pixels"), round(col("mean_px"), 4).as("mean_px"))
        .orderBy("doc_id")),

    // Frame sampling through a REAL multi-frame container: genuine
    // animated-GIF payloads decoded frame-by-frame with javax.imageio;
    // the generator bakes the stride-4 sampling rule into the frames
    // (strip i = payload bytes at [i·64, i·64+16)), so the decoded
    // frames reconstruct the exact substrings and the oracle replays
    // the rule in closed form, unchanged.
    "m4_frame_sample" -> ((s, d) =>
      gifFrames(s, gifMedia(s, d))
        .orderBy("doc_id", "frame_idx")),

    // REAL audio decode: genuine WAV payloads (8-bit PCM mono) parsed
    // by javax.sound.sampled, windowed RMS energy per 64 samples — the
    // VAD/silence-trim primitive shape: partition-parallel codec, one
    // row per window, no shuffle. The generator feeds the doc's ASCII
    // bytes as samples, so the oracle replays the exact windows and
    // energies in closed form.
    "m5_audio_energy" -> ((s, d) =>
      audioEnergy(s, wavMedia(s, d), win = 64)
        .toDF()
        .select(col("doc_id"), col("win_idx").cast("long").as("win_idx"),
          col("n_samples").cast("long").as("n_samples"),
          round(col("rms"), 4).as("rms"))
        .orderBy("doc_id", "win_idx")),

    // Image near-duplicate detection (the image-dedup step of a
    // multimodal pipeline): REAL PNG decode + average hash, then
    //  - identical hashes collapse to (head, member, dist=0) rows —
    //    LINEAR in group size (the d-family (gid, member) lesson: a
    //    mega-cluster of byte-identical images must not emit O(n²)
    //    pairs);
    //  - DISTINCT hashes (one representative head each) pair through
    //    a 10-band × 6-bit LSH self-join, exactly the d3/d4 banding:
    //    dist ≤ 6 < 10 bands pigeonholes at least one exact band, so
    //    recall is GUARANTEED, and candidates are band collisions
    //    only — never all pairs.
    "m6_image_neardup" -> ((s, d) => {
      val hs = imageHash(s, pngMedia(s, d))
        .toDF().localCheckpoint() // 1 row/doc; feeds groups AND bands
      val heads = hs.groupBy("ahash").agg(min("doc_id").as("head"))
      val dup0 = hs.join(heads, "ahash")
        .filter(col("doc_id") =!= col("head"))
        .select(col("head").as("i"), col("doc_id").as("j"),
          lit(0L).as("dist"))
      val bands = heads.select(col("head"), col("ahash"),
        posexplode(expr(
          "transform(sequence(0, 9), b -> int(shiftright(ahash, b * 6) & 63))"))
          .as(Seq("band", "bv")))
      val near = bands
        .select(col("band"), col("bv"), col("head").as("i"),
          col("ahash").as("ha"))
        .join(bands.select(col("band"), col("bv"), col("head").as("j"),
          col("ahash").as("hb")), Seq("band", "bv"))
        .filter(col("i") < col("j"))
        .select("i", "j", "ha", "hb").distinct()
        .withColumn("dist", expr("bigint(bit_count(ha ^ hb))"))
        // dist 0 across DISTINCT hashes is impossible; ≥1 keeps the
        // two output families disjoint by construction
        .filter(col("dist") >= 1 && col("dist") <= 6)
        .select("i", "j", "dist")
      dup0.unionByName(near).orderBy("i", "j")
    }),

    // Scene-cut detection (the shot-boundary step of a video
    // pipeline): consecutive REAL-decoded GIF frames (m4's container)
    // compare by per-position byte distance + length delta; a cut is
    // declared where dist ≥ 8 of 16. One lag window per doc (frames
    // are few and doc-local — no shuffle beyond the doc partitioning)
    // and a BOUNDED 16-element fold per row (fixed frame width, so the
    // HOF is constant work — not the per-char-lambda trap).
    "m8_scene_cut" -> ((s, d) => {
      val fr = gifFrames(s, gifMedia(s, d))
        .select(col("doc_id"), col("frame_idx"),
          col("frame_txt").as("ft"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("frame_idx")
      fr.withColumn("prev", lag(col("ft"), 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("dist", expr(
          "aggregate(sequence(1, int(least(length(ft), length(prev)))), " +
            "bigint(abs(length(ft) - length(prev))), " +
            "(acc, i) -> acc + IF(substring(ft, i, 1) = substring(prev, i, 1), " +
            "0L, 1L))"))
        .filter(col("dist") >= 8)
        .select(col("doc_id"), col("frame_idx").as("cut_at"), col("dist"))
        .orderBy("doc_id", "cut_at")
    }),

    // Silence trimming (the VAD step after m5's energy pass): per doc,
    // the first/last 64-sample window whose RMS clears the threshold
    // bounds the voiced span; everything outside is trimmed. One
    // grouped aggregation over m5's shuffle-free window rows — no
    // per-window lookup is needed because every window except the tail
    // holds exactly 64 samples, so the span ends at
    // min(total, (last+1)·64). The RMS values are bit-replayable
    // (integer sums, one division, one sqrt — both engines IEEE), so
    // the raw-double threshold compare agrees with the oracle; an
    // all-silent doc publishes NULL bounds.
    "m7_audio_trim" -> ((s, d) => {
      val thr = 42.0
      audioEnergy(s, wavMedia(s, d), win = 64)
        .toDF()
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_windows"),
          sum(col("n_samples").cast("long")).as("total"),
          min(when(col("rms") > thr, col("win_idx"))).as("fv"),
          max(when(col("rms") > thr, col("win_idx"))).as("lv"))
        .select(col("doc_id"), col("n_windows"),
          (col("fv") * 64L).cast("long").as("start_sample"),
          when(col("lv").isNotNull,
            least(col("total"), (col("lv") + 1L) * 64L)).cast("long")
            .as("end_sample"),
          (when(col("lv").isNotNull,
            least(col("total"), (col("lv") + 1L) * 64L)) - col("fv") * 64L)
            .cast("long").as("kept_samples"))
        .orderBy("doc_id")
    })
  )

  /** The GIF generator's frame rule as SQL (frame i = 16 bytes at
    * offset i·64 on the ASCII corpus; empty docs have no frames) —
    * ONE definition behind the m4, m8 and m9-video oracles, so the
    * frame rule cannot fork between sampling, scene-cut and token
    * accounting. Yields (doc_id, frame_idx, ft). */
  private val frameSql =
    """SELECT doc_id, i AS frame_idx,
         substr(text, (1 + i * 64)::int, 16) AS ft
       FROM (SELECT doc_id, text,
           unnest(range(0, ((octet_length(text::blob) - 1) // 64) + 1)) AS i
         FROM documents)"""

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
    // m9: every modality's token count replays from its generator
    // rule in closed form (checking the decode round-trips like
    // m2/m5/m4): image = PNG raster patches, audio = WAV sample hops
    // (decoded samples = text bytes), video = per-frame patches over
    // the GIF frame table (empty docs carry no frames — no media row)
    "m9_modal_tokens" ->
      s"""WITH t AS (
           SELECT doc_id, 'image' AS modality,
               (((n_chars % 64 + 1 + 15) // 16) *
                ((n_chars % 48 + 1 + 15) // 16))::bigint AS tok
             FROM documents WHERE doc_id % 3 = 0
           UNION ALL
           SELECT doc_id, 'audio' AS modality,
               (octet_length(text::blob) // 320 + 1)::bigint AS tok
             FROM documents WHERE doc_id % 3 = 1
           UNION ALL
           SELECT doc_id, 'video' AS modality,
               sum((octet_length(ft::blob) + 15) // 16)::bigint AS tok
             FROM ($frameSql) WHERE doc_id % 3 = 2 GROUP BY doc_id),
         tot AS (SELECT sum(tok) AS tt FROM t)
       SELECT modality, count(*) AS n_items,
         sum(tok)::bigint AS total_tokens,
         (sum(tok) * 10000 // tt)::bigint AS share_bp
       FROM t, tot GROUP BY modality, tt ORDER BY modality""",
    // m2: replay the PNG generator's raster rule in closed form —
    // pixel k of the w×h raster is text byte (k mod n); the codec
    // round-trip is lossless 8-bit gray, so decoded stats must equal
    // the rule exactly
    "m2_decode_features" ->
      """SELECT doc_id,
         (n_chars % 64 + 1)::int AS width,
         (n_chars % 48 + 1)::int AS height,
         ((n_chars % 64 + 1) * (n_chars % 48 + 1))::bigint AS n_pixels,
         round(CASE WHEN n_chars = 0 THEN 0.0 ELSE
           list_sum([ascii(substr(text, (k % n_chars + 1)::int, 1))::double
               for k in range(0, (n_chars % 64 + 1) * (n_chars % 48 + 1))])
             / ((n_chars % 64 + 1) * (n_chars % 48 + 1)) END, 4) AS mean_px
         FROM documents ORDER BY doc_id""",
    // m3: nearest-neighbor target pixel (x,y) reads source
    // (x·w//16, y·h//12); k enumerates the 16×12 target row-major
    "m3_resize" ->
      """WITH b AS (SELECT doc_id, text, n_chars,
           n_chars % 64 + 1 AS w, n_chars % 48 + 1 AS h FROM documents)
         SELECT doc_id, 16::int AS width, 12::int AS height,
           192::bigint AS n_pixels,
           round(CASE WHEN n_chars = 0 THEN 0.0 ELSE
             list_sum([ascii(substr(text,
                 ((((k // 16) * h // 12) * w + ((k % 16) * w // 16))
                   % n_chars + 1)::int, 1))::double
               for k in range(0, 192)]) / 192 END, 4) AS mean_px
         FROM b ORDER BY doc_id""",
    // frame i (stride 4) = 16 payload bytes from offset i*64 =
    // text substring at 1-based position 1 + i*64 (shared frameSql)
    "m4_frame_sample" ->
      s"""SELECT doc_id, frame_idx, ft AS frame_txt FROM ($frameSql)
         ORDER BY doc_id, frame_idx""",
    // m5: windows of 64 payload bytes; sample = ascii(code) − 64
    // (ASCII corpus: byte i = code point i); RMS replayed exactly
    "m5_audio_energy" ->
      """SELECT doc_id, w AS win_idx,
         least(64, octet_length(text::blob) - w * 64)::bigint AS n_samples,
         round(sqrt(list_sum([
             (ascii(substr(text, (w * 64 + j)::int, 1)) - 64.0) *
             (ascii(substr(text, (w * 64 + j)::int, 1)) - 64.0)
             for j in range(1, least(64,
               octet_length(text::blob) - w * 64)::int + 1)]) /
           least(64, octet_length(text::blob) - w * 64)), 4) AS rms
         FROM (SELECT doc_id, text,
             unnest(range(0, ((octet_length(text::blob) - 1) // 64) + 1)) AS w
           FROM documents)
         ORDER BY doc_id, win_idx""",
    // m8: the shared frame table + lag, per-position mismatch count
    // over the shared prefix + length delta, cuts at dist ≥ 8
    "m8_scene_cut" ->
      s"""SELECT doc_id, cut_at, dist FROM (
           SELECT doc_id, frame_idx AS cut_at,
             (len([x for x in range(1,
                 least(length(ft), length(prev))::int + 1)
               if substr(ft, x, 1) <> substr(prev, x, 1)])
              + abs(length(ft) - length(prev)))::bigint AS dist
           FROM (SELECT doc_id, frame_idx, ft,
               lag(ft) OVER (PARTITION BY doc_id ORDER BY frame_idx)
                 AS prev
             FROM ($frameSql))
           WHERE prev IS NOT NULL)
         WHERE dist >= 8 ORDER BY doc_id, cut_at""",
    // m7: m5's window CTE with UNROUNDED rms (the sum is exact-integer
    // in double, division and sqrt IEEE — bit-identical both engines,
    // so the raw threshold compare agrees), grouped to the voiced span
    "m7_audio_trim" ->
      """WITH w AS (
           SELECT doc_id, w AS win_idx,
             least(64, octet_length(text::blob) - w * 64)::bigint AS n_samples,
             sqrt(list_sum([
                 (ascii(substr(text, (w * 64 + j)::int, 1)) - 64.0) *
                 (ascii(substr(text, (w * 64 + j)::int, 1)) - 64.0)
                 for j in range(1, least(64,
                   octet_length(text::blob) - w * 64)::int + 1)]) /
               least(64, octet_length(text::blob) - w * 64)) AS rms
           FROM (SELECT doc_id, text,
               unnest(range(0, ((octet_length(text::blob) - 1) // 64) + 1)) AS w
             FROM documents)),
         g AS (SELECT doc_id, count(*)::bigint AS n_windows,
             sum(n_samples)::bigint AS total,
             min(CASE WHEN rms > 42.0 THEN win_idx END) AS fv,
             max(CASE WHEN rms > 42.0 THEN win_idx END) AS lv
           FROM w GROUP BY doc_id)
         SELECT doc_id, n_windows,
           (fv * 64)::bigint AS start_sample,
           (CASE WHEN lv IS NULL THEN NULL
                 ELSE least(total, (lv + 1) * 64) END)::bigint AS end_sample,
           (CASE WHEN lv IS NULL THEN NULL
                 ELSE least(total, (lv + 1) * 64) END
             - fv * 64)::bigint AS kept_samples
         FROM g ORDER BY doc_id""",
    // m6: same 60 raster samples (pixel index i·npx//60 of the w×h
    // raster = text byte at that index mod n), same integer
    // px·60 > sum bit rule, exact O(n²) hamming replay of the banded
    // join (the banding only prunes candidates; dist ≤ 6 < 10 bands
    // guarantees recall, so the outputs are identical); empty docs
    // hash to 0 — the rule both engines share
    "m6_image_neardup" ->
      """WITH b AS (SELECT doc_id, text, n_chars AS n,
             (n_chars % 64 + 1) * (n_chars % 48 + 1) AS npx
           FROM documents),
         p AS (SELECT doc_id,
             [CASE WHEN n = 0 THEN 0::bigint ELSE
                ascii(substr(text, ((i * npx // 60) % n + 1)::int,
                  1))::bigint END
              for i in range(0, 60)] AS px
           FROM b),
         hh AS (SELECT doc_id,
             list_sum([CASE WHEN px[i + 1] * 60 > list_sum(px)
                 THEN (1::bigint << i::int) ELSE 0::bigint END
               for i in range(0, 60)])::bigint AS ahash
           FROM p),
         g AS (SELECT ahash, min(doc_id) AS head FROM hh GROUP BY ahash),
         d0 AS (SELECT g.head AS i, hh.doc_id AS j, 0::bigint AS dist
           FROM hh JOIN g USING (ahash) WHERE hh.doc_id <> g.head),
         nr AS (SELECT a.head AS i, b.head AS j,
             bit_count(xor(a.ahash, b.ahash))::bigint AS dist
           FROM g a JOIN g b ON a.head < b.head
           WHERE bit_count(xor(a.ahash, b.ahash)) BETWEEN 1 AND 6)
       SELECT i, j, dist FROM d0
       UNION ALL SELECT i, j, dist FROM nr ORDER BY i, j"""
  )
}
