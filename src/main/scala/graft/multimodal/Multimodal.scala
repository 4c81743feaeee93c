package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted in partition-local batches.
  *
  * The Spark side — schema, partitioning, batch shape (fixed-size chunks
  * inside mapPartitions, the same contract as `mapInPandas` batches) — is
  * real and tested. IMAGE decode is REAL (`decodeImageReal`, javax.imageio
  * from the JDK: PNG/BMP/GIF/JPEG headers + pixel traversal) and AUDIO
  * decode is REAL (`decodeAudioReal`, javax.sound.sampled: WAV/AIFF/AU
  * PCM headers + frame traversal), multi-frame VIDEO sampling is REAL
  * over animated GIF (the JDK's one multi-frame format), and RESIZE is
  * REAL (`resizeImagesReal`, a pure-JDK bilinear kernel). The md5 stubs
  * are kept alongside for payloads that are not real media (e.g.
  * [[documentsAsMedia]] text bytes).
  */
object Multimodal {

  val decodedSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** STUB image decode: deterministic metadata + features from payload
    * bytes. A real implementation would decode the codec header and run
    * a feature extractor over pixel data; the signature and batch shape
    * are what the pipeline depends on. */
  def decodeImageStub(payload: Array[Byte]): Row = {
    val n = payload.length.toLong
    val width = 64 + (n % 448L).toInt
    val height = 64 + ((n * 7L) % 448L).toInt
    val digest = java.security.MessageDigest.getInstance("MD5").digest(payload)
    val features = digest.take(8).map(b => (b & 0xFF).toFloat / 255.0f)
    Row(width, height, 3, n, features.toSeq)
  }

  /** Decode a binary column in partition-local batches of `batchSize`
    * rows (bounded memory per task — the same reason mapInPandas batches
    * arrow record-batches). Appends the decoded struct columns. */
  def decodeImages(df: DataFrame, payloadCol: String,
      batchSize: Int = 256): DataFrame = {
    val inputSchema = df.schema
    val outSchema = StructType(inputSchema.fields ++ decodedSchema.fields)
    val payloadIdx = inputSchema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real codec would decode the whole batch in one native call
        batch.map { row =>
          val decoded = decodeImageStub(row.getAs[Array[Byte]](payloadIdx))
          Row.fromSeq(row.toSeq ++ decoded.toSeq)
        }
      }
    }(enc)
  }

  // ---- real image decode (javax.imageio — ships in the JDK, no external
  // library). PNG/BMP/GIF/JPEG all route through the same ImageIO reader;
  // the batched mapPartitions shape is identical to the stub path above.

  val decodedRealSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  /** Real image decode: true width/height/channels from the codec header
    * plus exact per-channel pixel sums (integers, so the SQL oracle can
    * replicate them bit-for-bit on fixtures with known pixels). */
  def decodeImageReal(payload: Array[Byte]): Row = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val channels = img.getRaster.getNumBands
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y) // exact for 8-bit sRGB sources (PNG/BMP)
        sumR += (rgb >> 16) & 0xFF
        sumG += (rgb >> 8) & 0xFF
        sumB += rgb & 0xFF
        x += 1
      }
      y += 1
    }
    Row(w, h, channels, payload.length.toLong, sumR, sumG, sumB)
  }

  /** Decode a binary image column with the REAL codec in partition-local
    * batches — same batch contract as [[decodeImages]]. Appends
    * width/height/channels/n_bytes plus exact per-channel pixel sums. */
  def decodeImagesReal(df: DataFrame, payloadCol: String,
      batchSize: Int = 256): DataFrame = {
    val inputSchema = df.schema
    val outSchema = StructType(inputSchema.fields ++ decodedRealSchema.fields)
    val payloadIdx = inputSchema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val decoded = decodeImageReal(row.getAs[Array[Byte]](payloadIdx))
          Row.fromSeq(row.toSeq ++ decoded.toSeq)
        }
      }
    }(enc)
  }

  /** Deterministic PNG fixture spec for `docId`: (width, height, r, g, b).
    * The encoded image is two-tone — the left ceil(width/2) columns are
    * (r,g,b), the rest black — so decoded pixel sums are exact integer
    * arithmetic on `docId`, replicable in the SQL oracle. */
  def pngFixtureSpec(docId: Long): (Int, Int, Int, Int, Int) = {
    val w = (8 + docId % 24).toInt
    val h = (8 + (docId * 3) % 24).toInt
    val r = ((docId * 31) % 256).toInt
    val g = ((docId * 67) % 256).toInt
    val b = ((docId * 101) % 256).toInt
    (w, h, r, g, b)
  }

  /** Encode the [[pngFixtureSpec]] image for `docId` with the requested
    * ImageIO format (png or bmp — both lossless 8-bit RGB in the JDK). */
  def encodeImageFixture(docId: Long, format: String = "png"): Array[Byte] = {
    val (w, h, r, g, b) = pngFixtureSpec(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val left = (w + 1) / 2
    val tone = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, if (x < left) tone else 0); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, bos), s"no ImageIO writer for $format")
    bos.toByteArray
  }

  /** Build a (doc_id, payload) media table of real PNG bytes, encoded in
    * partition-local batches — payloads never touch the driver. */
  def pngFixtures(docs: DataFrame, idCol: String = "doc_id",
      batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    docs.select(col(idCol).cast("long").as("doc_id")).mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val id = row.getLong(0)
          Row(id, encodeImageFixture(id))
        }
      }
    }(enc)
  }

  val resizedSchema: StructType = StructType(Seq(
    StructField("resized_width", IntegerType, nullable = false),
    StructField("resized_height", IntegerType, nullable = false),
    StructField("resized_payload", BinaryType, nullable = false)))

  /** STUB resize kernel for payloads that are NOT decodable images
    * (e.g. [[documentsAsMedia]] text bytes): deterministic bytes (md5 of
    * the payload cycled to a size-bounded buffer). Real images go
    * through [[resizeImagesReal]] (bilinear). */
  def resizeImageStub(payload: Array[Byte], targetW: Int, targetH: Int): Row = {
    val digest = java.security.MessageDigest.getInstance("MD5").digest(payload)
    val outLen = math.min(targetW * targetH * 3, 4096)
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) { out(i) = digest(i % digest.length); i += 1 }
    Row(targetW, targetH, out)
  }

  /** Resize a binary image column in partition-local batches — same
    * batch shape as [[decodeImages]]. Appends resized_{width,height,
    * payload}. */
  def resizeImages(df: DataFrame, payloadCol: String, targetW: Int,
      targetH: Int, batchSize: Int = 256): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    val inputSchema = df.schema
    val outSchema = StructType(inputSchema.fields ++ resizedSchema.fields)
    val payloadIdx = inputSchema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val resized = resizeImageStub(
            row.getAs[Array[Byte]](payloadIdx), targetW, targetH)
          Row.fromSeq(row.toSeq ++ resized.toSeq)
        }
      }
    }(enc)
  }

  // ---- real image resize (pure-JDK bilinear kernel; no external
  // resample library). align-corners=false source sampling with edge
  // clamp and round-half-up — the OpenCV/PIL convention — implemented
  // directly so every interpolation weight is specified HERE and
  // replicable in the SQL oracle. With a power-of-two target dimension
  // every sample coordinate ((x+0.5)*w/tw - 0.5) and weight is an exact
  // dyadic double, so fixture pixel sums are exact integer arithmetic
  // end-to-end — the oracle verifies the bilinear weights themselves,
  // no float tolerance.

  val resizedRealSchema: StructType = StructType(Seq(
    StructField("resized_width", IntegerType, nullable = false),
    StructField("resized_height", IntegerType, nullable = false),
    StructField("resized_sum_r", LongType, nullable = false),
    StructField("resized_sum_g", LongType, nullable = false),
    StructField("resized_sum_b", LongType, nullable = false),
    StructField("resized_payload", BinaryType, nullable = false)))

  /** Bilinear resample to (tw, th). Destination pixel (x, y) samples the
    * source at sx = clamp((x+0.5)*w/tw - 0.5, 0, w-1) (align-corners =
    * false), blends the 4 neighbors with (1-f)/f weights per axis, and
    * rounds half-up per 8-bit channel. Same sRGB caveat as
    * [[decodeImageReal]]: channel values are taken as-is, no color
    * management and no gamma-aware averaging. */
  def bilinearResize(src: BufferedImage, tw: Int, th: Int): BufferedImage = {
    require(tw > 0 && th > 0, "target dims must be positive")
    val w = src.getWidth
    val h = src.getHeight
    val out = new BufferedImage(tw, th, BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < th) {
      val sy = math.max(0.0, math.min((h - 1).toDouble, (y + 0.5) * h / th - 0.5))
      val y0 = sy.toInt // sy >= 0 so toInt == floor
      val y1 = math.min(h - 1, y0 + 1)
      val fy = sy - y0
      var x = 0
      while (x < tw) {
        val sx = math.max(0.0, math.min((w - 1).toDouble, (x + 0.5) * w / tw - 0.5))
        val x0 = sx.toInt
        val x1 = math.min(w - 1, x0 + 1)
        val fx = sx - x0
        val p00 = src.getRGB(x0, y0); val p01 = src.getRGB(x1, y0)
        val p10 = src.getRGB(x0, y1); val p11 = src.getRGB(x1, y1)
        var rgb = 0
        var shift = 16
        while (shift >= 0) {
          val c00 = (p00 >> shift) & 0xFF; val c01 = (p01 >> shift) & 0xFF
          val c10 = (p10 >> shift) & 0xFF; val c11 = (p11 >> shift) & 0xFF
          val v = (1 - fy) * ((1 - fx) * c00 + fx * c01) +
            fy * ((1 - fx) * c10 + fx * c11)
          rgb |= math.floor(v + 0.5).toInt << shift // v <= 255, no overflow
          shift -= 8
        }
        out.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    out
  }

  /** REAL resize: ImageIO decode → [[bilinearResize]] → exact channel
    * sums of the result → lossless PNG re-encode. */
  def resizeImageReal(payload: Array[Byte], tw: Int, th: Int): Row = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    val resized = bilinearResize(img, tw, th)
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < th) {
      var x = 0
      while (x < tw) {
        val rgb = resized.getRGB(x, y)
        sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(resized, "png", bos), "no PNG writer")
    Row(tw, th, sr, sg, sb, bos.toByteArray)
  }

  /** Real-resize a binary image column in partition-local batches — the
    * same batch shape as [[decodeImagesReal]]; payloads never touch the
    * driver. Appends [[resizedRealSchema]]. */
  def resizeImagesReal(df: DataFrame, payloadCol: String, targetW: Int,
      targetH: Int, batchSize: Int = 256): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    val inputSchema = df.schema
    val outSchema = StructType(inputSchema.fields ++ resizedRealSchema.fields)
    val payloadIdx = inputSchema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val resized = resizeImageReal(
            row.getAs[Array[Byte]](payloadIdx), targetW, targetH)
          Row.fromSeq(row.toSeq ++ resized.toSeq)
        }
      }
    }(enc)
  }

  /** Energy-contour fingerprint of a 16-bit PCM WAV payload — the
    * audio sibling of image [[dHash]]: samples split into `nBits + 1`
    * equal frames, per-frame mean |amplitude| in exact integer
    * arithmetic (sum of abs scaled by frame length cross-multiplied,
    * never fp), bit i set when frame i's energy exceeds frame i+1's.
    * Invariant to uniform volume scaling (comparisons, not absolutes)
    * and deterministic; near-dup via [[audioNearDuplicates]]. */
  def audioFingerprint(payload: Array[Byte], nBits: Int = 64): Long = {
    require(nBits >= 1 && nBits <= 64, "nBits in [1, 64]")
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.BufferedInputStream(new ByteArrayInputStream(payload)))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16, "expected 16-bit PCM")
      val bytes = in.readAllBytes()
      val le = !fmt.isBigEndian
      val n = bytes.length / 2
      val frames = nBits + 1
      val sums = new Array[Long](frames)
      val counts = new Array[Long](frames)
      var i = 0
      while (i < n) {
        val lo = bytes(if (le) i * 2 else i * 2 + 1) & 0xFF
        val hi = bytes(if (le) i * 2 + 1 else i * 2)
        val s = ((hi << 8) | lo).toShort.toLong
        val f = math.min(frames - 1, (i.toLong * frames / math.max(n, 1)).toInt)
        sums(f) += math.abs(s)
        counts(f) += 1
        i += 1
      }
      var bits = 0L
      var b = 0
      while (b < nBits) {
        // mean(a) > mean(b) compared exactly: sumA*cntB > sumB*cntA
        val ca = math.max(counts(b), 1L); val cb = math.max(counts(b + 1), 1L)
        if (sums(b) * cb > sums(b + 1) * ca) bits |= 1L << b
        b += 1
      }
      bits
    } finally in.close()
  }

  /** Append `audio_fp` (LongType) to a binary WAV column. */
  def withAudioFingerprint(df: DataFrame, payloadCol: String,
      batchSize: Int = 256): DataFrame = {
    val inputSchema = df.schema
    val outSchema = StructType(inputSchema.fields :+
      StructField("audio_fp", LongType, nullable = false))
    val payloadIdx = inputSchema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          Row.fromSeq(row.toSeq :+
            audioFingerprint(row.getAs[Array[Byte]](payloadIdx)))
        }
      }
    }(enc)
  }

  /** Audio near-duplicate pairs: energy-contour fingerprints through
    * the banded 64-bit hamming machinery — same contract as
    * [[imageNearDuplicates]]. */
  def audioNearDuplicates(df: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int = 4): DataFrame =
    graft.dedup.Dedup.hamming64Pairs(
      withAudioFingerprint(df, payloadCol), idCol, col("audio_fp"), maxHamming)

  /** Perceptual difference hash (dHash) of an image payload: REAL
    * decode -> [[bilinearResize]] to (gridW+1) x gridH -> integer
    * BT.601 luma (299r + 587g + 114b, milli-units so no fp) -> bit
    * (y*gridW + x) set when lum(x, y) > lum(x+1, y). 64 bits at the
    * default 8x8 grid. Robust to rescaling and uniform brightness
    * shifts (bits compare neighbors, not absolutes); deterministic end
    * to end (same decode + resize kernels the mm gate rows pin). */
  def dHash(payload: Array[Byte], gridW: Int = 8, gridH: Int = 8): Long = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    dHashImage(img, gridW, gridH)
  }

  /** [[dHash]] over an already-decoded frame (shared with the video
    * per-frame path). */
  def dHashImage(img: BufferedImage, gridW: Int = 8, gridH: Int = 8): Long = {
    require(gridW >= 1 && gridH >= 1 && gridW * gridH <= 64,
      "grid must hold at most 64 bits")
    val rs = bilinearResize(img, gridW + 1, gridH)
    def lum(rgb: Int): Int =
      299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) + 114 * (rgb & 0xFF)
    var bits = 0L
    var y = 0
    while (y < gridH) {
      var x = 0
      while (x < gridW) {
        if (lum(rs.getRGB(x, y)) > lum(rs.getRGB(x + 1, y)))
          bits |= 1L << (y * gridW + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Per-frame dHashes of an animated GIF (every `stride`-th frame). */
  def videoFrameDHashes(payload: Array[Byte], stride: Int): Seq[(Int, Long)] = {
    require(stride > 0, "stride must be positive")
    val it = ImageIO.getImageReadersByFormatName("gif")
    require(it.hasNext, "no GIF reader")
    val reader = it.next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      (0 until n by stride).map(i => (i, dHashImage(reader.read(i))))
    } finally { reader.dispose(); iis.close() }
  }

  /** Video near-duplicate pairs: two clips pair when ANY sampled frame
    * of one is within `maxHamming` bits of any sampled frame of the
    * other (the shared-scene criterion). Frames ride the same banded
    * 64-bit machinery — per (clip, frame) rows band-join, then pairs
    * collapse to distinct clip pairs with their minimum frame distance.
    * Shuffle = frames x 4 band keys; never a clip-level cross join. */
  def videoNearDuplicates(df: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int = 4, stride: Int = 1): DataFrame = {
    val inputSchema = df.schema
    val idIdx = inputSchema.fieldIndex(idCol)
    val payloadIdx = inputSchema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("_fid", StringType, nullable = false),
      StructField("_fhash", LongType, nullable = false))))
    val frames = df.mapPartitions { rows =>
      rows.flatMap { row =>
        val id = row.get(idIdx).toString
        videoFrameDHashes(row.getAs[Array[Byte]](payloadIdx), stride)
          .map { case (i, h) => Row(s"$id\u0001$i", h) }
      }
    }(enc)
    val clip = (c: org.apache.spark.sql.Column) =>
      substring_index(c, "\u0001", 1)
    graft.dedup.Dedup.hamming64Pairs(frames, "_fid", col("_fhash"), maxHamming)
      .select(clip(col("id_a")).as("id_a"), clip(col("id_b")).as("id_b"),
        col("hamming"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("hamming")).as("min_frame_hamming"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        col("min_frame_hamming"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("min_frame_hamming")).as("min_frame_hamming"))
  }

  /** Append `image_dhash` (LongType) to a binary image column —
    * partition-local batches, same contract as [[decodeImagesReal]]. */
  def withDHash(df: DataFrame, payloadCol: String,
      batchSize: Int = 256): DataFrame = {
    val inputSchema = df.schema
    val outSchema = StructType(inputSchema.fields :+
      StructField("image_dhash", LongType, nullable = false))
    val payloadIdx = inputSchema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          Row.fromSeq(row.toSeq :+ dHash(row.getAs[Array[Byte]](payloadIdx)))
        }
      }
    }(enc)
  }

  /** Image near-duplicate pairs: dHash + the engine's banded 64-bit
    * hamming machinery ([[graft.dedup.Dedup.hamming64Pairs]] — 4 x
    * 16-bit candidate bands, popcount verify, hot-band cap). The
    * multimodal sibling of text simhash dedup: resized/re-encoded
    * copies land within a few bits of the original. */
  def imageNearDuplicates(df: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int = 4): DataFrame =
    graft.dedup.Dedup.hamming64Pairs(
      withDHash(df, payloadCol), idCol, col("image_dhash"), maxHamming)

  val audioSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("duration_s", DoubleType, nullable = false),
    StructField("audio_features", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** STUB audio decode: 16 kHz mono s16le assumed; metadata derived from
    * the byte length, 4 MFCC-stand-in features from the md5. */
  def decodeAudioStub(payload: Array[Byte]): Row = {
    val nSamples = payload.length.toLong / 2
    val rate = 16000
    val digest = java.security.MessageDigest.getInstance("MD5").digest(payload)
    val features = digest.slice(8, 12).map(b => (b & 0xFF).toFloat / 255.0f)
    Row(rate, nSamples, nSamples.toDouble / rate, features.toSeq)
  }

  /** Decode a binary audio column in partition-local batches. */
  def decodeAudio(df: DataFrame, payloadCol: String,
      batchSize: Int = 256): DataFrame = {
    val inputSchema = df.schema
    val outSchema = StructType(inputSchema.fields ++ audioSchema.fields)
    val payloadIdx = inputSchema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val decoded = decodeAudioStub(row.getAs[Array[Byte]](payloadIdx))
          Row.fromSeq(row.toSeq ++ decoded.toSeq)
        }
      }
    }(enc)
  }

  // ---- real audio decode (javax.sound.sampled — the JDK's WAV/AIFF/AU
  // PCM codec; no external library). Same batched shape as the image
  // path; payloads stay on executors.

  val audioRealSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sum_samples", LongType, nullable = false)))

  /** Real audio decode: sample rate / channels / frame count from the
    * container header plus the exact integer sum of all 16-bit samples —
    * replicable in the SQL oracle on fixtures with known samples. PCM
    * s16 only (the WAV fixture format; lossless, so the read-back is
    * byte-identical to what was written). */
  def decodeAudioReal(payload: Array[Byte]): Row = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.BufferedInputStream(new ByteArrayInputStream(payload)))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16, s"expected 16-bit PCM, got ${fmt.getSampleSizeInBits}")
      val channels = fmt.getChannels
      val bytes = in.readAllBytes()
      val le = !fmt.isBigEndian
      var sum = 0L
      var i = 0
      while (i + 2 <= bytes.length) {
        val lo = bytes(if (le) i else i + 1) & 0xFF
        val hi = bytes(if (le) i + 1 else i) // sign byte: keep unmasked
        sum += ((hi << 8) | lo).toShort.toLong
        i += 2
      }
      val nSamples = bytes.length.toLong / 2
      Row(fmt.getSampleRate.toInt, channels, nSamples / channels, sum)
    } finally in.close()
  }

  /** Decode a binary audio column with the REAL codec in partition-local
    * batches — same batch contract as [[decodeAudio]]. */
  def decodeAudioReal(df: DataFrame, payloadCol: String,
      batchSize: Int): DataFrame = {
    val inputSchema = df.schema
    val outSchema = StructType(inputSchema.fields ++ audioRealSchema.fields)
    val payloadIdx = inputSchema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val decoded = decodeAudioReal(row.getAs[Array[Byte]](payloadIdx))
          Row.fromSeq(row.toSeq ++ decoded.toSeq)
        }
      }
    }(enc)
  }

  /** Deterministic WAV fixture spec: (sampleRate, nSamples); sample i is
    * `((docId * 31 + i * 17) % 2001) - 1000` — exact integer arithmetic
    * on docId, replicable in the SQL oracle. */
  def wavFixtureSpec(docId: Long): (Int, Int) =
    ((8000 + (docId % 8) * 1000).toInt, (64 + docId % 128).toInt)

  def wavFixtureSample(docId: Long, i: Int): Short =
    (((docId * 31 + i.toLong * 17) % 2001L) - 1000L).toShort

  /** Encode the [[wavFixtureSpec]] signal as PCM s16le mono WAV via the
    * JDK codec. */
  def encodeWavFixture(docId: Long): Array[Byte] = {
    val (rate, n) = wavFixtureSpec(docId)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = wavFixtureSample(docId, i)
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Build a (doc_id, payload) table of real WAV bytes, encoded in
    * partition-local batches. */
  def wavFixtures(docs: DataFrame, idCol: String = "doc_id",
      batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    docs.select(col(idCol).cast("long").as("doc_id")).mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val id = row.getLong(0)
          Row(id, encodeWavFixture(id))
        }
      }
    }(enc)
  }

  // ---- real multi-frame (video-like) decode: animated GIF via
  // javax.imageio — the one multi-frame temporal format the JDK decodes.
  // Frame sampling + per-frame feature extraction run on REAL frames.

  val videoFramesSchema: StructType = StructType(Seq(
    StructField("n_frames", IntegerType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  /** Decode an animated-GIF payload and sample every `stride`-th frame:
    * (n_frames, frame_idx, width, height, exact per-channel pixel sums)
    * per sampled frame.
    *
    * NO inter-frame compositing: each frame is read as its RAW raster
    * (`reader.read(i)`), so for real-world GIFs that use disposal
    * methods / partial frame rects the per-frame width/height and sums
    * describe that frame's delta rect, not the composited canvas —
    * exact for full-frame-per-frame payloads (the fixtures), surprising
    * for delta-encoded ones. Compositing would need the stream
    * metadata's disposal/offset handling (same class of caveat as
    * decodeImageReal's no-color-management sRGB assumption). */
  def decodeVideoFrames(payload: Array[Byte], stride: Int): Seq[Row] = {
    require(stride > 0, "stride must be positive")
    val it = ImageIO.getImageReadersByFormatName("gif")
    require(it.hasNext, "no GIF reader")
    val reader = it.next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      (0 until n by stride).map { i =>
        val img = reader.read(i)
        var sumR = 0L; var sumG = 0L; var sumB = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sumR += (rgb >> 16) & 0xFF; sumG += (rgb >> 8) & 0xFF; sumB += rgb & 0xFF
            x += 1
          }
          y += 1
        }
        Row(n, i, img.getWidth, img.getHeight, sumR, sumG, sumB)
      }
    } finally { reader.dispose(); iis.close() }
  }

  /** Frame-sample a binary animated-GIF column in partition-local
    * batches; one output row per sampled frame (flatMap — a doc with f
    * frames emits ceil(f/stride) rows). */
  def sampleVideoFrames(df: DataFrame, payloadCol: String, stride: Int,
      batchSize: Int = 64): DataFrame = {
    val inputSchema = df.schema
    val outSchema = StructType(inputSchema.fields ++ videoFramesSchema.fields)
    val payloadIdx = inputSchema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.flatMap { row =>
          decodeVideoFrames(row.getAs[Array[Byte]](payloadIdx), stride)
            .map(f => Row.fromSeq(row.toSeq ++ f.toSeq))
        }
      }
    }(enc)
  }

  /** Deterministic GIF fixture spec: (width, height, nFrames); frame j
    * is the solid color [[gifFixtureColor]](docId, j) — exact integer
    * arithmetic on docId, replicable in the SQL oracle. */
  def gifFixtureSpec(docId: Long): (Int, Int, Int) =
    ((8 + docId % 8).toInt, (8 + (docId * 3) % 8).toInt, (2 + docId % 5).toInt)

  def gifFixtureColor(docId: Long, frame: Int): (Int, Int, Int) =
    (((docId * 31 + frame * 7) % 256).toInt,
     ((docId * 67 + frame * 11) % 256).toInt,
     ((docId * 101 + frame * 13) % 256).toInt)

  /** Encode the [[gifFixtureSpec]] animation (solid-color frames — GIF's
    * palette holds each exactly, so decode is lossless). */
  def encodeGifFixture(docId: Long): Array[Byte] = {
    val (w, h, n) = gifFixtureSpec(docId)
    val it = ImageIO.getImageWritersByFormatName("gif")
    require(it.hasNext, "no GIF writer")
    val writer = it.next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var j = 0
      while (j < n) {
        val (r, g, b) = gifFixtureColor(docId, j)
        val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
        val tone = (r << 16) | (g << 8) | b
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, tone); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
          writer.getDefaultWriteParam)
        j += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Build a (doc_id, payload) table of real animated-GIF bytes. */
  def gifFixtures(docs: DataFrame, idCol: String = "doc_id",
      batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    docs.select(col(idCol).cast("long").as("doc_id")).mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val id = row.getLong(0)
          Row(id, encodeGifFixture(id))
        }
      }
    }(enc)
  }

  /** Frame sampling STUB for video payloads: deterministic frame index
    * list (every `stride`-th "frame" of n_frames derived from length). */
  def sampleFrameIndexes(df: DataFrame, payloadCol: String, stride: Int): DataFrame =
    df.withColumn("n_frames", (length(col(payloadCol)) % 240 + 1).cast("int"))
      .withColumn("frame_indexes",
        sequence(lit(0), col("n_frames") - 1, lit(stride)))

  /** Adapt the documents table into a fake media table: payload bytes are
    * the UTF-8 text (stands in for image bytes; deterministic). */
  def documentsAsMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast(BinaryType).as("payload"),
      col("source"))
}
