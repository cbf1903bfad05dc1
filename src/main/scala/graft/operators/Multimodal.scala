package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * The Spark-side shape is real — schema, partition-parallel batch
  * processing via `mapPartitions` over a typed Dataset, deterministic
  * output. The decode (`decode`) is REAL for the formats the JDK ships
  * readers for (images: PNG/JPEG/GIF/BMP via `javax.imageio`; audio:
  * WAV/AIFF/AU via `javax.sound.sampled`, see [[audioMeta]]; video:
  * RIFF/AVI container walk + MJPEG frame decode, see [[decodeVideo]] —
  * true dimensions/sample/frame counts, no external codecs needed) and
  * falls back to the clearly-marked deterministic stub (`decodeStub`)
  * for everything else (H.264-class video, compressed audio — no
  * codecs in this environment). Swapping in a fuller decoder (JavaCV,
  * TwelveMonkeys, an FFI codec) changes ONLY that function; the
  * distributed plumbing, batching and schema stay.
  *
  * At 100 TB: binary payloads ride in Parquet with the metadata columns,
  * so metadata-only queries never deserialize payload bytes (column
  * pruning), and decode jobs scale with partitions.
  */
/** Typed metadata row produced by the decode pass. Top-level so Spark's
  * generated encoder code can access the constructor. */
case class MediaMeta(
    doc_id: Long, n_bytes: Long, sha256: String,
    width: Long, height: Long, n_frames: Long)

/** Typed audio metadata row (real `javax.sound.sampled` parse). */
case class AudioMeta(
    doc_id: Long, n_bytes: Long, sample_rate: Long, channels: Long,
    n_samples: Long, duration_ms: Long)

case class MediaIn(doc_id: Long, content: Array[Byte])

object Multimodal {

  /** Feature-vector width for featureExtract; the multimodal_features
    * oracle SQL is generated from this same constant (single source of
    * truth, no Spark/oracle drift). */
  val DefaultFeatures = 8

  /** STUB decoder — deterministic fake dimensions from payload length.
    * The fallback for payload types the JVM cannot decode natively
    * (video/audio — no codecs in this environment); signature stays. */
  def decodeStub(content: Array[Byte]): (Long, Long, Long) = {
    val n = content.length.toLong
    (n % 640 + 16, (n * 7) % 480 + 16, n % 30 + 1)
  }

  /** Magic-byte sniff for the formats the JDK's built-in ImageIO readers
    * handle (PNG, JPEG, GIF, BMP) — cheap, so most non-image payloads
    * never pay a decode attempt. The 2-byte BMP magic is also the English
    * word "BM", so text CAN pass the sniff; that is safe (decode()
    * catches the parse failure and falls back to the stub) and keeps
    * real-but-sloppy BMPs (nonzero reserved header bytes exist in the
    * wild) on the true-decode path. */
  private def looksLikeImage(c: Array[Byte]): Boolean =
    c.length >= 4 && (
      (c(0) == 0x89.toByte && c(1) == 'P' && c(2) == 'N' && c(3) == 'G') ||
      (c(0) == 0xff.toByte && c(1) == 0xd8.toByte && c(2) == 0xff.toByte) ||
      (c(0) == 'G' && c(1) == 'I' && c(2) == 'F' && c(3) == '8') ||
      (c(0) == 'B' && c(1) == 'M'))

  /** Real decode where the JVM can (ImageIO: PNG/JPEG/GIF/BMP → true
    * width/height, single frame), deterministic stub everywhere else —
    * including payloads that pass the sniff but fail to parse (ImageIO
    * readers THROW on truncated/corrupt streams rather than returning
    * null; a text payload that happens to match a magic must degrade to
    * the stub, never kill the task). Pure-JVM, no native codecs, safe on
    * headless executors. */
  def decode(content: Array[Byte]): (Long, Long, Long) =
    if (looksLikeImage(content)) {
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        if (img == null) decodeStub(content)
        else (img.getWidth.toLong, img.getHeight.toLong, 1L)
      } catch { case scala.util.control.NonFatal(_) => decodeStub(content) }
    } else if (looksLikeAvi(content)) {
      decodeVideo(content).getOrElse(decodeStub(content))
    } else decodeStub(content)

  /** Minimal MJPEG-in-AVI writer — the video test-payload generator (the
    * wavBytes analog): `nFrames` deterministic synthetic frames,
    * JPEG-encoded by the JDK's own ImageIO writer, wrapped in a standard
    * RIFF/AVI container (hdrl with avih + one strl, movi with one '00dc'
    * chunk per frame). Pure JDK, runs on executors. */
  def aviMjpegBytes(width: Int, height: Int, nFrames: Int): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0, "invalid avi params")
    val frames = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          img.setRGB(x, y, ((x * 7 + y * 13 + f * 29) % 256) * 0x010101)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = data.length % 2 // RIFF chunks are word-aligned
      val b = java.nio.ByteBuffer.allocate(8 + data.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes("US-ASCII")).putInt(data.length).put(data)
      b.array()
    }
    def list(kind: String, contents: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ contents)
    val avih = { // MainAVIHeader: 56 bytes
      val b = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(40000)               // dwMicroSecPerFrame (25 fps)
        .putInt(0).putInt(0).putInt(0)
        .putInt(nFrames)            // dwTotalFrames
        .putInt(0)
        .putInt(1)                  // dwStreams
        .putInt(0)
        .putInt(width).putInt(height)
      b.array()                     // 4 reserved dwords stay zero
    }
    val strh = { // AVIStreamHeader: 56 bytes, fccType 'vids', handler 'MJPG'
      val b = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
        .putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(1)                  // dwScale
        .putInt(25)                 // dwRate
        .putInt(0)
        .putInt(nFrames)            // dwLength
      b.array()
    }
    val strf = { // BITMAPINFOHEADER: 40 bytes, biCompression 'MJPG'
      val b = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(40).putInt(width).putInt(height)
        .putShort(1).putShort(24)
        .put("MJPG".getBytes("US-ASCII"))
      b.array()
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap(fb => chunk("00dc", fb)).toArray)
    chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
  }

  /** REAL video-container decode, pure JVM: walks the RIFF/AVI chunk tree
    * (the container layer every AVI tool speaks), counts the movi list's
    * video frame chunks, and — when the frames are MJPEG — decodes the
    * first frame's actual JPEG bytes with ImageIO for the true
    * dimensions, falling back to the avih header dims for codecs the JDK
    * cannot decode (the honest boundary: container + MJPEG are fully
    * real here; H.264-class codecs remain environment-bound behind the
    * stub). Returns (width, height, nFrames) or None if the payload is
    * not a parseable AVI. */
  def decodeVideo(content: Array[Byte]): Option[(Long, Long, Long)] =
    try {
      val b = java.nio.ByteBuffer.wrap(content).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      if (content.length < 24) return None
      val riff = new Array[Byte](4); b.get(riff)
      b.getInt() // riff size
      val kind = new Array[Byte](4); b.get(kind)
      if (new String(riff, "US-ASCII") != "RIFF" ||
          new String(kind, "US-ASCII") != "AVI ") return None
      var headerW, headerH = 0L
      var frames = 0L
      var firstFrame: Option[Array[Byte]] = None
      // iterative chunk walk over a work-list of (start, end) regions —
      // no recursion, bounded by payload size even on hostile inputs
      var regions = List((b.position(), content.length))
      while (regions.nonEmpty) {
        var (pos, end) = regions.head
        regions = regions.tail
        while (pos + 8 <= end) {
          val id = new String(content, pos, 4, "US-ASCII")
          val size = java.nio.ByteBuffer.wrap(content, pos + 4, 4)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt()
          if (size < 0 || pos + 8 + size > end) { pos = end } // corrupt: stop region
          else {
            if (id == "LIST") regions = (pos + 12, pos + 8 + size) :: regions
            else if (id == "avih" && size >= 40) {
              // absolute offsets into the payload: wrap(array, off, len)
              // does NOT rebase index 0, so index from the chunk start
              val h = java.nio.ByteBuffer.wrap(content)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              headerW = h.getInt(pos + 8 + 32).toLong
              headerH = h.getInt(pos + 8 + 36).toLong
            } else if (id.endsWith("dc") || id.endsWith("db")) {
              frames += 1
              if (firstFrame.isEmpty)
                firstFrame = Some(java.util.Arrays.copyOfRange(
                  content, pos + 8, pos + 8 + size))
            }
            pos += 8 + size + (size % 2) // word alignment
          }
        }
      }
      if (frames == 0 && headerW == 0) None
      else {
        val dims = firstFrame.flatMap { fb =>
          try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fb)))
            .map(img => (img.getWidth.toLong, img.getHeight.toLong))
          catch { case scala.util.control.NonFatal(_) => None }
        }
        val (w, h) = dims.getOrElse((headerW, headerH))
        Some((w, h, frames))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** RIFF/AVI sniff (mirrors looksLikeImage's role for video). */
  private def looksLikeAvi(c: Array[Byte]): Boolean =
    c.length >= 12 && c(0) == 'R' && c(1) == 'I' && c(2) == 'F' && c(3) == 'F' &&
      c(8) == 'A' && c(9) == 'V' && c(10) == 'I' && c(11) == ' '

  /** Attach a binary payload column. A pre-existing `content` binary
    * column (e.g. from a binaryFile source, or a spec injecting real
    * image bytes) is kept; otherwise the UTF-8 text bytes stand in for a
    * media blob.
    *
    * CONTRACT: NULL-payload rows are dropped on BOTH paths — a row with
    * no bytes has nothing to decode, and the decode kernels stream raw
    * arrays (a null would NPE mid-partition). This applies to
    * caller-supplied `content` columns too: a sparse binary column
    * (e.g. a mixed-modality table where only some rows carry media)
    * loses its NULL rows here, so callers who need those rows in the
    * output must branch upstream (filter + union, or coalesce a
    * sentinel payload) rather than expect a NULL-metadata passthrough.
    * The declared oracles mirror the synthesized path's drop with
    * WHERE text IS NOT NULL. */
  def withPayload(docs: DataFrame): DataFrame = {
    val attached =
      if (docs.columns.contains("content")) docs
      else docs.withColumn("content", col("text").cast("binary"))
    attached.filter(col("content").isNotNull)
  }

  /** Batch decode: one decoder instantiation per partition (the expensive
    * part for real codecs), streaming through the rows.
    *
    * `decoder` defaults to the real-where-possible [[decode]]; callers
    * whose downstream contract is pinned to the stub formula (the declared
    * oracle queries — their DuckDB SQL hardcodes [[decodeStub]]'s
    * arithmetic) pass [[decodeStub]] explicitly, so parity never depends
    * on "no text payload happens to parse as an image". */
  def decodeMeta(spark: SparkSession, docs: DataFrame,
      decoder: Array[Byte] => (Long, Long, Long) = decode): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload(docs).select(col("doc_id"), col("content")).as[MediaIn]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("SHA-256") // per-partition setup
        it.map { m =>
          md.reset()
          val sha = md.digest(m.content).map(b => f"${b & 0xff}%02x").mkString
          val (w, h, f) = decoder(m.content)
          MediaMeta(m.doc_id, m.content.length.toLong, sha, w, h, f)
        }
      }
  }

  /** Minimal PCM16-LE WAV writer — the audio test-payload generator
    * (sample bytes are a deterministic ramp; metadata is what matters).
    * Pure arithmetic + arraycopy, runs on executors. */
  def wavBytes(sampleRate: Int, channels: Int, nSamples: Int): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nSamples >= 0, "invalid wav params")
    // data size is computed in Int domain for ByteBuffer.allocate — fail
    // with the contract named rather than a negative-allocation error
    require(nSamples.toLong * channels * 2 <= Int.MaxValue - 44L,
      s"wav payload too large: $nSamples samples x $channels channels")
    val dataSize = nSamples * channels * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)                       // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2)         // byte rate
      .putShort((channels * 2).toShort)          // block align
      .putShort(16.toShort)                      // bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nSamples * channels) { buf.putShort(((i * 31) % 8192).toShort); i += 1 }
    buf.array()
  }

  /** REAL audio parse via `javax.sound.sampled.AudioSystem` — pure JDK,
    * no external codecs (WAV/AIFF/AU are in-boundary; MP3/OGG/FLAC stay
    * behind the stub fallback like video). Returns (sampleRate, channels,
    * sampleFrames) or None for payloads the JDK cannot parse. */
  def decodeAudio(content: Array[Byte]): Option[(Long, Long, Long)] =
    try {
      val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(content))
      Some((fmt.getFormat.getSampleRate.toLong,
        fmt.getFormat.getChannels.toLong, fmt.getFrameLength.toLong))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Batch audio-metadata pass: same per-partition streaming shape as
    * [[decodeMeta]]; unparseable payloads degrade to the deterministic
    * stub mapped into the audio fields (stub width→sample rate,
    * height→channels mod 2 + 1, frames→samples), never a task kill.
    * duration_ms is exact integer floor arithmetic (oracle-portable). */
  def audioMeta(spark: SparkSession, docs: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    withPayload(docs).select(col("doc_id"), col("content")).as[MediaIn]
      .mapPartitions { it =>
        it.map { m =>
          val (sr, ch, ns) = decodeAudio(m.content).getOrElse {
            val (w, h, f) = decodeStub(m.content)
            (w * 25 + 8000, h % 2 + 1, f * 1000)
          }
          AudioMeta(m.doc_id, m.content.length.toLong, sr, ch, ns,
            if (sr == 0) 0L else ns * 1000L / sr)
        }
      }
  }

  /** Resize planning: target dimensions fitting `box`×`box` while
    * preserving aspect ratio (the standard vision-preprocessing contract).
    * Pure integer/floor arithmetic over the decoded metadata — the actual
    * pixel resample belongs in the per-partition decode pass behind
    * `decodeStub`; THIS step (what size each asset becomes, which assets
    * can skip resampling) is the distributed planning half a 100 TB
    * pipeline runs first, and it never touches payload bytes (column
    * pruning keeps the scan metadata-only). */
  def resizePlan(spark: SparkSession, docs: DataFrame, box: Long = 224,
      decoder: Array[Byte] => (Long, Long, Long) = decode): DataFrame = {
    val meta = decodeMeta(spark, docs, decoder).toDF()
    // scale = box / max(w, h), clamped to 1 (never upscale); floor to ints
    val longSide = greatest(col("width"), col("height"))
    val needs = longSide > box
    meta.select(
      col("doc_id"), col("width"), col("height"),
      when(needs, floor(col("width") * box / longSide).cast("long"))
        .otherwise(col("width")).as("out_width"),
      when(needs, floor(col("height") * box / longSide).cast("long"))
        .otherwise(col("height")).as("out_height"),
      needs.as("needs_resize"))
      .orderBy(col("doc_id"))
  }

  /** Feature extraction: a fixed-width embedding per asset. A real
    * pipeline runs a vision/audio encoder inside the per-partition batch
    * pass (same codec-stub boundary as decodeStub); here the features are
    * derived deterministically from the payload's SHA-256 — byte i of the
    * digest scaled to [0, 1] — so the plumbing (schema, fan-out grain,
    * downstream joins to the embeddings ops) is real and oracle-checkable
    * while the encoder itself is the documented stub. */
  def featureExtract(spark: SparkSession, docs: DataFrame,
      nFeatures: Int = Multimodal.DefaultFeatures,
      decoder: Array[Byte] => (Long, Long, Long) = decode): DataFrame = {
    val meta = decodeMeta(spark, docs, decoder).toDF()
    val feats = (0 until nFeatures).map { i =>
      (conv(substring(col("sha256"), 2 * i + 1, 2), 16, 10).cast("long") / 255.0)
        .as(s"f$i")
    }
    meta.select(col("doc_id") +: feats: _*).orderBy(col("doc_id"))
  }

  /** Frame sampling: up to `maxFrames` evenly-spaced frame indices per
    * asset — frame i·ceil(n/maxFrames) for i = 0.. — exploded to one row
    * per (doc_id, frame_idx). The grain a video pipeline fans out on: the
    * decode of each sampled frame is then partition-parallel work keyed by
    * (doc_id, frame_idx). Index selection is pure arithmetic over n_frames
    * (oracle-checkable); the frame-bytes extraction is the codec's job
    * behind the same stub boundary as decodeStub. */
  def frameSample(spark: SparkSession, docs: DataFrame, maxFrames: Int = 4,
      decoder: Array[Byte] => (Long, Long, Long) = decode): DataFrame = {
    val meta = decodeMeta(spark, docs, decoder).toDF()
    val stride = ceil(col("n_frames").cast("double") / maxFrames).cast("long")
    meta.select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, stride)).as("frame_idx"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }
}
