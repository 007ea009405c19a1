package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media ride as opaque `binary` columns with
  * typed metadata; decode / feature-extract / frame-sample run as
  * per-partition batch transforms over the binary payload.
  *
  * Image payloads decode for real through `javax.imageio` (PNG/JPEG/GIF/
  * BMP ship with the JDK): true width/height/channels + a deterministic
  * luminance-grid feature vector. Payloads no JDK reader accepts (and
  * audio/video, whose codecs don't ship in this container) fall back to
  * `decodeStub` — deterministic fake dimensions + features derived from
  * the bytes, clearly marked below. Everything Spark-side — schema,
  * batching via mapPartitions, partition-size control, column pruning of
  * the heavy binary column — is real and tested (MultimodalSpec).
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, channels: Int, byteLen: Long)
  case class MediaFeatures(doc: Long, width: Int, height: Int,
      channels: Int, feature: Array[Float])

  /** STUB decode: a real build calls the codec here (e.g. javax.imageio /
    * ffmpeg bindings) on the payload; this deterministic fake keeps the
    * pipeline shape (bytes -> dims + fixed-width feature vector)
    * exercisable without codecs. */
  private[multimodal] def decodeStub(payload: Array[Byte], featDim: Int): (MediaMeta, Array[Float]) = {
    val h = java.util.Arrays.hashCode(payload)
    val meta = MediaMeta(
      width = 64 + math.abs(h % 961),
      height = 64 + math.abs((h / 961) % 961),
      channels = 3,
      byteLen = payload.length.toLong)
    val feat = Array.tabulate(featDim) { i =>
      // deterministic pseudo-feature from payload bytes
      val b = if (payload.isEmpty) 0 else payload(i % payload.length) & 0xff
      ((b * 31 + i * 17 + (h & 0xff)) % 256) / 255.0f
    }
    (meta, feat)
  }

  /** Deterministic synthetic media corpus: real PNG payloads with
    * varying dims and a deterministic raster, plus every 7th payload as
    * junk bytes (exercises the best-effort `ok = false` path). Generated
    * distributed via mapPartitions — same doc id => same bytes on any
    * partitioning, so oracle dumps and queries can regenerate it
    * independently. */
  def synthPngs(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long]
      .mapPartitions { it =>
        it.map { i =>
          if (i % 7 == 3) (i, s"not-an-image-$i".getBytes("UTF-8"))
          else {
            val w = 16 + ((i * 7) % 48).toInt
            val h = 12 + ((i * 5) % 36).toInt
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                img.setRGB(x, y, ((x * 31 + y * 17 + i * 101) & 0xFFFFFF).toInt)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            (i, bos.toByteArray)
          }
        }
      }
      .toDF("doc", "payload")
  }

  /** Cheap magic-byte sniff for the formats the JDK ships readers for
    * (PNG / JPEG / GIF / BMP / WBMP-less TIFF is absent in 17). At corpus
    * scale most payloads are NOT images; skipping ImageIO's reader-probe
    * machinery for them keeps the batch transform at memcmp cost on the
    * common path. */
  private[graft] def looksLikeImage(p: Array[Byte]): Boolean =
    (p.length >= 8 &&
      p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
    (p.length >= 3 &&
      p(0) == 0xff.toByte && p(1) == 0xd8.toByte && p(2) == 0xff.toByte) ||
    (p.length >= 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
    (p.length >= 2 && p(0) == 'B' && p(1) == 'M')

  /** Real image decode via the JDK's ImageIO; None when no registered
    * reader accepts the payload (caller falls back to the stub).
    * Features: deterministic luminance samples on a fixed pseudo-random
    * pixel grid — a stand-in for a real embedding model with the same
    * shape (fixed-width float vector per image). */
  private[graft] def decodeImage(payload: Array[Byte],
      featDim: Int): Option[(MediaMeta, Array[Float])] = {
    if (payload.isEmpty || !looksLikeImage(payload)) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val channels = img.getColorModel.getNumComponents
        val feat = Array.tabulate(featDim) { i =>
          val x = (((i + 1) * 2654435761L) % w).toInt
          val y = (((i + 1) * 40503L) % h).toInt
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          lum / 255.0f
        }
        Some((MediaMeta(w, h, channels, payload.length.toLong), feat))
      }
    } catch { case _: Throwable => None }
  }

  /** Batch feature extraction over a binary column: mapPartitions so a
    * real decoder amortizes per-partition init (model load / codec ctx) —
    * the Scala analogue of a pandas-UDF batch. Input needs (idCol long,
    * binCol binary); heavy binary column is pruned after this stage.
    * Decodable images get real dims+features; everything else the stub. */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String,
      featDim: Int = 16): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init point (a real model/codec handle would load
        // here, once per partition; ImageIO readers are stateless)
        it.map { case (id, bytes) =>
          val payload = if (bytes == null) Array.emptyByteArray else bytes
          val (meta, feat) = decodeImage(payload, featDim)
            .getOrElse(decodeStub(payload, featDim))
          MediaFeatures(id, meta.width, meta.height, meta.channels, feat)
        }
      }
  }

  case class ResizedMedia(doc: Long, ok: Boolean, outWidth: Int,
      outHeight: Int, resized: Array[Byte])

  /** REAL image resize over a binary column: ImageIO decode → bilinear
    * Graphics2D scale → PNG re-encode, per-partition batches (the codec/
    * buffer state amortizes like a pandas-UDF batch). Payloads no JDK
    * reader accepts pass through with `ok = false` and the original
    * bytes, so a mixed corpus keeps its schema and row count — the
    * standard shape of a best-effort media-normalization stage at scale
    * (filter on `ok` downstream). */
  def resizeImages(df: DataFrame, idCol: String, binCol: String,
      outW: Int, outH: Int): Dataset[ResizedMedia] = {
    require(outW > 0 && outH > 0, s"target dims must be positive: ${outW}x$outH")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val payload = if (bytes == null) Array.emptyByteArray else bytes
          val decoded =
            if (!looksLikeImage(payload)) None
            else try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload)))
            catch { case _: Throwable => None }
          decoded match {
            case Some(img) =>
              val out = new java.awt.image.BufferedImage(outW, outH,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, outW, outH, null)
              g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              ResizedMedia(id, ok = true, outW, outH, bos.toByteArray)
            case None =>
              ResizedMedia(id, ok = false, 0, 0, payload)
          }
        }
      }
  }

  /** Deterministic near-dup image corpus: `groups` base 64×64 grayscale
    * PNGs, each a BIMODAL 8×8 cell mosaic (cells at 32 or 224, selected
    * by a group-specific hashed bit pattern — every cell sits ~96 levels
    * from the global mean, so small mean drift can never flip an
    * unrelated bit), each with 3 variants: the base, one cell inverted,
    * two cells inverted. Within-group aHash distance is exactly the
    * number of inverted cells (≤ 2); across groups ~half the pattern
    * bits differ. doc = group*3 + variant; content depends only on doc,
    * so any consumer regenerates the same bytes at any partitioning. */
  def synthPngVariants(spark: SparkSession, groups: Int): DataFrame = {
    import spark.implicits._
    spark.range(groups * 3L).as[Long]
      .mapPartitions { it =>
        it.map { doc =>
          val g = doc / 3
          val v = (doc % 3).toInt
          // splitmix64-style per-group pattern
          var z = (g + 1) * -7046029254386353131L
          z = (z ^ (z >>> 30)) * -4658895280553007687L
          z = (z ^ (z >>> 27)) * -7723592293110705685L
          val pattern = z ^ (z >>> 31)
          val img = new java.awt.image.BufferedImage(
            64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 64) {
            var x = 0
            while (x < 64) {
              val cell = (y / 8) * 8 + (x / 8)
              val bright = (((pattern >>> cell) & 1L) == 1L) ^ (cell < v)
              val lum = if (bright) 224 else 32
              img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (doc, bos.toByteArray)
        }
      }
      .toDF("doc", "payload")
  }

  case class PHash(doc: Long, ok: Boolean, cells: Array[Int], hash: Long)

  /** 8×8 average-hash cells of a decoded image: integer block-mean
    * luminance per cell (floor division throughout — deterministic and
    * SQL-replayable), cell (by,bx) covering pixel rows
    * [by·h/8, (by+1)·h/8) etc. Requires w,h ≥ 8. */
  private[multimodal] def aHashCells(img: java.awt.image.BufferedImage): Array[Int] = {
    val w = img.getWidth
    val h = img.getHeight
    Array.tabulate(64) { c =>
      val bx = c % 8
      val by = c / 8
      val x0 = bx * w / 8; val x1 = (bx + 1) * w / 8
      val y0 = by * h / 8; val y1 = (by + 1) * h / 8
      var sum = 0L
      var n = 0
      var y = y0
      while (y < y1) {
        var x = x0
        while (x < x1) {
          val rgb = img.getRGB(x, y)
          sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          n += 1
          x += 1
        }
        y += 1
      }
      (sum / math.max(n, 1)).toInt
    }
  }

  /** Perceptual (average) hash per image: bit i set iff cell i's mean
    * luminance exceeds the 64-cell mean — the classic aHash. REAL decode;
    * undecodable payloads come back ok=false with hash 0. */
  def perceptualHashes(df: DataFrame, idCol: String,
      binCol: String): Dataset[PHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val payload = if (bytes == null) Array.emptyByteArray else bytes
          val decoded =
            if (!looksLikeImage(payload)) None
            else try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload)))
            catch { case _: Throwable => None }
          decoded.filter(i => i.getWidth >= 8 && i.getHeight >= 8) match {
            case Some(img) =>
              val cells = aHashCells(img)
              val mean = cells.map(_.toLong).sum / 64
              var hash = 0L
              var i = 0
              while (i < 64) {
                if (cells(i) > mean) hash |= (1L << i)
                i += 1
              }
              PHash(id, ok = true, cells, hash)
            case None => PHash(id, ok = false, Array.fill(64)(0), 0L)
          }
        }
      }
  }

  /** Image near-dup pairs by perceptual-hash Hamming distance ≤ maxDist
    * (≤ 3): the SimHash pigeonhole applied to images — 4 bands of 16
    * bits, a pair within distance 3 shares at least one intact band, so
    * candidates come from 4 equi-joins on 2-byte keys and only
    * candidates pay the bit_count(xor) confirm. The heavy binary column
    * dies at the hash stage; bands and pairs carry (id, 8-byte hash)
    * only. Output: (id0, id1, dist). */
  def imageNearDupPairs(df: DataFrame, idCol: String, binCol: String,
      maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3, s"pigeonhole bands cover <= 3: $maxDist")
    val spark = df.sparkSession
    val ph = perceptualHashes(df, idCol, binCol).toDF()
      .where(col("ok")).select(col("doc"), col("hash"))
    val banded = ph.select(col("doc"), col("hash"),
        explode(expr("transform(sequence(0, 3), " +
          "b -> struct(b AS band, shiftright(hash, b * 16) % 65536 AS key))"))
          .as("bk"))
      .select(col("doc"), col("hash"), col("bk.band"), col("bk.key"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id0"), col("b.doc").as("id1"),
        col("a.hash").as("h0"), col("b.hash").as("h1"))
      .distinct()
    cand.select(col("id0"), col("id1"),
        expr("CAST(bit_count(h0 ^ h1) AS INT)").as("dist"))
      .where(col("dist") <= maxDist)
  }

  /** Frame sampling stub: split a binary "video" payload into fixed-size
    * frames and keep every `stride`-th — exercises the explode/slice
    * plumbing of per-frame rows. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int, stride: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val payload = if (bytes == null) Array.emptyByteArray else bytes
        val nFrames = payload.length / frameBytes
        (0 until nFrames by stride).map { f =>
          val frame = java.util.Arrays.copyOfRange(payload, f * frameBytes, (f + 1) * frameBytes)
          (id, f, frame)
        }
      }
      .toDF(idCol, "frame_idx", "frame")
  }
}
