package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column plumbing: media payloads ride as opaque BINARY columns
  * with typed metadata structs. The *decode* step (image/audio codecs) is a
  * deliberate stub — the codec libraries aren't in this environment — but
  * the Spark-side contract is real and tested: schema, batch-shaped
  * per-partition processing (the JVM analog of `mapInPandas`: one decoder
  * instantiation per partition, amortized across its rows, never per row),
  * and partition sizing by byte volume rather than row count.
  */
object Multimodal {

  final case class MediaMeta(
      byte_len: Long,
      format: String,
      width: Int,
      height: Int,
      valid: Boolean)

  final case class MediaRow(doc_id: Long, media: Array[Byte], meta: MediaMeta)

  /** Image decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP — no external
    * codec libraries needed): real format + dimensions from the stream
    * header, without buffering the full decoded raster. Payloads ImageIO
    * cannot identify (e.g. audio/video containers, whose codecs aren't in
    * this environment) fall back to a clearly-marked deterministic stub so
    * the pipeline shape stays testable end-to-end. */
  def decodeOne(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null || bytes.isEmpty) return MediaMeta(0L, "empty", 0, 0, valid = false)
    val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (readers.hasNext) {
        val r = readers.next()
        try {
          r.setInput(iis)
          // header-only: width/height come from metadata, no raster decode
          MediaMeta(bytes.length.toLong, r.getFormatName.toLowerCase,
            r.getWidth(0), r.getHeight(0), valid = true)
        } finally r.dispose()
      } else stubMeta(bytes)
    } catch {
      case _: Exception => MediaMeta(bytes.length.toLong, "corrupt", 0, 0, valid = false)
    } finally iis.close()
  }

  /** STUB for non-image media (audio/video codecs aren't in this
    * environment): deterministic fake metadata from the header bytes. */
  private def stubMeta(bytes: Array[Byte]): MediaMeta = {
    val h = java.util.Arrays.hashCode(java.util.Arrays.copyOf(bytes, math.min(64, bytes.length)))
    MediaMeta(bytes.length.toLong, "unknown", 64 + (h & 0x3ff), 64 + ((h >>> 10) & 0x3ff),
      valid = false)
  }

  /** Deterministic synthetic PNG (real, ImageIO-decodable) — the media
    * fixture generator for tests and the m01 oracle query. */
  def syntheticPng(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (((seed * 31 + x) * 17 + y) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream(w * h / 4 + 128)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic solid-color synthetic PNG: with every pixel identical,
    * any resize kernel preserves the color exactly — the fixture that makes
    * feature extraction closed-form checkable. */
  def syntheticSolidPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb & 0xffffff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream(256)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real image resize (ImageIO + Graphics2D): longest side scaled to
    * `maxDim` with integer math (w2 = max(1, w*maxDim/max(w,h))) so the
    * output dimensions have a closed form; images already within bounds
    * pass through untouched. Null for undecodable payloads. */
  def resizeOne(bytes: Array[Byte], maxDim: Int): Array[Byte] = {
    if (bytes == null || bytes.isEmpty) return null
    val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    val m = math.max(w, h)
    if (m <= maxDim) return bytes
    val w2 = math.max(1, w * maxDim / m)
    val h2 = math.max(1, h * maxDim / m)
    val out = new java.awt.image.BufferedImage(w2, h2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try g.drawImage(img, 0, 0, w2, h2, null) finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream(bytes.length / 2 + 128)
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  final case class MediaFeatures(width: Int, height: Int,
                                 avg_r: Int, avg_g: Int, avg_b: Int, valid: Boolean)

  /** Real feature extraction: decoded dimensions + mean RGB (floor of the
    * exact per-channel sum). The embedding-ish signal a training pipeline
    * derives per image, minus the model inference this environment can't
    * run. */
  def featuresOne(bytes: Array[Byte]): MediaFeatures = {
    if (bytes == null || bytes.isEmpty) return MediaFeatures(0, 0, 0, 0, 0, valid = false)
    val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return MediaFeatures(0, 0, 0, 0, 0, valid = false)
    val w = img.getWidth
    val h = img.getHeight
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff
        sg += (p >> 8) & 0xff
        sb += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    MediaFeatures(w, h, (sr / n).toInt, (sg / n).toInt, (sb / n).toInt, valid = true)
  }

  final case class TransformedRow(doc_id: Long, width: Int, height: Int,
                                  avg_r: Int, avg_g: Int, avg_b: Int, valid: Boolean)

  /** Resize + feature-extract as one per-partition batch pass (decoder
    * state amortized across the partition's rows, media bytes touched
    * once). Input: (doc_id LONG, media BINARY). */
  def transform(spark: SparkSession, df: DataFrame, maxDim: Int): Dataset[TransformedRow] = {
    import spark.implicits._
    df.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val f = featuresOne(resizeOne(bytes, maxDim))
          TransformedRow(id, f.width, f.height, f.avg_r, f.avg_g, f.avg_b, f.valid)
        }
      }
  }

  /** Batch decode: per-partition, amortized decoder init — the hot loop
    * touches each payload once. Input needs (doc_id LONG, media BINARY). */
  def decode(spark: SparkSession, df: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real codecs would be initialized once here, per partition
        it.map { case (id, bytes) => MediaRow(id, bytes, decodeOne(bytes)) }
      }
  }

  /** Deterministic frame sampling: pick every `stride`-th chunk of a media
    * payload (stand-in for video frame extraction; the chunking math and
    * explode shape are what a real frame sampler produces). */
  def sampleFrames(df: DataFrame, chunkSize: Int = 4096, stride: Int = 4): DataFrame =
    df.select(col("doc_id"), col("media"))
      .withColumn("n_chunks",
        ceil(length(col("media")).cast("double") / chunkSize).cast("int"))
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), greatest(col("n_chunks") - 1, lit(0))),
          i => i % stride === 0)))
      .withColumn("frame",
        expr(s"substring(media, frame_idx * $chunkSize + 1, $chunkSize)"))
      .select("doc_id", "frame_idx", "frame")

  /** Repartition media rows by payload bytes, not row count: media rows are
    * wildly variable in size, so equal-row partitions would skew executor
    * memory. Real byte bin-packing via a distributed prefix sum in
    * deterministic `idCol` order:
    *
    *   pass 1 (narrow, column-pruned aggregate): per-group byte totals →
    *     driver computes ≤P exclusive prefix offsets (scalars, not rows);
    *   pass 2: groups colocate + sort by id; each row takes bucket =
    *     (groupOffset + running) / target, then routes to its
    *     bucket-numbered partition via an identity partitioner (no hash
    *     collisions merging two buckets).
    *
    * Prefix groups are DETERMINISTIC ranges of the (numeric, unique) id
    * domain — `(id - min) div ceil(span/p)` — never sampled and never keyed
    * on physical partition ids: the input plan executes twice (offset
    * aggregate + routing pass), and anything sampled (`repartitionByRange`
    * boundaries) or physical (`spark_partition_id`, AQE coalescing) may
    * differ between those executions, silently corrupting every offset past
    * the first divergence — the exact bug class the t08 sf0.1 sweep caught
    * in sequence packing. Group membership is a pure function of the id and
    * per-group totals are order-independent aggregates, so both executions
    * agree by construction.
    *
    * Every bucket holds ≤ target + one row's bytes. Requires `idCol` to be
    * numeric and unique (ties would make the within-group order ambiguous). */
  def repartitionByBytes(df: DataFrame, targetBytesPerPartition: Long,
                         mediaCol: String = "media", idCol: String = "doc_id",
                         partitions: Int = 0): DataFrame = {
    require(targetBytesPerPartition > 0, "targetBytesPerPartition must be positive")
    val spark = df.sparkSession
    val schema = df.schema
    val nCols = schema.length
    val mediaIdx = schema.fieldIndex(mediaCol)
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    val bounds = df.agg(min(col(idCol)).cast("long"), max(col(idCol)).cast("long")).head()
    if (bounds.isNullAt(0)) return df // empty input
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val rangeSize = math.max(1L, (hi - lo + p) / p)
    val gSql = s"CAST((CAST($idCol AS BIGINT) - ${lo}L) DIV ${rangeSize}L AS INT)"
    val perGroup = df
      .select(expr(gSql).as("__g"),
        coalesce(length(col(mediaCol)).cast("long"), lit(0L)).as("len"))
      .groupBy("__g").agg(sum("len").as("bytes"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val gs = perGroup.keys.toSeq.sorted
    val offsets = gs.zip(gs.scanLeft(0L)((a, g) => a + perGroup(g)).init).toMap
    val total = perGroup.values.sum
    val nBuckets = math.max(1L, (total + targetBytesPerPartition - 1) / targetBytesPerPartition).toInt
    val bc = spark.sparkContext.broadcast(offsets)
    // groups are monotone in id and hash-colocated, so after the
    // within-partition id sort each group is one contiguous run; the
    // running byte sum re-seeds from the group's global offset at each
    // group boundary
    val base = df
      .withColumn("__g", expr(gSql))
      .repartition(p, col("__g"))
      .sortWithinPartitions(col(idCol))
    val keyed = base.rdd.mapPartitions { it =>
      var curG = Int.MinValue
      var acc = 0L
      it.map { row =>
        val g = row.getInt(nCols) // __g rides appended after the original columns
        if (g != curG) { curG = g; acc = bc.value.getOrElse(g, 0L) }
        val b = (acc / targetBytesPerPartition).toInt.min(nBuckets - 1)
        val m = row.getAs[Array[Byte]](mediaIdx)
        acc += (if (m == null) 0L else m.length.toLong)
        (b, org.apache.spark.sql.Row.fromSeq(row.toSeq.take(nCols)))
      }
    }
    val packed = keyed.partitionBy(new org.apache.spark.Partitioner {
      override def numPartitions: Int = nBuckets
      override def getPartition(key: Any): Int = key.asInstanceOf[Int]
    }).values
    spark.createDataFrame(packed, schema)
  }
}
