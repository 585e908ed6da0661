package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata (builder prompt "Multimodal columns").
  *
  * The Spark-side plumbing is real — schema, batch iteration shape,
  * partition-parallel decode. Image payloads in JDK-supported formats
  * (PNG/BMP/GIF/JPEG) decode for REAL via `javax.imageio` ([[imageDecode]]:
  * true dimensions + a luminance-histogram content feature); everything
  * else — audio, video, and image formats whose codecs aren't in this
  * container — falls back to the clearly-marked deterministic STUB
  * (`fakeDecode`). Swapping in a fuller decoder changes ONE function
  * (the `Iterator[MediaRow] => Iterator[MediaFeatures]` body), not the
  * pipeline: `mapPartitions` already gives per-partition batch processing
  * (the JVM analogue of Arrow-batched `mapInPandas`), so a native codec,
  * a JNI call, or an external model server slots into the same loop and
  * amortizes its init cost once per partition, not once per row.
  *
  * Scale posture: media blobs dominate row size, so the decode stage
  * repartitions by blob count (not bytes) only when asked; feature outputs
  * are small and shuffle freely. No collect, no driver-side loops.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      source_uri: String)

  /** Extracted features: fixed-width, shuffle-friendly. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           width: Int, height: Int, duration_ms: Long,
                           embedding: Array[Float])

  /** STUB decoder — deterministic fake standing in for the real codec.
    * Features derive from the payload hash so tests are reproducible and
    * content-sensitive (two different payloads ⇒ different features).
    */
  def fakeDecode(row: MediaRow): MediaFeatures = {
    val h = java.util.Arrays.hashCode(row.payload)
    val mix = (x: Int) => {
      var z = h + x * 0x9e3779b9
      z = (z ^ (z >>> 16)) * 0x85ebca6b
      z ^ (z >>> 13)
    }
    MediaFeatures(
      row.media_id, row.kind, row.payload.length.toLong,
      width = 16 + math.floorMod(mix(1), 4080),
      height = 16 + math.floorMod(mix(2), 2144),
      duration_ms = if (row.kind == "image") 0L else math.floorMod(mix(3).toLong, 600000L),
      embedding = Array.tabulate(8)(i => math.floorMod(mix(4 + i), 2000) / 1000.0f - 1f))
  }

  /** Decode an image payload, or None when the row isn't an image, no
    * JDK reader recognizes the bytes, or the decoder THROWS on them —
    * web-scraped corpora contain truncated/crafted payloads that make
    * ImageIO readers fail with runtime exceptions, and one bad asset
    * must degrade to "undecodable", never kill the job (catch NonFatal,
    * not just IOException).
    */
  private def readImage(row: MediaRow): Option[java.awt.image.BufferedImage] =
    if (row.kind != "image" || row.payload == null || row.payload.isEmpty) None
    else
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(row.payload)))
      catch { case scala.util.control.NonFatal(_) => None }

  /** Rec. 601 integer luminance of a packed RGB pixel. */
  private def lum(rgb: Int): Int =
    (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
      (rgb & 0xff) * 114) / 1000

  /** REAL image decode via the JDK's `javax.imageio` (PNG, BMP, GIF and
    * baseline JPEG readers ship with the JVM — no external codec needed).
    * Returns None for non-image kinds and payloads no registered reader
    * recognizes or decodes cleanly; callers fall back to the stub
    * contract for those.
    *
    * The content feature is an 8-bin normalized luminance histogram
    * (Rec. 601 integer weights, bins of 32 intensity levels): cheap,
    * deterministic, and a property of the PIXELS — the same image decodes
    * to identical features from PNG or BMP bytes, which is exactly what a
    * dedup/quality pass wants from an embedding stand-in (and the spec
    * asserts). duration_ms is 0: stills have no timeline.
    */
  def imageDecode(row: MediaRow): Option[MediaFeatures] =
    readImage(row).map { bi =>
      val w = bi.getWidth
      val h = bi.getHeight
      val hist = new Array[Long](8)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          hist(lum(bi.getRGB(x, y)) >> 5) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      MediaFeatures(row.media_id, row.kind, row.payload.length.toLong, w, h,
        duration_ms = 0L, embedding = hist.map(c => (c.toDouble / n).toFloat))
    }

  /** Decode one asset: real codec when the JDK has one, stub otherwise. */
  def decode(row: MediaRow): MediaFeatures =
    imageDecode(row).getOrElse(fakeDecode(row))

  /** Partition-parallel decode/feature-extract. The iterator shape is the
    * contract: a real implementation opens its codec once per partition
    * and streams rows through it.
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // heavier impls: init codec / model session HERE, once per partition
      rows.map(decode)
    }
  }

  /** A sampled frame: fixed-size excerpt + its position. */
  case class Frame(media_id: Long, frame_idx: Int, offset_ms: Long,
                   frame_bytes: Array[Byte])

  /** Frame sampling for video/audio payloads: emit up to `nFrames` evenly
    * spaced excerpts per asset. The STUB "frame" is a deterministic byte
    * slice at the sampled offset (a real codec seeks and decodes there
    * instead — same iterator shape, same output schema). One input row
    * fans out to ≤ nFrames small rows, so downstream per-frame work
    * (embedding, OCR, captioning) shuffles freely while the original blob
    * stays behind.
    */
  def frameSample(media: Dataset[MediaRow], nFrames: Int,
                  frameBytes: Int = 64): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { row =>
      val dur = fakeDecode(row).duration_ms
      if (dur <= 0 || row.payload.isEmpty) Iterator.empty
      else (0 until nFrames).iterator.map { i =>
        val offMs = dur * i / nFrames
        val offByte = ((row.payload.length.toLong * i) / nFrames).toInt
        val end = math.min(offByte + frameBytes, row.payload.length)
        Frame(row.media_id, i, offMs,
          java.util.Arrays.copyOfRange(row.payload, offByte, end))
      }
    }
  }

  /** Resize stub for image features: rescale the decoded width/height to
    * fit `maxSide` preserving aspect ratio (a real impl resamples pixels;
    * the geometry arithmetic and schema are the real contract).
    */
  def resizeFeatures(features: Dataset[MediaFeatures], maxSide: Int): Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    features.map { f =>
      val side = math.max(f.width, f.height)
      if (side <= maxSide) f
      else {
        val scale = maxSide.toDouble / side
        f.copy(width = math.max(1, math.round(f.width * scale).toInt),
          height = math.max(1, math.round(f.height * scale).toInt))
      }
    }
  }

  /** 64-bit difference-hash (dHash) perceptual fingerprint — the standard
    * image-dedup signature (two visually near-identical images differ in
    * a few bits regardless of container, resize, or mild recompression).
    * Pixels block-average onto a 9×8 luminance grid; bit (row, col) is set
    * when the cell's average is STRICTLY brighter than its right
    * neighbor's. All arithmetic is integer (Rec. 601 luminance, and the
    * average comparison cross-multiplies sums by counts instead of
    * dividing), so the hash is bit-deterministic. None for non-images and
    * payloads that don't decode — [[readImage]]'s contract, shared with
    * [[imageDecode]].
    */
  def dHash(row: MediaRow): Option[Long] =
    readImage(row).map { bi =>
        val w = bi.getWidth
        val h = bi.getHeight
        val sum = Array.ofDim[Long](8, 9)
        val cnt = Array.ofDim[Long](8, 9)
        var y = 0
        while (y < h) {
          val gy = (y.toLong * 8 / h).toInt
          var x = 0
          while (x < w) {
            val gx = (x.toLong * 9 / w).toInt
            sum(gy)(gx) += lum(bi.getRGB(x, y))
            cnt(gy)(gx) += 1
            x += 1
          }
          y += 1
        }
        var bits = 0L
        var i = 0
        while (i < 8) {
          var j = 0
          while (j < 8) {
            // avg(i,j) > avg(i,j+1) without division: cross-multiply
            // (empty cells — images narrower than the grid — count as 0)
            if (sum(i)(j) * cnt(i)(j + 1) > sum(i)(j + 1) * cnt(i)(j))
              bits |= 1L << (i * 8 + j)
            j += 1
          }
          i += 1
        }
        bits
    }

  /** Per-asset perceptual-hash table: (media_id, phash) for every payload
    * the JDK can decode. Partition-parallel map work (the decode is the
    * cost — same repartition guidance as [[decodeFeatures]]).
    */
  def perceptualHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // heavier impls: init codec once per partition, as in decodeFeatures
      rows.flatMap(r => dHash(r).map(h => (r.media_id, h)))
    }.toDF("media_id", "phash")
  }

  /** Perceptual near-duplicate image pairs — the multimodal dedup stage:
    * band the 64-bit dHash (16-bit bands by default), equi-join on
    * (band_idx, band_val), verify with the exact Hamming distance
    * (codegen'd xor + bit_count). LOSSLESS when `maxHamming < bands`
    * (pigeonhole: ≤ maxHamming flipped bits cannot touch every band);
    * beyond that it is the simhashPairs probabilistic trade. Same
    * scale shape as the text dedups: banded bucket equi-joins with
    * shuffle_hash hints, never an all-pairs scan.
    *
    * `maxBucketSize` is the skew cap this operator NEEDS at crawl scale
    * (the Dedup.nearDupPairs lever): dHash of any uniform or
    * near-uniform image is exactly 0L (no cell strictly brighter than
    * its right neighbor), so every blank frame, tracking pixel, and
    * solid-color logo — the web's most duplicated image class — lands
    * in the SAME (band_idx, 0) bucket of all four bands and a capless
    * join goes quadratic on exactly that class. Buckets over the cap
    * are DROPPED: their members are boilerplate clusters (report them
    * from the phash table with a plain groupBy, don't pair them), and
    * losslessness then holds only for pairs whose shared under-cap
    * bands cover < maxHamming flips — the documented cap trade. The
    * default keeps every bucket (exact banding semantics, what the spec
    * pins on organic fixtures).
    *
    * The decoded phash table is `cache()`d AND eagerly materialized
    * (one count() inside this call) — the returned plan reads it three
    * times (band table + both verify sides), and lazily-racing first
    * reads could each pay the decode before any of them populates the
    * cache. As with editDistanceJoinAuto's prefix cache, the caller's
    * session owns the lifetime: release with
    * `graft.CacheScope.release(spark)` (or `spark.catalog.clearCache()`)
    * between corpora, or persist (media_id, phash) as a real table —
    * the actual 100 TB deployment shape — and dedup that instead.
    *
    * Output: (media_a, media_b, hamming), media_a < media_b.
    */
  def imageNearDup(media: Dataset[MediaRow], maxHamming: Int = 3,
                   bands: Int = 4,
                   maxBucketSize: Long = Long.MaxValue): DataFrame = {
    require(bands >= 1 && 64 % bands == 0, s"64 bits not divisible by $bands bands")
    val fps = graft.CacheScope.pin(perceptualHashes(media))
    fps.count() // eager: decode exactly once, before concurrent readers race
    val bandTable = capBands(phashBands(fps, bands), maxBucketSize)
    val a = bandTable.select(col("band_idx"), col("band_val"), col("media_id").as("media_a"))
    val b = bandTable.select(col("band_idx"), col("band_val"), col("media_id").as("media_b"))
    a.join(b.hint("shuffle_hash"), Seq("band_idx", "band_val"))
      .filter(col("media_a") < col("media_b"))
      .select("media_a", "media_b")
      .distinct()
      .join(fps.toDF("media_a", "fp_a").hint("shuffle_hash"), "media_a")
      .join(fps.toDF("media_b", "fp_b").hint("shuffle_hash"), "media_b")
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("media_a", "media_b", "hamming")
  }

  /** Banded (media_id, band_idx, band_val) rows of a phash table —
    * shared by the self-join and incremental forms.
    */
  private def phashBands(fps: DataFrame, bands: Int): DataFrame = {
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val bandCols = (0 until bands).map { j =>
      shiftright(col("phash"), j * width).bitwiseAND(lit(mask))
    }
    fps.select(col("media_id"),
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")))
  }

  /** The (band_idx, band_val) buckets `maxBucketSize` would DROP from a
    * phash table, with their member counts — the cap's observable side.
    * Under a cap, [[imageNearDupAgainst]] misses a pair in EVERY band
    * when the pair's minimum matching band was capped out (emission keys
    * on the minimum MATCHING band), and [[imageNearDup]] loses the
    * capped bands' pigeonhole coverage — both silently at runtime. This
    * census (one combinable aggregate over the band table, the
    * [[graft.ops.Similarity.embedNearDupAudit]] shape) makes the loss
    * measurable BEFORE trusting a capped run: every returned row is a
    * bucket whose members pair through other bands or not at all, and a
    * bucket barely over the cap is the signal the cap is sized into the
    * organic population instead of above the boilerplate crowd.
    *
    * Output: (band_idx, band_val, bucket_n), bucket_n > maxBucketSize.
    */
  def imageBandCapAudit(corpusHashes: DataFrame, maxBucketSize: Long,
                        bands: Int = 4): DataFrame = {
    require(bands >= 1 && 64 % bands == 0,
      s"64 bits not divisible by $bands bands")
    phashBands(corpusHashes, bands)
      .groupBy("band_idx", "band_val").agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucketSize)
  }

  /** The uniform-image skew cap: drop (band_idx, band_val) buckets with
    * more than `cap` members — shared by the self-join and incremental
    * forms (Dedup.capBuckets' shape).
    */
  private def capBands(bandTable: DataFrame, cap: Long): DataFrame =
    if (cap == Long.MaxValue) bandTable
    else {
      val wBucket = org.apache.spark.sql.expressions.Window
        .partitionBy("band_idx", "band_val")
      bandTable
        .withColumn("bucket_n", count(lit(1)).over(wBucket))
        .filter(col("bucket_n") <= cap)
        .select("media_id", "band_idx", "band_val")
    }

  /** Asymmetric perceptual dedup — the recurring-crawl form of
    * [[imageNearDup]] (the [[graft.ops.text.Dedup.nearDupAgainst]]
    * shape): flag INCOMING images that near-duplicate an EXISTING
    * fingerprint table, without re-pairing the corpus against itself.
    * `corpusHashes` is a persisted (media_id, phash) table — the real
    * deployment decodes once and keeps exactly this; today's crawl
    * decodes only its own payloads. Same banding, same exact Hamming
    * verify, same pigeonhole losslessness below the band count; the
    * `maxBucketSize` cap applies to CORPUS buckets (where the
    * uniform-image class accumulates — incoming batches are crawl-sized).
    *
    * Exactly-once pairs WITHOUT a distinct or any stateful operator: a
    * pair colliding in several bands would join once per band, so each
    * row emits only when its band is the pair's MINIMUM fully-matching
    * band — derivable from fp_inc XOR fp_corp as a pure when-chain, the
    * streaming text twin's min-band rule reduced to an expression. That
    * makes the whole operator a stateless map + two equi-joins, so the
    * SAME call runs on a STREAMING Dataset of media rows (stream-static
    * join; StreamingSpec proves stream ≡ batch) — the ingest-time image
    * dedup gate. Shared caveat with the streaming text twin: under a
    * cap, a pair whose minimum matching band was capped out is missed
    * in every band (emission keys on the minimum MATCHING band) — size
    * the cap well above boilerplate crowds, and measure what a cap
    * actually drops with [[imageBandCapAudit]] (the capped buckets and
    * their member counts) instead of trusting it blind.
    *
    * Output: (media_inc, media_corp, hamming).
    */
  def imageNearDupAgainst(incoming: Dataset[MediaRow], corpusHashes: DataFrame,
                          maxHamming: Int = 3, bands: Int = 4,
                          maxBucketSize: Long = Long.MaxValue): DataFrame = {
    require(bands >= 1 && 64 % bands == 0, s"64 bits not divisible by $bands bands")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val fpsI = perceptualHashes(incoming)
    val bandsC = capBands(phashBands(corpusHashes, bands), maxBucketSize)
    val bandCols = (0 until bands).map { j =>
      shiftright(col("phash"), j * width).bitwiseAND(lit(mask))
    }
    val joined = fpsI
      .select(col("media_id").as("media_inc"), col("phash").as("fp_inc"),
        posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")))
      .join(bandsC.select(col("band_idx"), col("band_val"),
        col("media_id").as("media_corp")), Seq("band_idx", "band_val"))
      .join(corpusHashes.select(col("media_id").as("media_corp"),
        col("phash").as("fp_corp")), "media_corp")
    val xorc = col("fp_inc").bitwiseXOR(col("fp_corp"))
    // the pair's lowest fully-matching band: when-chain, lowest j wins
    val minBand = (0 until bands).foldRight(lit(-1): Column) { (j, rest) =>
      when(shiftright(xorc, j * width).bitwiseAND(lit(mask)) === 0, lit(j))
        .otherwise(rest)
    }
    joined
      .withColumn("hamming", bit_count(xorc).cast("int"))
      .filter(col("hamming") <= maxHamming && col("band_idx") === minBand)
      .select("media_inc", "media_corp", "hamming")
  }

  /** Build-and-commit the (media_id, phash) fingerprint table as a
    * versioned Manifest snapshot — the persisted corpus side every
    * [[imageNearDupAgainst]] probe reads (decode once, serve forever:
    * the real deployment never re-decodes the corpus). Returns the
    * version. The containmentIndex refresh idiom at the image family.
    */
  def phashRefresh(media: Dataset[MediaRow], table: String): Int =
    graft.io.Manifest.write(perceptualHashes(media), table)

  /** Registry MAINTENANCE — decode an ACCEPTED batch's payloads and
    * union their fingerprints into the committed phash table
    * (Dedup.containmentIndexUpdate's contract: per-media rows, so
    * union IS the merge; `tag` carries the streaming batchId for
    * replay-idempotent commits). Returns the new version.
    */
  def phashUpdate(table: String, media: Dataset[MediaRow],
                  tag: Option[String] = None): Int = {
    val spark = media.sparkSession
    val next = graft.io.Manifest.read(spark, table)
      .unionByName(perceptualHashes(media))
    tag match {
      case Some(t) => graft.io.Manifest.writeTagged(next, table, t)
      case None    => graft.io.Manifest.write(next, table)
    }
  }

  /** Registry DELETE — [[phashUpdate]]'s inverse: drop removed media ids
    * and commit (rows are per-media, so an id anti-join IS the exact
    * retraction — the containmentIndexRetract contract). Returns the
    * new version.
    */
  def phashRetract(table: String, removedIds: DataFrame): Int = {
    val spark = removedIds.sparkSession
    graft.io.Manifest.write(
      graft.io.Manifest.read(spark, table)
        .join(broadcast(removedIds.select(col("media_id"))),
          Seq("media_id"), "left_anti")
        .select("media_id", "phash"),
      table)
  }

  /** Column-level metadata pass (no decode): cheap stats that should NOT
    * pay the decode cost — pure codegen'd expressions over the binary.
    */
  def payloadStats(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      length(col("payload")).as("n_bytes"),
      sha2(col("payload"), 256).as("content_sha256"))

  /** Synthesize a media table from the documents fixture (UTF-8 payloads):
    * gives the multimodal path a deterministic, driver-data-derived input.
    */
  def mediaFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      concat(lit("synthetic://doc/"), col("doc_id")).as("source_uri"))
      .as[MediaRow]
  }
}
