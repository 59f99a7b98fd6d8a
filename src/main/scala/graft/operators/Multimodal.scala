package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque binary columns
  * with typed metadata (north-star requirement).
  *
  * The Spark-side plumbing — schema, batched per-partition decode,
  * partition sizing — is real, and `decodeBatch` now carries a REAL image
  * codec: content that is not in the synthetic GMM1 format is handed to
  * `javax.imageio` (PNG/BMP/GIF/JPEG — the readers every JDK ships),
  * decoded to pixels, and summarized as (width, height, pixel checksum).
  * The deterministic GMM1 fake remains the oracle-gated path for the
  * synthetic corpus (DuckDB can replay its header arithmetic; it cannot
  * decode PNGs), and the seam is still the single replacement point for
  * heavier codecs (ffmpeg/JNI, or `mapInArrow` to a Python codec) —
  * nothing upstream changes.
  *
  * Fake wire format (deterministic, self-describing):
  *   bytes 0-3   magic "GMM1"
  *   bytes 4-7   width  (int32 BE)
  *   bytes 8-11  height (int32 BE)
  *   bytes 12+   payload
  */
object Multimodal {

  val MediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_bytes", LongType, nullable = false)))

  val Magic: Array[Byte] = "GMM1".getBytes("US-ASCII")

  /** Deterministic fake encoder (test/bench stand-in for real media). */
  def syntheticContent(width: Column, height: Column, payload: Column): Column =
    concat(
      lit(Magic),
      intBe(width),
      intBe(height),
      payload.cast("binary"))

  private def intBe(c: Column): Column =
    unhex(lpad(hex(c.cast("int")), 8, "0"))

  /** Header-only metadata extraction as pure column ops (codegen'd, no
    * decode of the payload bytes — the cheap path for filtering/routing
    * before any expensive codec work). */
  def extractMeta(content: Column, kind: String): Column =
    struct(
      lit(kind).as("kind"),
      // hex ONLY the 4 header bytes: hex(content) materialized a string
      // 2x the whole blob per expression just to read 8 chars — a
      // 100 MB video paid ~400 MB of hex strings on the path that
      // exists to be the cheap pre-codec filter
      conv(hex(substring(content, 5, 4)), 16, 10).cast("int").as("width"),
      conv(hex(substring(content, 9, 4)), 16, 10).cast("int").as("height"),
      length(content).cast("long").as("n_bytes"))

  /** Batched per-partition decode — the real-codec integration seam.
    *
    * Iterates each partition in `batchSize` groups (the shape a vectorized
    * codec wants: one native call per batch, not per row). The stub
    * "decode" parses the fake header and summarizes the payload; a real
    * deployment replaces only `decodeBatch`.
    *
    * Runs as `Dataset.mapPartitions` with a row encoder — a MapPartitions
    * node inside the Dataset plan, not a `df.rdd` detour: no lineage break
    * to an ExistingRDD scan, upstream pushdown/pruning stay intact, and
    * Tungsten serialization is applied once by the encoder instead of a
    * GenericRow round trip per row. (`mapInArrow` is the equivalent seam
    * when the codec lives in Python.)
    */
  def decodePartitioned(
      df: DataFrame,
      contentCol: String,
      batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields ++ Array(
      StructField("decoded_width", IntegerType, nullable = true),
      StructField("decoded_height", IntegerType, nullable = true),
      StructField("payload_checksum", LongType, nullable = true)))
    val contentIx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val decoded = decodeBatch(batch.map(_.getAs[Array[Byte]](contentIx)))
        batch.lazyZip(decoded).map { case (row, d) =>
          Row.fromSeq(row.toSeq ++ Seq(d._1, d._2, d._3))
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Batch decoder — one call per batch. GMM1 content takes the
    * deterministic synthetic path (header dims + payload byte sum — the
    * arithmetic the SQL oracle replays); anything else goes through the
    * real `javax.imageio` codec. Unreadable/garbage bytes yield nulls, so
    * a corrupt object in a 100 TB media column poisons its row, not the
    * task. */
  private def decodeBatch(contents: Seq[Array[Byte]]): Seq[(Integer, Integer, java.lang.Long)] =
    contents.map { c =>
      if (c == null || c.length < 12) (null, null, null)
      else if (c.startsWith(Magic)) {
        def be(off: Int): Int =
          ((c(off) & 0xff) << 24) | ((c(off + 1) & 0xff) << 16) |
            ((c(off + 2) & 0xff) << 8) | (c(off + 3) & 0xff)
        var sum = 0L
        var i = 12
        while (i < c.length) { sum += (c(i) & 0xff); i += 1 }
        (Integer.valueOf(be(4)), Integer.valueOf(be(8)), java.lang.Long.valueOf(sum))
      } else decodeImage(c)
    }

  /** Real image decode via the JDK's ImageIO readers (PNG/BMP/GIF/JPEG).
    * Returns (width, height, checksum) where the checksum sums every
    * pixel's 32-bit ARGB value — a deterministic whole-image digest
    * independent of the source encoding (the same pixels as PNG and BMP
    * checksum identically). In-memory only: the ImageIO disk cache is
    * disabled once per executor so decode never touches local temp files.
    *
    * Decompression-bomb guard: the header's DECLARED dimensions are read
    * first (no pixel decode) and images above [[MaxDecodePixels]] are
    * rejected to a null row — a crafted 50000×50000 PNG would otherwise
    * allocate a ~10 GB raster inside `ImageIO.read` and throw an
    * uncatchable-in-good-conscience OutOfMemoryError at the task, not a
    * poisoned row. Pixels are fetched with one bulk `getRGB` call (one
    * ColorModel conversion pass), not per-pixel virtual calls.
    */
  val MaxDecodePixels: Long = 64L * 1024 * 1024 // 64 MP ≈ 256 MB ARGB

  /** Byte bound on the decoded raster. The pixel cap alone under-counts
    * deep formats: a 64 MP 16-bit-per-sample RGBA image allocates ~512 MB
    * inside `reader.read(0)` — twice the ARGB estimate — before any
    * post-decode check could run, so the declared dimensions are also
    * multiplied by the reader's declared bits-per-pixel (the widest of
    * its supported image types, conservatively) and bounded here. */
  val MaxDecodeBytes: Long = 256L * 1024 * 1024

  private lazy val imageIoNoDiskCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  private def decodeImage(c: Array[Byte]): (Integer, Integer, java.lang.Long) =
    try {
      imageIoNoDiskCache
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(c))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) (null, null, null)
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val w = reader.getWidth(0)
            val h = reader.getHeight(0)
            // widest declared bits-per-pixel across the reader's image
            // types (metadata only — no pixel decode); default ARGB=32
            // when the reader declares nothing usable
            val bitsPerPixel = try {
              val it = reader.getImageTypes(0)
              var bits = 32
              while (it.hasNext) {
                val cm = it.next().getColorModel
                if (cm != null) bits = math.max(bits, cm.getPixelSize)
              }
              bits
            } catch { case _: Exception => 32 }
            if (w <= 0 || h <= 0 || w.toLong * h.toLong > MaxDecodePixels ||
                w.toLong * h.toLong * bitsPerPixel / 8L > MaxDecodeBytes)
              (null, null, null)
            else {
              val img = reader.read(0)
              // row-strip reads into one reused buffer: bulk ColorModel
              // conversion per row without the int[w*h] second copy a
              // whole-image getRGB would allocate (~256 MB at the cap —
              // enough to reintroduce the OOM the guard exists to stop)
              val buf = new Array[Int](w)
              var sum = 0L
              var y = 0
              while (y < h) {
                img.getRGB(0, y, w, 1, buf, 0, w)
                var x = 0
                while (x < w) { sum += buf(x) & 0xffffffffL; x += 1 }
                y += 1
              }
              (Integer.valueOf(w), Integer.valueOf(h), java.lang.Long.valueOf(sum))
            }
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => (null, null, null) }

  /** Frame sampling stub: slice the payload into `n` equal byte ranges
    * (stand-in for video frame extraction; pure column ops). */
  def frameSlices(content: Column, n: Int): Column = {
    val payloadLen = length(content) - 12
    array((0 until n).map { i =>
      substr(content, lit(13) + ((payloadLen * lit(i)) / lit(n)).cast("int"),
        (payloadLen / lit(n)).cast("int"))
    }: _*)
  }

  /** Resize stub: rewrite the header to the new dimensions and crop the
    * payload to the width ratio (stand-in for a real scaler — the header
    * rewrite and proportional byte budget are the plumbing a codec swap
    * keeps). */
  def resizeStub(content: Column, newWidth: Column, newHeight: Column): Column = {
    val oldWidth = conv(hex(substring(content, 5, 4)), 16, 10).cast("int")
    val payloadLen = length(content) - 12
    val keep = greatest(lit(1),
      ((payloadLen * newWidth) / greatest(oldWidth, lit(1))).cast("int"))
    syntheticContent(newWidth, newHeight, substr(content, lit(13), keep))
  }

  /** Feature extraction through the batched decode seam: per-content
    * code-point histogram (`codePoint % bins`) over the payload, appended
    * as a `hist: array<long>` column. Same batch shape as
    * `decodePartitioned` — a real deployment swaps the histogram for a
    * vision/audio model call over the same batches. Payload is assumed
    * UTF-8 text for the stub (the synthetic corpus is ASCII, so
    * bytes == code points and a SQL oracle can replicate it exactly).
    */
  def byteHistogram(
      df: DataFrame,
      contentCol: String,
      bins: Int = 16,
      batchSize: Int = 64): DataFrame = {
    // validated HERE, not per row: cp % 0 would throw inside
    // mapPartitions and kill the task after 4 retries, violating the
    // module's bad-input-poisons-its-row discipline
    require(bins >= 1, s"bins must be positive, got $bins")
    require(batchSize >= 1, s"batchSize must be positive, got $batchSize")
    val schema = StructType(df.schema.fields :+
      StructField("hist", ArrayType(LongType, containsNull = false), nullable = true))
    val contentIx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val hists = batch.map { row =>
          val c = row.getAs[Array[Byte]](contentIx)
          if (c == null || c.length < 12 || !c.startsWith(Magic)) null
          else {
            val h = new Array[Long](bins)
            new String(c, 12, c.length - 12, "UTF-8").codePoints()
              .forEach(cp => h(cp % bins) += 1L)
            h.toSeq
          }
        }
        batch.lazyZip(hists).map { case (row, h) => Row.fromSeq(row.toSeq :+ h) }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
