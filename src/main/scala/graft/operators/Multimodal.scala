package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by per-partition batch operators.
  *
  * The Spark-side contract is real and tested — schema, partitioning, batch
  * shape, feature output — while decoding goes through the [[Multimodal.MediaCodec]]
  * seam: the default is a clearly-marked STUB (the container has no
  * image/audio libraries), and [[Multimodal.DeflateCodec]] proves the same
  * mapPartitions boundary carries REAL encoded bytes (a genuine
  * inflate-then-featurize, tested in MultimodalSpec). Swapping in ffmpeg /
  * javax.imageio changes one object and nothing about the plan.
  *
  * Scale notes:
  *  - Media rows are big (MBs); `repartitionByBytes` targets a bounded
  *    per-task byte budget so executor memory survives 100 TB of media —
  *    row-count-based partitioning would OOM on skewed blob sizes.
  *  - Feature extraction is `mapPartitions` (the Scala analogue of a
  *    batched pandas UDF): per-partition setup (codec init) is amortized
  *    across the partition's rows, and the output is columnar-friendly
  *    fixed-width features.
  *  - No driver collection anywhere; everything stays a Dataset.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (parquet-friendly). */
  final case class Media(
      media_id: Long,
      kind: String,          // "image" | "audio" | "video"
      payload: Array[Byte],  // opaque encoded bytes
      width: Int, height: Int, duration_ms: Long, format: String)

  /** Extracted features: fixed-width, columnar-friendly. */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      byte_mean: Double, byte_histogram: Array[Long], frames_sampled: Int)

  /** The swappable codec seam: decode + frame-sampling behind one
    * serializable interface so a real media library slots in without
    * touching the plan (schema, partitioning, mapPartitions batch shape
    * are codec-independent). `init()` runs once per PARTITION — the
    * amortized setup hook a real codec needs (context allocation, native
    * lib load); per-row work goes through `decode`/`frames`.
    */
  trait MediaCodec extends Serializable {
    /** Once-per-partition setup (codec contexts, native libs). */
    def init(): Unit = ()
    /** payload → the DECODED content bytes (pixel/sample buffer). Called
      * ONCE per row — every feature (stats, frame sampling) derives from
      * this single decode, so a real codec never pays the decompression
      * twice per row.
      */
    def decode(payload: Array[Byte]): Array[Byte]
  }

  private[operators] def byteStats(bytes: Array[Byte]): (Double, Array[Long]) = {
    val hist = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      hist(b / 16) += 1
      sum += b
      i += 1
    }
    val mean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
    (mean, hist)
  }

  /** STUB codec (the default) — deterministic fake decode: treats the raw
    * payload bytes AS the decoded content (no media libraries in this
    * container). Everything around it — schema, partitioning, batch
    * shape — is production-real.
    */
  object StubCodec extends MediaCodec {
    def decode(payload: Array[Byte]): Array[Byte] = payload
  }

  /** A REAL codec through the same seam — DEFLATE (java.util.zip, in every
    * JVM) standing in for a media format: payloads are genuine compressed
    * streams, `decode` actually INFLATES them and computes stats over the
    * decompressed content, and frame sampling runs on decoded length. The
    * features can only match the plaintext's if decompression really ran,
    * which is what MultimodalSpec's non-stub test proves: the seam carries
    * real encoded bytes end-to-end, so an ffmpeg/imageio-backed MediaCodec
    * is a drop-in.
    */
  object DeflateCodec extends MediaCodec {
    def encode(raw: Array[Byte]): Array[Byte] = {
      // try/finally around end(): Deflater holds a NATIVE zlib context that
      // GC finalization releases only eventually — on an exception path a
      // long-lived executor would leak native memory per failed row.
      val deflater = new java.util.zip.Deflater()
      try {
        deflater.setInput(raw); deflater.finish()
        val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
        val buf = new Array[Byte](4096)
        while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
        out.toByteArray
      } finally deflater.end()
    }
    def decode(payload: Array[Byte]): Array[Byte] = {
      // try/finally: the malformed-payload throws below are DELIBERATE exit
      // paths, and each one would otherwise strand the Inflater's native
      // zlib context until finalization (advice r07).
      val inflater = new java.util.zip.Inflater()
      try {
        inflater.setInput(payload)
        val out = new java.io.ByteArrayOutputStream(payload.length * 2 + 64)
        val buf = new Array[Byte](4096)
        while (!inflater.finished()) {
          val n = inflater.inflate(buf)
          // ANY zero-progress stall must fail loudly, not spin: truncated
          // input (needsInput) and FDICT preset-dictionary streams
          // (needsDictionary — inflate returns 0 with finished()==false and
          // needsInput()==false, an infinite loop if only needsInput is
          // checked) are both malformed for this format.
          if (n == 0 && !inflater.finished())
            throw new java.util.zip.DataFormatException(
              if (inflater.needsDictionary()) "preset-dictionary DEFLATE stream unsupported"
              else "truncated DEFLATE payload")
          out.write(buf, 0, n)
        }
        out.toByteArray
      } finally inflater.end()
    }
  }

  /** Deterministic fake decode (the stub codec's body — kept as a named
    * function because m03/m06's chunk math and several specs call it
    * directly).
    */
  def fakeDecode(payload: Array[Byte]): (Double, Array[Long]) =
    byteStats(payload)

  /** STUB — frame sampling: every `stride`-th 1 KiB chunk counts as one
    * sampled "frame". Real impl: demux + keyframe selection.
    */
  def sampleFrames(payload: Array[Byte], stride: Int): Int = {
    val chunks = (payload.length + 1023) / 1024
    (chunks + stride - 1) / stride
  }

  /** Repartition so each task sees roughly `targetBytes` of payload —
    * blob-size-aware partitioning (row counts lie when blobs are skewed).
    */
  def repartitionByBytes(media: Dataset[Media], totalBytes: Long,
                         targetBytes: Long = 128L << 20): Dataset[Media] = {
    val parts = math.max(1, (totalBytes / targetBytes).toInt)
    media.repartition(parts)
  }

  /** Batched feature extraction — the mapPartitions analogue of a pandas
    * UDF: per-partition codec setup, then row-at-a-time decode into
    * fixed-width features.
    */
  def extractFeatures(media: Dataset[Media], frameStride: Int = 4,
                      codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      codec.init() // once per partition — amortized codec setup
      rows.map { m =>
        val decoded = codec.decode(m.payload) // ONE decode per row
        val (mean, hist) = byteStats(decoded)
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong,
          mean, hist, sampleFrames(decoded, frameStride))
      }
    }
  }

  /** "Resize" as a metadata transform (the stub keeps payload opaque; a
    * real impl re-encodes). Demonstrates typed metadata evolution.
    */
  def resizeMeta(media: Dataset[Media], maxDim: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.width <= maxDim && m.height <= maxDim) m
      else {
        val scale = maxDim.toDouble / math.max(m.width, m.height)
        m.copy(width = (m.width * scale).toInt, height = (m.height * scale).toInt)
      }
    }
  }

  /** Deterministic fixture: fake media payloads derived from the documents
    * table (text bytes as the opaque payload) — exercises the full pipeline
    * without any codec dependency.
    */
  def fixtureFromDocuments(spark: SparkSession, sfDir: String): Dataset[Media] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        Media(id, kind, text.getBytes("UTF-8"),
          width = (nChars % 640).toInt + 16, height = (nChars % 480).toInt + 16,
          duration_ms = nChars * 10, format = "fake")
      }
  }

  /** m01 queries() entry: feature-extraction over the documents-derived
    * fixture; rows-only check (binary decode is not SQL-expressible — the
    * stub IS the spec, covered by MultimodalSpec golden tests).
    */
  def m01MultimodalFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    extractFeatures(fixtureFromDocuments(s, d))
      .select(col("media_id"), col("kind"), col("n_bytes"),
              col("frames_sampled"))
      .orderBy("media_id")
  }

  /** m02: per-frame explode — one row per SAMPLED frame (every 4th 1 KiB
    * chunk), with the frame's byte span: the fan-out shape a video pipeline
    * uses to parallelize per-frame feature extraction downstream. The
    * typed flatMap is the Dataset generator surface over binary payloads;
    * byte accounting is exact, so the oracle is real SQL.
    */
  /** Chunk size for m03's content-defined dedup (bytes). */
  val DedupChunkBytes = 256

  /** m03: media near-dup via chunk hashing — the storage-dedup shape for
    * binary columns: split each payload into fixed 256-byte chunks, hash
    * every chunk (md5 IN CODEGEN over the binary slice — the hash, not the
    * media bytes, is what shuffles), and report media pairs sharing ≥ 1
    * chunk with the shared-count evidence. This is t14's cross-doc
    * recurrence contract transplanted to the binary column: both shuffles
    * key on the uniform hash, pair fan-out is bounded by real content
    * overlap (never all-pairs). A real deployment hashes content-defined
    * (rolling-hash) boundaries after decode; the fixed-boundary chunking
    * here is the documented stub — the plumbing (binary slicing, hash
    * shuffle, pair join) is production-real.
    *
    * Oracle note: fixture payloads are the documents' UTF-8 bytes and the
    * corpus is pure ASCII — asserted by MultimodalSpec ("m03 oracle
    * precondition") over every generated SF dir — so DuckDB's VARCHAR
    * `substr` slices the same bytes Spark's binary `substring` does — no
    * BLOB substring exists in DuckDB.
    */
  def m03ChunkDedup(s: SparkSession, d: String): DataFrame = {
    val chunks = fixtureFromDocuments(s, d).toDF()
      .select(col("media_id"), col("payload"))
      .withColumn("p", explode(expr(s"sequence(1, length(payload), $DedupChunkBytes)")))
      .select(col("media_id"),
              md5(expr(s"substring(payload, p, $DedupChunkBytes)")).as("h"))
      .distinct() // a chunk repeated WITHIN one file counts once
    val a = chunks.toDF("m1", "h")
    val b = chunks.toDF("m2", "h")
    a.join(b, "h").filter(col("m1") < col("m2"))
      .groupBy("m1", "m2").agg(count(lit(1)).as("n_shared"))
      .orderBy("m1", "m2")
  }

  /** m07: chunk-store TIERING report — the capacity-planning view a
    * content-addressable media store derives from m03/m05's chunk table:
    * each chunk slot is HOT if its content hash appears in ≥ 2 media
    * (stored once, amortized across referrers — the dedup win) or COLD
    * (unique to its file), and each media file reports its slot count
    * plus hot/cold byte split — the numbers that size the shared-chunk
    * cache tier vs the per-file archive tier, and that show per file how
    * much of it is "common material".
    *
    * Scale shapes: m03's footprint exactly — chunk hashes shuffle (one
    * partial-agg distinct + groupBy over the uniform md5 key), payload
    * bytes never do; popularity joins back hash-to-hash; the per-media
    * rollup is a map-side-combinable groupBy on media_id.
    */
  def m07TierReport(s: SparkSession, d: String): DataFrame = {
    val slots = fixtureFromDocuments(s, d).toDF()
      .select(col("media_id"), col("payload"))
      .withColumn("p", explode(expr(s"sequence(1, length(payload), $DedupChunkBytes)")))
      .select(col("media_id"),
              md5(expr(s"substring(payload, p, $DedupChunkBytes)")).as("h"),
              expr(s"least(length(payload) - p + 1, $DedupChunkBytes)").as("nb"))
    val pop = slots.select(col("media_id"), col("h")).distinct()
      .groupBy("h").agg(count(lit(1)).as("dm"))
    slots.join(pop, "h")
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_chunks"),
           sum(when(col("dm") >= 2, 1L).otherwise(0L)).as("n_hot_chunks"),
           sum(when(col("dm") >= 2, col("nb").cast("long")).otherwise(0L)).as("hot_bytes"),
           sum(when(col("dm") < 2, col("nb").cast("long")).otherwise(0L)).as("cold_bytes"))
      .orderBy("media_id")
  }

  /** m08: delta-sync (re-crawl) report — the rsync/CAS economics of a
    * re-ingested media batch against the existing chunk store: every 5th
    * media file arrives MODIFIED (a deterministic byte suffix — the t15
    * discipline: the planted delta is the pinned input, the sync math is
    * the operator), its fixed-grid chunks are hashed and probed against
    * the base store's distinct chunk-hash set, and the report says per
    * file how many chunks REUSE existing storage vs how many (and how
    * many bytes) must actually upload. With a fixed grid an append-only
    * edit re-uploads just the tail — the quantified version of m05's
    * "locally-edited file re-uses every untouched chunk" claim. (A
    * mid-file INSERT would shift every later grid boundary and re-upload
    * the rest — the failure mode m04's content-defined chunking exists to
    * avoid; m08 pins the grid's happy path.)
    *
    * Scale shapes: m03's footprint — only chunk hashes shuffle; the base
    * store probe is one equi-join on the uniform md5 key (at 100 TB: the
    * written chunk index); per-media rollup is map-side combinable.
    */
  def m08DeltaSync(s: SparkSession, d: String): DataFrame = {
    val base = fixtureFromDocuments(s, d).toDF().select("media_id", "payload")
    val mod = base.filter(col("media_id") % 5 === 0)
      .withColumn("payload", concat(col("payload"),
        expr("cast(concat(' updated rev ', cast(media_id as string)) as binary)")))
    def chunks(df: DataFrame): DataFrame = df
      .withColumn("p", explode(expr(s"sequence(1, length(payload), $DedupChunkBytes)")))
      .select(col("media_id"),
              md5(expr(s"substring(payload, p, $DedupChunkBytes)")).as("h"),
              expr(s"least(length(payload) - p + 1, $DedupChunkBytes)").as("nb"))
    val store = chunks(base).select(col("h").as("bh")).distinct()
    chunks(mod).join(store, col("h") === col("bh"), "left")
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_chunks"),
           sum(when(col("bh").isNotNull, 1L).otherwise(0L)).as("n_reused"),
           sum(when(col("bh").isNull, 1L).otherwise(0L)).as("n_new"),
           sum(when(col("bh").isNull, col("nb").cast("long")).otherwise(0L))
             .as("bytes_upload"))
      .orderBy("media_id")
  }

  /** m05: content-addressable media MANIFEST — per media the ordered
    * chain of fixed-grid chunk hashes folded into one 56-bit manifest
    * fingerprint (hash of the concatenated chunk-md5 hex strings in
    * position order), plus chunk/byte totals. This is the dataset-
    * versioning primitive chunk stores pair with m03/m04: the manifest
    * names the FILE by content, the chunk hashes name its pieces, so a
    * re-crawled byte-identical file dedupes at the manifest level and a
    * locally-edited one re-uses every untouched chunk.
    *
    * Scale shape: per-media groupBy over chunk rows (map-side combinable
    * counts/sums; the ordered fold materializes one ≈(len/chunk)·32-char
    * string per media inside its row — bounded by media size, no
    * cross-row state). Only chunk hashes shuffle, never payload bytes —
    * m03's footprint.
    */
  def m05Manifest(s: SparkSession, d: String): DataFrame =
    fixtureFromDocuments(s, d).toDF()
      .select(col("media_id"), col("payload"))
      .withColumn("p", explode(expr(s"sequence(1, length(payload), $DedupChunkBytes)")))
      .select(col("media_id"), col("p"),
              md5(expr(s"substring(payload, p, $DedupChunkBytes)")).as("h"),
              expr(s"least(length(payload) - p + 1, $DedupChunkBytes)").as("nb"))
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_chunks"),
           sum(col("nb").cast("long")).as("n_bytes"),
           expr(graft.functions.TextHash.sparkHash56(
             "array_join(transform(array_sort(collect_list(struct(p, h))), x -> x.h), '')"))
             .as("manifest56"))
      .orderBy("media_id")

  /** m04 content-defined chunking parameters: an 8-byte polynomial window
    * hash marks a boundary where `hash % 64 == 0` (expected chunk ≈ 64
    * bytes on uniform content), boundaries only from byte 16 on so the
    * window is always full. POSITION-INDEPENDENT by construction — every
    * byte's window hash depends only on its own 8 trailing bytes, never on
    * previous boundaries — which is what makes the boundary set (a) stable
    * under inserts/deletes elsewhere in the payload (the CDC property m03's
    * fixed 256-byte grid lacks) and (b) expressible as a pure per-row map
    * in BOTH engines, no sequential state.
    */
  val CdcWindowBytes = 8
  val CdcMask = 64L
  val CdcMinPos = 16
  /** 31^k literals, k = 0..7 — shared (interpolated) by both engines. */
  val CdcPow31: IndexedSeq[Long] =
    (0 until CdcWindowBytes).scanLeft(1L)((a, _) => a * 31L).take(CdcWindowBytes)

  /** m04: content-defined chunk dedup profile — the rolling-hash upgrade
    * m03's docstring promises: boundaries from content (window-hash
    * zeroes), so shared runs dedup even when offsets shift. Per media:
    * chunk count, chunks whose hash recurs in ANOTHER media, and the byte
    * coverage identity (Σ chunk sizes == payload length — the partition
    * proof).
    *
    * Scale shape: boundary detection never leaves the row — the codegen'd
    * [[graft.functions.CdcChunks]] expression (`cdc_chunks(payload)`)
    * emits the span set in ONE JIT'd pass per payload, so the ONLY explode
    * emits ~len/64 chunk rows and the only shuffles carry chunk hashes
    * (exactly m03's shuffle footprint). Two slower spellings are
    * documented on the expression: per-byte explode (6.2 s at sf0.1, 64×
    * transient rows) and per-byte HOF lambdas (Catalyst inlines the byte
    * array into every lambda → O(len² × window) interpreted evals — never
    * finished). Same custom-expression escape hatch as `shingles`
    * (SURVEY §7.3).
    */
  def m04CdcChunks(s: SparkSession, d: String): DataFrame = {
    val hashed = fixtureFromDocuments(s, d).toDF()
      .select(col("media_id"), col("payload"))
      .withColumn("span", explode(expr("cdc_chunks(payload)")))
      .select(col("media_id"),
              (col("span.fin") - col("span.start") + 1).as("nb"),
              md5(expr(
                "substring(payload, span.start, span.fin - span.start + 1)"))
                .as("h"))
      // two consumers with different shuffle shapes (df build + the join
      // probe): cache so cdc_chunks + per-chunk md5 over the payload bytes
      // run once, keeping the "one JIT'd pass per payload" contract
      .cache()
    val df = hashed.groupBy("h").agg(countDistinct(col("media_id")).as("dm"))
    hashed.join(df, "h")
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_chunks"),
           sum(when(col("dm") >= 2, 1L).otherwise(0L)).as("n_shared"),
           sum(col("nb")).as("bytes_covered"))
      .orderBy("media_id")
  }

  /** m06 perceptual-hash parameters: [[PhashBits]] sampled "pixels" fold
    * into a [[PhashBits]]-bit aHash; [[PhashBands]] bands of
    * [[PhashBits]]/[[PhashBands]] bits make band blocking COMPLETE for
    * Hamming distance ≤ [[PhashMaxHam]] by pigeonhole (3 differing bits
    * can dirty at most 3 of 4 bands). */
  val PhashBits = 32
  val PhashBands = 4
  val PhashMaxHam = 3

  /** m06: perceptual near-dup via average-hash blocking — m03/m04 find
    * media sharing EXACT byte runs; this finds media that LOOK alike after
    * re-encoding jitter, the other half of media dedup. Real pipeline:
    * decode → downscale to an 8×8 grey grid → threshold each cell against
    * the mean → 64-bit aHash → pair media within small Hamming distance.
    * Here the decode/downscale is the documented stub (strided byte
    * sampling of the payload — deterministic, codec-free); everything
    * downstream — the bit fold, the banded blocking join, the popcount
    * verify — is the production shape.
    *
    * Scale shape: the hash is built in one pass (bounded [[PhashBits]]-row
    * fan-out per media, keyed window + partial-agg fold); media pairs come
    * from an EQUI-join on (band, 8-bit band value) — never all-pairs — and
    * the exact `bit_count(xor)` re-check runs only on band-collision
    * candidates, the generate-then-verify discipline of d10/d15. Only
    * hashes shuffle; payload bytes never leave the first stage.
    */
  def m06PhashNearDup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val px = fixtureFromDocuments(s, d).toDF()
      .select(col("media_id"), col("payload"),
        length(col("payload")).as("len"))
      .select(col("media_id"), col("payload"), col("len"),
        explode(expr(s"sequence(1, $PhashBits)")).as("i"))
      .withColumn("step", greatest(lit(1), expr(s"len div $PhashBits")))
      .withColumn("pos", expr("1 + ((i - 1) * step) % greatest(1, len)"))
      .withColumn("px", expr("ascii(cast(substring(payload, pos, 1) as string))"))
      .select("media_id", "i", "px")
    val w = Window.partitionBy("media_id")
    val ph = px
      .withColumn("tot", sum(col("px")).over(w))
      .groupBy("media_id")
      .agg(sum(when(col("px") * PhashBits > col("tot"),
        expr("shiftleft(cast(1 as bigint), i - 1)")).otherwise(lit(0L))).as("ph"))
    val bands = ph.select(col("media_id"), col("ph"),
        explode(expr(s"sequence(0, ${PhashBands - 1})")).as("b"))
      .withColumn("bk",
        expr(s"shiftright(ph, b * ${PhashBits / PhashBands}) & ${(1 << (PhashBits / PhashBands)) - 1}"))
    val lhs = bands.select(col("media_id").as("m1"), col("ph").as("ph1"),
      col("b"), col("bk"))
    val rhs = bands.select(col("media_id").as("m2"), col("ph").as("ph2"),
      col("b"), col("bk"))
    lhs.join(rhs, Seq("b", "bk"))
      .where(col("m1") < col("m2"))
      .select("m1", "m2", "ph1", "ph2").distinct()
      .withColumn("ham", expr("cast(bit_count(ph1 ^ ph2) as int)"))
      .where(col("ham") <= PhashMaxHam)
      .select(col("m1"), col("m2"), col("ham"))
      .orderBy("m1", "m2")
  }

  /** Training batch size for m09 (a multiple of the 3 modalities, so full
    * batches carry exactly BatchSize/3 of each kind).
    */
  val BatchSize = 12

  /** m09: modality-balanced batch assembly — interleave image/audio/video
    * items round-robin into fixed-size training batches so every full
    * batch sees the same modality mix (the batch-composition step a
    * multimodal training job runs after packing). Per-kind ranks come
    * from the KEYED range-partitioned prefix count
    * ([[graft.queries.TextOps.prefixSum]] with `keyCols` — NEVER a
    * 3-partition `Window.partitionBy(kind)`, which would put a third of
    * a 100 TB corpus in one task); the interleave position
    * `(rank−1)·3 + kind_idx` is then a pure per-row expression, and the
    * batch report is one partial-agg groupBy over O(corpus/BatchSize)
    * keys. The `balanced` flag proves the round-robin: every batch's
    * per-kind counts differ by ≤ 1 (the tail batches where a modality
    * exhausts are exactly the rows where it may drop below).
    */
  def m09BatchAssembly(s: SparkSession, d: String): DataFrame = {
    val media = graft.Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' " +
        "WHEN 1 THEN 'audio' ELSE 'video' END").as("kind"),
      expr("CAST(doc_id % 3 AS INT)").as("kidx"))
      .withColumn("one", lit(1L))
    val ranked = graft.queries.TextOps.prefixSum(
      media, "media_id", "one", "rank",
      includeCurrent = true, keyCols = Seq("kind"))
    ranked
      .withColumn("pos", (col("rank") - 1) * 3 + col("kidx"))
      .withColumn("batch", expr(s"cast(pos div $BatchSize as int)"))
      .groupBy("batch")
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("kind") === "image", 1L).otherwise(0L)).as("n_image"),
        sum(when(col("kind") === "audio", 1L).otherwise(0L)).as("n_audio"),
        sum(when(col("kind") === "video", 1L).otherwise(0L)).as("n_video"),
        min(col("media_id")).as("first_media"))
      .withColumn("balanced",
        greatest(col("n_image"), col("n_audio"), col("n_video")) -
          least(col("n_image"), col("n_audio"), col("n_video")) <= 1)
      .orderBy("batch")
  }

  /** m10's magic table: 4-byte ASCII sentinels per modality (real magics
    * — PNG/RIFF/ftyp — are arbitrary bytes; ASCII keeps the fixture
    * oracle-able while the PLUMBING — binary prepend, prefix slice,
    * broadcast dispatch table — is exactly the production shape).
    */
  val MagicTable: Seq[(String, String)] =
    Seq("image" -> "IMG:", "audio" -> "AUD:", "video" -> "VID:")

  /** m10: content-type sniffing from magic bytes — the ingest-edge
    * dispatch every media lake runs before trusting an extension: each
    * payload is tagged with its modality's 4-byte magic, then the
    * sniffer reads ONLY the 4-byte binary prefix and resolves it against
    * the broadcast magic table (a join, not a CASE — the table is data,
    * extensible without a plan change). The pin: the sniffed kind must
    * round-trip to the label for every row, and byte accounting stays
    * exact. Per-row codegen + one ≤3-row broadcast join; payload bytes
    * never shuffle.
    */
  def m10MagicSniff(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val magics = MagicTable.toDF("sniffed_kind", "magic")
    fixtureFromDocuments(s, d).toDF()
      .withColumn("tagged", expr(
        """concat(encode(CASE kind WHEN 'image' THEN 'IMG:'
          |               WHEN 'audio' THEN 'AUD:' ELSE 'VID:' END, 'UTF-8'),
          |        payload)""".stripMargin))
      .withColumn("magic", expr("decode(substring(tagged, 1, 4), 'UTF-8')"))
      .join(broadcast(magics), "magic")
      .select(col("media_id"), col("sniffed_kind"),
        (col("sniffed_kind") === col("kind")).as("matches_label"),
        expr("cast(octet_length(tagged) - 4 as bigint)").as("body_bytes"))
      .orderBy("media_id")
  }

  def m02FrameExplode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val stride = 4
    fixtureFromDocuments(s, d)
      .flatMap { m =>
        val chunks = (m.payload.length + 1023) / 1024
        (0 until chunks by stride).map { c =>
          (m.media_id, c, math.min(1024, m.payload.length - c * 1024))
        }
      }
      .toDF("media_id", "chunk_idx", "chunk_bytes")
      .orderBy("media_id", "chunk_idx")
  }
}
