package graft

import java.nio.file.{Files, Paths}

/** Operational-robustness pins for the ingest path — the two failure modes
  * a 100 TB lake hits weekly: a corrupt object in a scan directory, and
  * files written under drifted (but compatible) schemas. Both behaviors
  * are CONFIGURED, not emergent, so both sides of each switch are pinned.
  */
class RobustnessSpec extends SparkSpec {

  test("Verify durability: oracle_sql.json lands BEFORE any query runs; per-query progress streams as a parseable prefix") {
    // r12's official correctness artifact came back `{}` for a 364/364
    // tree because a driver-side kill mid-dump left nothing to parse.
    // The contract now: (1) oracle_sql.json depends on nothing the dump
    // loop computes and is written FIRST — a run that dumps NOTHING still
    // leaves the complete key→SQL map; (2) each finished query appends
    // one self-contained JSON line to verify_progress.jsonl
    // (open-append-close), so any kill point leaves a parseable prefix.
    val out0 = Files.createTempDirectory("verify_durability_none").toString
    // a regex matching no query: the dump loop is a no-op, yet the oracle
    // map must be complete
    Verify.run(spark, sf, out0, Some("^never_matches$".r))
    val oracleJson = Files.readString(Paths.get(s"$out0/oracle_sql.json"))
    assert(oracleJson.startsWith("{") && oracleJson.endsWith("}"))
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(oracleJson.contains("\"" + k + "\""),
        s"oracle_sql.json must carry every key even with zero dumps ($k)")
    }
    assert(!Files.exists(Paths.get(s"$out0/verify_progress.jsonl")) ||
      Files.readString(Paths.get(s"$out0/verify_progress.jsonl")).isEmpty)
    // a real (tiny) subset: the progress file carries one ok line per
    // dumped query, each line independently parseable (prefix property)
    val out1 = Files.createTempDirectory("verify_durability_one").toString
    Verify.run(spark, sf, out1, Some("^q01_".r))
    val lines = Files.readAllLines(Paths.get(s"$out1/verify_progress.jsonl"))
    assert(lines.size() === 1, "exactly the filtered query reports progress")
    val line = lines.get(0)
    assert(line.contains("\"query\"") && line.contains("\"status\"") &&
      line.contains("\"ok\"") && line.trim.startsWith("{") &&
      line.trim.endsWith("}"),
      s"each progress line must be a self-contained JSON object: $line")
    assert(Files.exists(Paths.get(s"$out1/oracle_sql.json")))
    // escaping: control chars in builder-authored SQL can never corrupt
    // the artifact (the other way the round's correctness silently zeroes)
    assert(Verify.jsonStr("a\"b\\c\nd\te" + 1.toChar + "f") ===
      "\"a\\\"b\\\\c\\nd\\te\\u0001f\"")
  }

  test("ReadGuard type widening: an INT-written run serves through a widened LONG read; kind changes stay loud") {
    // the third real schema evolution a long-lived store sees (additive
    // columns tolerated, missing loud — this adds WIDENING): an old
    // producer wrote doc_id as INT; newer runs carry BIGINT. Policy:
    // normalize on read to the widest type any run declares; narrowing
    // or kind changes still refuse to serve.
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr, min}
    import graft.streaming.StreamOps
    val dir = Files.createTempDirectory("widen_store").toString
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (h1, h2) = docs.partition(_._1 % 2 == 0)
    def withTh(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      .withColumn("th", expr(graft.functions.TextHash.sparkHash56("text")))
    // run 0: hand-planted with doc_id narrowed to INT (the old producer)
    withTh(h1.toSeq).select(col("th"), col("doc_id").cast("int").as("doc_id"))
      .write.parquet(s"$dir/hash56/batch_id=0")
    // run 1: the current fold writes BIGINT
    StreamOps.s32UpsertIndexBatch(dir)(h2.toSeq.toDF("doc_id", "text"), 1L)
    val got = StreamOps.s32HashIndex(spark, dir)
    assert(got.schema("doc_id").dataType ===
      org.apache.spark.sql.types.LongType,
      "the mixed-width store must serve the WIDENED type")
    val want = withTh(docs.toSeq).groupBy("th").agg(min("doc_id").as("doc_id"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "the mixed-width store must serve the same index as a uniform one")
    // a kind change (doc_id re-typed as STRING) refuses to serve
    withTh(h1.take(3).toSeq)
      .select(col("th"), col("doc_id").cast("string").as("doc_id"))
      .write.parquet(s"$dir/hash56/batch_id=2")
    val e = intercept[IllegalStateException](
      StreamOps.s32HashIndex(spark, dir).collect())
    assert(e.getMessage.contains("incompatibly") &&
      e.getMessage.contains("doc_id"), e.getMessage)
  }

  test("media codecs under fuzz: decode returns or fails LOUDLY — never crashes or hangs") {
    // The codecs run inside long-lived executor tasks over untrusted
    // bytes; the contract is a typed IllegalArgumentException (the
    // malformed-input exit every caller handles), never an index error,
    // NPE, or infinite loop. Seeded fuzz: random payloads plus
    // byte-mutations of VALID payloads (the nastier corpus — mostly
    // well-formed with one lie).
    import graft.operators.Multimodal
    val rnd = new scala.util.Random(20260815)
    val validPpm = Multimodal.PpmCodec.encode(4, 3,
      Array.tabulate(36)(i => (40 + i).toByte), Some(" c "))
    val validWav = Multimodal.WavCodec.encode(Array(5, -5, 700, -700), junkChunk = true)
    val validPng = Multimodal.PngCodec.encode(4, 5,
      Array.tabulate(60)(i => (i * 3 + 7).toByte), r => r % 5, Seq("k" -> "t"))
    def fuzzOne(decode: Array[Byte] => Any, payload: Array[Byte]): Unit =
      try { decode(payload); () } catch {
        case _: IllegalArgumentException => () // the contract
        case e: Throwable =>
          fail(s"codec leaked ${e.getClass.getName} on ${payload.length}B input: $e")
      }
    for (_ <- 1 to 200) {
      val junk = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      fuzzOne(Multimodal.PpmCodec.decode, junk)
      fuzzOne(Multimodal.WavCodec.decode, junk)
      fuzzOne(Multimodal.decodePpmStream, junk)
      def mutate(v: Array[Byte]): Array[Byte] = {
        val m = java.util.Arrays.copyOf(v, rnd.nextInt(v.length + 20))
        if (m.nonEmpty) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        m
      }
      fuzzOne(Multimodal.PpmCodec.decode, mutate(validPpm))
      fuzzOne(Multimodal.WavCodec.decode, mutate(validWav))
      fuzzOne(Multimodal.decodePpmStream, mutate(validPpm ++ validPpm))
      // PNG: junk + mutations; CRC verification means nearly every
      // mutation must surface as the typed failure, never garbage pixels
      fuzzOne(Multimodal.PngCodec.decode, junk)
      fuzzOne(Multimodal.PngCodec.decode, mutate(validPng))
    }
    // directed case random fuzz is unlikely to hit: a declared chunk size
    // near 2^31 whose addition-form bound check would overflow int and
    // pass — the walk must reject it, not index past the array
    val overflowWav = validWav.clone()
    val listPos = 12 + 8 + 16 // the junk LIST chunk's header
    overflowWav(listPos + 4) = 0xF8.toByte
    overflowWav(listPos + 5) = 0xFF.toByte
    overflowWav(listPos + 6) = 0xFF.toByte
    overflowWav(listPos + 7) = 0x7F.toByte // size = 0x7FFFFFF8
    fuzzOne(Multimodal.WavCodec.decode, overflowWav)
    // the PPM twins (r09 advice medium): dimensions whose w*h*3 wraps Int
    // negative would bypass an int-math raster guard and surface as
    // NegativeArraySizeException / a multi-GB alloc; header digits past
    // Int.MaxValue used to wrap silently inside readInt
    fuzzOne(Multimodal.PpmCodec.decode,
      "P6 1073741824 2 255\nxx".getBytes("US-ASCII"))
    fuzzOne(Multimodal.PpmCodec.decode,
      "P6 715827883 3 255\nxx".getBytes("US-ASCII")) // w*h*3 == 2^31+3 wraps
    fuzzOne(Multimodal.PpmCodec.decode,
      "P6 99999999999999999999 1 255\nxx".getBytes("US-ASCII"))
    fuzzOne(Multimodal.decodePpmStream,
      validPpm ++ "P6 1073741824 2 255\nxx".getBytes("US-ASCII"))
  }

  test("pcm16 and DeflateCodec under fuzz: total or typed failure, never a crash or hang") {
    import graft.operators.Multimodal
    val rnd = new scala.util.Random(20260816)
    // pcm16 is TOTAL: any byte array decodes (odd tail byte ignored) —
    // it sits after WavCodec's validated data chunk, so its only contract
    // is no crash and exact length accounting
    for (_ <- 1 to 100) {
      val junk = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      val out = Multimodal.pcm16(junk)
      assert(out.length === junk.length / 2)
      assert(out.forall(v => v >= Short.MinValue && v <= Short.MaxValue))
    }
    // DeflateCodec's typed malformed-input exits are the zip layer's
    // DataFormatException/ZipException (documented on the codec); the pin
    // is the same as the PPM/WAV one — no index error, NPE, or hang, and
    // every zero-progress stall (truncation, FDICT) surfaces typed.
    def fuzzInflate(payload: Array[Byte]): Unit =
      try { Multimodal.DeflateCodec.decode(payload); () } catch {
        case _: java.util.zip.DataFormatException => ()
        case _: java.util.zip.ZipException => ()
        case e: Throwable =>
          fail(s"DeflateCodec leaked ${e.getClass.getName} on ${payload.length}B: $e")
      }
    val valid = Multimodal.DeflateCodec.encode(
      Array.tabulate(500)(i => (i % 251).toByte))
    for (_ <- 1 to 200) {
      fuzzInflate(Array.fill(rnd.nextInt(120))(rnd.nextInt(256).toByte))
      // truncations of a VALID stream — every prefix length must exit typed
      fuzzInflate(java.util.Arrays.copyOf(valid, rnd.nextInt(valid.length)))
      // single-byte mutations of a valid stream
      val m = valid.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      fuzzInflate(m)
    }
  }

  test("m10 magic dispatch under fuzz: unknown/short/non-UTF8 prefixes drop out, never crash") {
    // The sniff path (binary prefix slice + broadcast-join dispatch) runs
    // over UNTRUSTED payload bytes at the ingest edge: a payload shorter
    // than the magic, an arbitrary-bytes prefix, or an invalid UTF-8
    // sequence must simply not match any magic row (inner join drops it)
    // — not throw. This fuzz found the original string-domain spelling
    // (`decode(prefix, 'UTF-8')`) throws MALFORMED_CHARACTER_CODING on
    // Spark 4, which is why m10 dispatches in the binary domain; the
    // test pins that binary spelling against the same corpus.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(20260817)
    val rows = (1 to 60).map { i =>
      val len = rnd.nextInt(10) // includes 0..3, shorter than the magic
      (i.toLong, Array.fill(len)(rnd.nextInt(256).toByte))
    } :+ (990L, "IMG:payload".getBytes("US-ASCII")) :+
      (991L, Array[Byte]('A', 'U', 'D', ':', 0xC3.toByte)) // valid magic, junk body
    val magics = graft.operators.Multimodal.MagicTable.toDF("sniffed_kind", "magic")
      .withColumn("magic_bin", expr("encode(magic, 'UTF-8')"))
      .select("sniffed_kind", "magic_bin")
    val sniffed = rows.toDF("media_id", "payload")
      .withColumn("magic_bin", expr("substring(payload, 1, 4)"))
      .join(broadcast(magics), "magic_bin")
      .select("media_id", "sniffed_kind")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the two planted magics resolve; the 60 fuzz rows either resolve to a
    // real modality (a 1-in-4B accident) or drop — and nothing throws
    assert(sniffed(990L) === "image")
    assert(sniffed(991L) === "audio")
    assert(sniffed.values.toSet.subsetOf(Set("image", "audio", "video")))
  }

  test("s44 graph-store fsck: healthy store audits clean; planted referential breaks and stale runs are named and loud-fail") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val StreamOps = graft.streaming.StreamOps
    val dir = java.nio.file.Files.createTempDirectory("s44_fsck").toString
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val cents = graft.queries.Similarity.ivfCentroids(spark, sf)
      .localCheckpoint()
    val (half1, half2) = vecs.partition(_._1 % 2 == 0)
    StreamOps.s36UpsertGraphBatch(cents, dir)(
      half1.toSeq.toDF("vec_id", "embedding"), 0L)
    StreamOps.s36UpsertGraphBatch(cents, dir)(
      half2.toSeq.toDF("vec_id", "embedding"), 1L)
    StreamOps.s36DeleteBatch(dir)(
      vecs.map(_._1).filter(_ % 5 == 1).toSeq.toDF("vec_id"), 2L)
    // a correctly-maintained store (including after deletes) is clean
    StreamOps.s44RequireHealthy(spark, dir)
    assert(StreamOps.s44GraphStoreAudit(spark, dir)
      .filter(col("n_bad") > 0).isEmpty)
    // plant corruption 1: an edge run naming vec_ids that were never
    // ingested, at a fresh batch id so latest-per-src serves it
    Seq((999999L, 999998L, 0.5)).toDF("src", "dst", "cos")
      .withColumn("batch_id", lit(3L))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$dir/edges")
    spark.catalog.refreshByPath(s"$dir/edges")
    val audit = StreamOps.s44GraphStoreAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(audit("edges_src_not_in_vectors") === 1L)
    assert(audit("edges_dst_not_in_vectors") === 1L)
    val ex = intercept[IllegalArgumentException] {
      StreamOps.s44RequireHealthy(spark, dir)
    }
    assert(ex.getMessage.contains("edges_src_not_in_vectors"))
    // plant corruption 2: compact, then hand-restore a run from BELOW the
    // stamp (the mixed-generation restore the s41 fence cannot see)
    StreamOps.s37CompactEdgeStore(spark, dir)
    Seq((1L, 2L)).toDF("vec_id", "cid").withColumn("batch_id", lit(0L))
      .write.mode("append").partitionBy("batch_id").parquet(s"$dir/cells")
    spark.catalog.refreshByPath(s"$dir/cells")
    val audit2 = StreamOps.s44GraphStoreAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(audit2("runs_below_compaction_stamp") >= 1L,
      s"stale restored run must be flagged: $audit2")
  }

  test("s46 family fsck: every maintained store audits clean when healthy; planted per-store corruption is named and loud-fails") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val StreamOps = graft.streaming.StreamOps
    def auditMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    def plant(rows: org.apache.spark.sql.DataFrame, path: String,
              batchId: Long): Unit = {
      rows.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(path)
      spark.catalog.refreshByPath(path)
    }

    // hash/band store: a band run naming a never-ingested doc breaks the
    // doc-set equality AND the per-doc band cardinality
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val hdir = java.nio.file.Files.createTempDirectory("s46_hash").toString
    val (dh1, dh2) = docs.partition(_._1 % 2 == 0)
    StreamOps.s32UpsertIndexBatch(hdir)(dh1.toSeq.toDF("doc_id", "text"), 0L)
    StreamOps.s32UpsertIndexBatch(hdir)(dh2.toSeq.toDF("doc_id", "text"), 1L)
    StreamOps.s46RequireHealthy(spark, hdir, "hash")
    plant(Seq((999999L, "0:bogus")).toDF("doc_id", "band_key"),
      s"$hdir/bands", 2L)
    val hAudit = auditMap(StreamOps.s46HashStoreAudit(spark, hdir))
    assert(hAudit("band_doc_not_in_hash") === 1L, hAudit.toString)
    assert(hAudit("band_cardinality_wrong") === 1L, hAudit.toString)
    val hEx = intercept[IllegalArgumentException] {
      StreamOps.s46RequireHealthy(spark, hdir, "hash")
    }
    assert(hEx.getMessage.contains("band_doc_not_in_hash"))

    // chunk store: two nb values under one content hash break the CAS
    // one-hash-one-length property
    val media = graft.operators.Multimodal.fixtureFromDocuments(spark, sf)
      .toDF().select("media_id", "payload")
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val cdir = java.nio.file.Files.createTempDirectory("s46_chunk").toString
    StreamOps.s34UpsertChunkBatch(cdir)(
      media.toSeq.toDF("media_id", "payload"), 0L)
    StreamOps.s46RequireHealthy(spark, cdir, "chunk")
    val someHash = StreamOps.s34ChunkStore(spark, cdir)
      .select("h").head().getString(0)
    plant(Seq((someHash, 999999L, -7)).toDF("h", "media_id", "nb"),
      s"$cdir/chunks", 1L)
    val cAudit = auditMap(StreamOps.s46ChunkStoreAudit(spark, cdir))
    assert(cAudit("hash_nb_conflict") === 1L, cAudit.toString)
    intercept[IllegalArgumentException] {
      StreamOps.s46RequireHealthy(spark, cdir, "chunk")
    }

    // assignment store: a second row for a vector with an out-of-codebook
    // centroid breaks pure-function single-assignment AND the range check
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val cents = graft.queries.Similarity.ivfCentroids(spark, sf)
      .localCheckpoint()
    val adir = java.nio.file.Files.createTempDirectory("s46_assign").toString
    StreamOps.s35UpsertIvfBatch(cents, adir)(
      vecs.toSeq.toDF("vec_id", "embedding"), 0L)
    StreamOps.s46RequireHealthy(spark, adir, "assign")
    plant(Seq((vecs.head._1, 99L, 0.0)).toDF("vec_id", "cid", "ccos"),
      s"$adir/assigned", 1L)
    val aAudit = auditMap(StreamOps.s46AssignStoreAudit(spark, adir))
    assert(aAudit("vec_with_multiple_assignments") === 1L, aAudit.toString)
    assert(aAudit("cid_out_of_range") === 1L, aAudit.toString)
    intercept[IllegalArgumentException] {
      StreamOps.s46RequireHealthy(spark, adir, "assign")
    }

    // code store: a conflicting out-of-range code for an existing
    // (vector, subspace) slot
    val cbook = graft.queries.Similarity.pqCodebook(spark, sf)
      .localCheckpoint()
    val pdir = java.nio.file.Files.createTempDirectory("s46_code").toString
    StreamOps.s38UpsertPqBatch(cbook, pdir)(
      vecs.toSeq.toDF("vec_id", "embedding"), 0L)
    StreamOps.s46RequireHealthy(spark, pdir, "code")
    plant(Seq((vecs.head._1, 0, 99L, 0L)).toDF("vec_id", "sub", "code", "dist2"),
      s"$pdir/codes", 1L)
    val pAudit = auditMap(StreamOps.s46CodeStoreAudit(spark, pdir))
    assert(pAudit("sub_code_conflict") === 1L, pAudit.toString)
    assert(pAudit("code_out_of_range") === 1L, pAudit.toString)
    intercept[IllegalArgumentException] {
      StreamOps.s46RequireHealthy(spark, pdir, "code")
    }

    // cluster store: a label pointing above its doc at a never-served id
    // breaks the min-id policy and label liveness
    val ldir = java.nio.file.Files.createTempDirectory("s46_cluster").toString
    StreamOps.s43UpsertClusterBatch(ldir)(
      dh1.toSeq.toDF("doc_id", "text"), 0L)
    StreamOps.s46RequireHealthy(spark, ldir, "cluster")
    plant(Seq((dh1.head._1, 999999L)).toDF("doc_id", "cluster"),
      s"$ldir/labels", 1L)
    val lAudit = auditMap(StreamOps.s46ClusterStoreAudit(spark, ldir))
    assert(lAudit("label_above_doc") === 1L, lAudit.toString)
    assert(lAudit("label_not_served") === 1L, lAudit.toString)
    intercept[IllegalArgumentException] {
      StreamOps.s46RequireHealthy(spark, ldir, "cluster")
    }
    // the crash-lag case: hash/band run landed, labels never written (a
    // crash between the s43 fold's two writes) — fsck must name the
    // invisible docs, and replaying the batch through the FULL fold heals
    val crashDir = java.nio.file.Files.createTempDirectory("s46_crash").toString
    StreamOps.s43UpsertClusterBatch(crashDir)(
      dh1.toSeq.toDF("doc_id", "text"), 0L)
    StreamOps.s32UpsertIndexBatch(crashDir)(
      dh2.toSeq.toDF("doc_id", "text"), 1L) // the crashed half-fold
    val crashAudit = auditMap(StreamOps.s46ClusterStoreAudit(spark, crashDir))
    assert(crashAudit("ingested_doc_without_label") === dh2.length.toLong,
      crashAudit.toString)
    StreamOps.s43UpsertClusterBatch(crashDir)(
      dh2.toSeq.toDF("doc_id", "text"), 1L) // replay heals
    StreamOps.s46RequireHealthy(spark, crashDir, "cluster")
    // golden store: a planted golden row naming a never-served label
    // breaks label liveness; a wrong recorded size breaks the membership
    // match (the two directions the re-election fold guarantees)
    val gdocs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val gdir = java.nio.file.Files.createTempDirectory("s46_golden").toString
    StreamOps.s48UpsertGoldenBatch(gdir)(
      gdocs.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars"), 0L)
    StreamOps.s46RequireHealthy(spark, gdir, "golden")
    val real = StreamOps.s48Golden(spark, gdir).head()
    plant(Seq(
        (999999L, 2L, 1L, 10L, 999999L, 10L, "en"),        // phantom label
        (real.getLong(0), real.getLong(1) + 5L, real.getLong(2),
          real.getLong(3), real.getLong(4), real.getLong(5),
          real.getString(6)))                              // size lie
      .toDF("kept_doc", "cluster_size", "n_sources", "total_chars",
        "rep_doc", "rep_chars", "lang_mode"),
      s"$gdir/golden", 1L)
    val gAudit = auditMap(StreamOps.s46GoldenStoreAudit(spark, gdir))
    assert(gAudit("golden_label_not_served") === 1L, gAudit.toString)
    assert(gAudit("golden_size_mismatch") === 1L, gAudit.toString)
    intercept[IllegalArgumentException] {
      StreamOps.s46RequireHealthy(spark, gdir, "golden")
    }

    // the unknown-family guard names the accepted families
    val fEx = intercept[IllegalArgumentException] {
      StreamOps.s46RequireHealthy(spark, ldir, "nosuch")
    }
    assert(fEx.getMessage.contains("hash|chunk|assign|code|cluster|golden|graph"))
  }

  test("store schema evolution: an ADDITIVE run (extra column) still serves and fscks clean; a missing column stays loud") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val StreamOps = graft.streaming.StreamOps
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val cents = graft.queries.Similarity.ivfCentroids(spark, sf)
      .localCheckpoint()
    val (h1, h2) = vecs.partition(_._1 % 2 == 0)
    val dir = java.nio.file.Files.createTempDirectory("evolve_s35").toString
    StreamOps.s35UpsertIvfBatch(cents, dir)(
      h1.toSeq.toDF("vec_id", "embedding"), 0L)
    // a v2 writer adds a provenance column to ITS run only — the
    // additive-evolution case ReadGuard must tolerate (the serve fold
    // selects the contract columns; extras are free to appear)
    val v2 = graft.queries.Similarity.assignToCentroids(
        graft.queries.Similarity.prepareVectors(
          h2.toSeq.toDF("vec_id", "embedding")), cents)
      .select("vec_id", "cid", "ccos")
      .withColumn("writer", lit("v2"))
      .withColumn("batch_id", lit(1L))
    v2.write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$dir/assigned")
    spark.catalog.refreshByPath(s"$dir/assigned")
    val want = graft.queries.Similarity.assignToCentroids(
        graft.queries.Similarity.prepareVectors(
          vecs.toSeq.toDF("vec_id", "embedding")), cents)
      .select("vec_id", "cid", "ccos")
    val got = StreamOps.s35Assignment(spark, dir)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "a mixed-writer store must serve the contract columns unchanged")
    StreamOps.s46RequireHealthy(spark, dir, "assign")
    // the SUBTRACTIVE case stays loud: a run missing a contract column
    // fails naming the table (ReadGuard's existing drift contract)
    val bad = java.nio.file.Files.createTempDirectory("evolve_bad").toString
    h1.toSeq.toDF("vec_id", "embedding")
      .select("vec_id").withColumn("batch_id", lit(0L))
      .write.partitionBy("batch_id").parquet(s"$bad/assigned")
    val ex = intercept[IllegalStateException] {
      StreamOps.s35Assignment(spark, bad).collect()
    }
    assert(ex.getMessage.contains("assigned"), ex.getMessage)
  }

  test("corrupt parquet file: loud failure by default, skipped under ignoreCorruptFiles") {
    import spark.implicits._
    val dir = Files.createTempDirectory("robust_corrupt").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    // plant a non-parquet object where the scan will pick it up
    Files.write(Paths.get(dir, "part-corrupt.parquet"),
      "this is not a parquet file".getBytes)
    // default: the bad object must FAIL the read — silent data loss on a
    // corrupt file is never acceptable as a default
    val loud = intercept[Exception] {
      spark.read.parquet(dir).count()
    }
    assert(loud != null)
    // opted in: the scan completes on the surviving files
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try {
      val rows = spark.read.parquet(dir).select("id").collect().map(_.getLong(0)).sorted
      assert(rows.toSeq === Seq(1L, 2L), s"expected the good file's rows, got ${rows.toSeq}")
    } finally spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
  }

  test("persisted-index read-back: schema drift and truncated files fail LOUDLY, never serve wrong neighbors") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    import graft.streaming.StreamOps
    // (a) drifted s35 assignment table — a migration renamed cid: the
    // guard must refuse at the READ, naming the table and the column
    // (the alternative is an AnalysisException deep in the probe join, or
    // a silently-wrong probe through a surviving same-named column)
    val d35 = Files.createTempDirectory("bad_s35").toString
    Seq((1L, 2L, 0.5)).toDF("vec_id", "centroid_id", "ccos")
      .withColumn("batch_id", lit(0L))
      .write.partitionBy("batch_id").parquet(s"$d35/assigned")
    val e35 = intercept[IllegalStateException](StreamOps.s35Assignment(spark, d35))
    assert(e35.getMessage.contains("cid") && e35.getMessage.contains("assigned"),
      s"drift error must name table and column: ${e35.getMessage}")
    // (b) drifted s36 edge store — the score column dropped: serving a
    // graph without edge weights would walk arbitrary neighbors
    val d36 = Files.createTempDirectory("bad_s36").toString
    Seq((1L, 2L)).toDF("src", "dst").withColumn("batch_id", lit(0L))
      .write.partitionBy("batch_id").parquet(s"$d36/edges")
    val e36 = intercept[IllegalStateException](StreamOps.s36DirectedEdges(spark, d36))
    assert(e36.getMessage.contains("cos"),
      s"drift error must name the missing column: ${e36.getMessage}")
    // (c) truncated chunk-store file — the parquet footer read must fail
    // the compacted read loudly (same default as the scan-path pin above)
    val d34 = Files.createTempDirectory("bad_s34").toString
    Files.createDirectories(Paths.get(s"$d34/chunks"))
    Files.write(Paths.get(s"$d34/chunks/part-00000.parquet"),
      "truncated mid-write".getBytes)
    val e34 = intercept[Exception] {
      StreamOps.s34ChunkStore(spark, d34).count()
    }
    assert(e34 != null)
    // (d) the n25/n26 store reads run the same guard — pin its error
    // shape once directly on n26's adjacency column set
    val eg = intercept[IllegalStateException] {
      graft.sources.ReadGuard.requireColumns(
        Seq((1L, 2L)).toDF("src", "destination"), "ann_graph_store/adjacency",
        "src", "dst")
    }
    assert(eg.getMessage.contains("dst") &&
      eg.getMessage.contains("ann_graph_store/adjacency"))
  }

  test("parquet schema drift: mergeSchema unions columns; default keeps one file's view") {
    import spark.implicits._
    val dir = Files.createTempDirectory("robust_drift").toString
    // two writer generations: v2 adds a column
    Seq((1L, "a")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/gen=1")
    Seq((2L, "b", 9.5)).toDF("id", "v", "score")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/gen=2")
    // mergeSchema: the union schema, old rows null-completed
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("id", "v", "score", "gen"),
      s"union schema expected, got ${merged.columns.toSeq}")
    val byId = merged.select("id", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(byId === Map(1L -> None, 2L -> Some(9.5)), s"got $byId")
    // default (no mergeSchema): one footer's schema is used for all files —
    // the cheap path; pin only that it reads both rows without error
    val plain = spark.read.parquet(dir)
    assert(plain.select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }

  test("q158 boundary key: lexicographic order is numeric order at full bigint width") {
    // Spark's lpad silently TRUNCATES inputs longer than len (round-6
    // advice item 1): with the old 9-digit id pad, ids >= 1e9 corrupted
    // the total order with no error. Pin the key on adversarial values —
    // both sides of the old pad boundaries, Long.MaxValue, and
    // same-instant ties where ends (-1) must sort before starts (+1).
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val rows = Seq(
      // (us, delta, event_id)
      (0L, 1L, 1L),
      (0L, -1L, 2L),                          // tie at us=0: end first
      (99999999999999999L, 1L, 999999999L),   // 17-digit us / 9-digit id
      (99999999999999999L, 1L, 1000000000L),  // first id the OLD pad broke
      (100000000000000000L, -1L, 5L),         // 18-digit us (old pad broke)
      (100000000000000000L, 1L, 5L),
      (Long.MaxValue, 1L, Long.MaxValue),
      (Long.MaxValue, 1L, Long.MaxValue - 1))
    val keyed = rows.toDF("us", "delta", "event_id")
      .withColumn("bkey", expr(graft.queries.Extras.q158BoundaryKeyExpr))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byKey = keyed.sortBy(_._4).map(t => (t._1, t._2, t._3))
    val numeric = rows.sortBy { case (us, delta, id) =>
      (us, if (delta == -1L) 0 else 1, id) }
    assert(byKey.toSeq === numeric,
      s"string key order diverges from numeric order:\n${byKey.toSeq}\n$numeric")
    // and the keys are collision-free across distinct rows
    assert(keyed.map(_._4).distinct.length === rows.length)
  }

  test("q158 boundary guard fails loudly on negative inputs instead of silently misordering") {
    // Zero-padding wraps a minus sign, so negative us/event_id would
    // break lexicographic==numeric SILENTLY; the guard turns that into a
    // job failure (and the intercept proves the optimizer did not fold
    // the assert away).
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val bad = Seq((-1L, 1L, 5L), (10L, -1L, 6L)).toDF("us", "delta", "event_id")
    val e = intercept[Exception] {
      bad.filter(expr(graft.queries.Extras.q158BoundaryGuardExpr))
        .withColumn("bkey", expr(graft.queries.Extras.q158BoundaryKeyExpr))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("non-negative")),
      s"expected the guard's message, got: ${messages(e)}")
  }
}
