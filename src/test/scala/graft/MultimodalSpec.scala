package graft

import graft.operators.Multimodal

/** Multimodal plumbing: schema, batch shape, partitioning, stub decode. */
class MultimodalSpec extends SparkSpec {

  test("feature extraction preserves ids and byte accounting") {
    val media = Multimodal.fixtureFromDocuments(spark, sf)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.byte_histogram.sum === f.n_bytes, "histogram must cover every byte")
      assert(f.byte_mean >= 0 && f.byte_mean <= 255)
      assert(f.frames_sampled >= 1)
      assert(Set("image", "audio", "video").contains(f.kind))
    }
    // ids round-trip 1:1
    val inIds = media.collect().map(_.media_id).sorted
    assert(feats.map(_.media_id).sorted === inIds)
  }

  test("binaryFile source ingests raw media files into the Media pipeline") {
    // The ingest half of the multimodal story: media lands as FILES, and
    // Spark's binaryFile source turns a directory into (path, modTime,
    // length, content) rows — the entry point that feeds Media/
    // extractFeatures without any driver-side file reading. At 100 TB this
    // is a distributed listing + ranged reads per executor; pathGlobFilter
    // keeps non-media files out of the scan.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("media_files")
    val fixtures = Seq(
      "img_0.jpg" -> "fake jpeg payload zero",
      "img_1.jpg" -> "fake jpeg payload one with more bytes",
      "notes.txt" -> "not media; must be glob-filtered out")
    fixtures.foreach { case (name, body) =>
      java.nio.file.Files.write(dir.resolve(name), body.getBytes("UTF-8"))
    }
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.jpg")
      .load(dir.toString)
    assert(files.columns.toSet ===
      Set("path", "modificationTime", "length", "content"))
    val media = files
      .select(col("path"), col("content"), col("length"))
      .as[(String, Array[Byte], Long)]
      .map { case (path, content, length) =>
        Multimodal.Media(
          media_id = path.split('_').last.split('.').head.toLong,
          kind = "image", payload = content,
          width = 16, height = 16, duration_ms = 0L, format = "jpg")
      }
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats.keySet === Set(0L, 1L), "glob filter must exclude notes.txt")
    // bytes survived the source intact: histogram totals == file sizes
    assert(feats(0L).n_bytes === fixtures(0)._2.getBytes("UTF-8").length.toLong)
    assert(feats(1L).n_bytes === fixtures(1)._2.getBytes("UTF-8").length.toLong)
    assert(feats(1L).byte_histogram.sum === feats(1L).n_bytes)
  }

  test("stub decode is deterministic and byte-exact") {
    val payload = "hello multimodal world".getBytes("UTF-8")
    val (m1, h1) = Multimodal.fakeDecode(payload)
    val (m2, h2) = Multimodal.fakeDecode(payload)
    assert(m1 === m2 && h1.toSeq === h2.toSeq)
    assert(h1.sum === payload.length)
  }

  test("resizeMeta bounds dimensions without touching payload") {
    val media = Multimodal.fixtureFromDocuments(spark, sf)
    val resized = Multimodal.resizeMeta(media, 64).collect()
    resized.foreach { m =>
      assert(m.width <= 64 && m.height <= 64)
      assert(m.payload.nonEmpty)
    }
  }

  test("repartitionByBytes yields ceil(total/target) partitions") {
    val media = Multimodal.fixtureFromDocuments(spark, sf)
    val total = media.collect().map(_.payload.length.toLong).sum
    val parts = Multimodal.repartitionByBytes(media, total, targetBytes = 4096)
      .rdd.getNumPartitions
    assert(parts === math.max(1, (total / 4096).toInt))
  }

  test("frame sampling: stride divides chunk count with ceiling") {
    assert(Multimodal.sampleFrames(new Array[Byte](1024 * 8), 4) === 2)
    assert(Multimodal.sampleFrames(new Array[Byte](1), 4) === 1)
    assert(Multimodal.sampleFrames(new Array[Byte](0), 4) === 0)
  }

  test("m03 oracle precondition: documents corpus is pure ASCII at every SF") {
    // m03's DuckDB oracle slices the payload with VARCHAR substr while the
    // Spark side slices BINARY — byte-identical ONLY while every character
    // is one UTF-8 byte. This is the assertion the m03 oracle note cites
    // (round-5 advice): a future non-ASCII fixture token fails HERE, at
    // the cause, not as an opaque hash mismatch in the driver compare.
    import org.apache.spark.sql.functions.expr
    val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(s => s"/root/testdata/$s/documents.parquet")
      .filter(p => new java.io.File(p).exists)
    assert(sfDirs.nonEmpty, "no documents.parquet found in any SF dir")
    sfDirs.foreach { p =>
      val nonAscii = spark.read.parquet(p)
        .filter(expr("octet_length(text) <> length(text)")).count()
      assert(nonAscii === 0L,
        s"$p has $nonAscii non-ASCII rows — m03's VARCHAR-substr oracle parity breaks")
    }
  }
}
