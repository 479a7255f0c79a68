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
}
