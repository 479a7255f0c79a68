package graft

/** Scale-factor invariance audit for the TUNED-CONSTANT reports (round-10
  * verdict item 4): d22's banding geometries, n18/n21's nprobe curves,
  * d13/d21's precision/recall and p08's leakage rates are oracle-pinned at
  * sf0.01 — the scale the constants were chosen at. This suite re-runs the
  * same reports at sf0.1 (10× corpus) and asserts the QUALITATIVE
  * contracts each tuning table promises, so a corpus growth can't
  * silently invert a tuning decision:
  *
  *  - recall is monotone in bands / nprobe (the S-curve direction),
  *  - candidate counts grow with the knob and stay far sub-quadratic
  *    (the entire point of blocking),
  *  - refinement never scores below raw ADC,
  *  - blocking keeps high reduction WITHOUT collapsing completeness,
  *  - near-dup leakage dominates exact leakage (exact twins share every
  *    band by construction).
  *
  * Only relations and generous floors are pinned — never the sf0.1 point
  * values (those belong to the oracle at sf0.01); the floors carry ≥ 2×
  * slack against the measured sf0.1 numbers recorded per test.
  */
class ScaleInvarianceSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.1"

  private def docCount: Long = Tables.documents(spark, sf01).count()

  test("d22 banding sweep at sf0.1: S-curve direction holds, candidates stay sub-quadratic") {
    // measured at sf0.1: (2,8)→240 cand / 541bp prec / 121bp rec,
    // (4,4)→256/507/121, (8,2)→1133/114/121
    val rows = graft.queries.Dedup.d22BandingSweep(spark, sf01).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(2, 4, 8))
    // more bands → more candidates, no less recall, no more precision
    rows.sliding(2).foreach { case Array((b1, c1, p1, r1), (b2, c2, p2, r2)) =>
      assert(c2 >= c1, s"candidates must not shrink with bands ($b1→$b2)")
      assert(r2 >= r1, s"recall must not shrink with bands ($b1→$b2)")
      assert(p2 <= p1, s"precision must not grow with bands ($b1→$b2)")
    }
    // sub-quadratic: even the loosest geometry probes ≪ the pair space
    val pairSpace = docCount * (docCount - 1) / 2
    rows.foreach { case (b, c, _, _) =>
      assert(c * 100 <= pairSpace,
        s"bands=$b candidates $c must stay ≪ pair space $pairSpace")
    }
    rows.foreach { case (b, _, _, r) =>
      assert(r > 0, s"bands=$b must retain some truth at 10× corpus")
    }
  }

  test("n18 nprobe sweep at sf0.1: recall monotone, candidates grow ~linearly, full recall reached") {
    // measured at sf0.1: candidates 118/245/352/472, hits10 = 10 at every np
    val rows = graft.queries.Similarity.n18NprobeSweep(spark, sf01).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    rows.sliding(2).foreach { case Array((n1, c1, h1), (n2, c2, h2)) =>
      assert(c2 > c1, s"candidates must grow with nprobe ($n1→$n2)")
      assert(h2 >= h1, s"recall must not shrink with nprobe ($n1→$n2)")
    }
    // probing k lists costs ~k× one list, never blows past it (uniform-ish
    // list sizes survive the 10× corpus; 2× slack on the measured ratio)
    val c1 = rows.head._2
    assert(rows.last._2 <= c1 * rows.last._1 * 2,
      "candidate growth must stay ~linear in nprobe")
    assert(rows.last._3 == graft.queries.Similarity.TopK,
      "the widest probe must reach full recall@10 at 10× corpus")
  }

  test("n21 IVF-PQ sweep at sf0.1: refinement never scores below raw ADC; candidates track nprobe") {
    // measured at sf0.1: adc_hits 2 flat, refined 7/6/6/6 — refined recall
    // is NOT monotone in nprobe (a wider candidate set can reshuffle the
    // ADC shortlist), so only the guaranteed relations are pinned
    val rows = graft.queries.Similarity.n21IvfpqRecall(spark, sf01).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    rows.sliding(2).foreach { case Array((n1, c1, _, _), (n2, c2, _, _)) =>
      assert(c2 > c1, s"candidates must grow with nprobe ($n1→$n2)")
    }
    rows.foreach { case (np, _, adc, refined) =>
      assert(refined >= adc,
        s"nprobe=$np: exact refinement ($refined) must never score below raw ADC ($adc)")
      assert(refined > 0, s"nprobe=$np: the shortlist must retain some truth")
    }
  }

  test("d13 LSH quality at sf0.1: deployed 4x4 geometry keeps real precision on a 10x corpus") {
    // measured at sf0.1: 256 candidates, 13 tp, 507bp precision, 121bp recall
    val Array((cand, truth, tp, prec, rec)) =
      graft.queries.Dedup.d13LshQuality(spark, sf01).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
    assert(tp > 0 && truth > 0)
    assert(prec >= 200, s"precision $prec bp collapsed at 10× corpus")
    assert(rec > 0, s"recall must stay nonzero at 10× corpus")
    val pairSpace = docCount * (docCount - 1) / 2
    assert(cand * 100 <= pairSpace, s"candidates $cand must stay ≪ pair space")
  }

  test("d21 blocking quality at sf0.1: high reduction without collapsing completeness") {
    // measured at sf0.1: reduction 9941bp, completeness 1777bp
    val Array((cand, truth, found, comp, red)) =
      graft.queries.Dedup.d21BlockingQuality(spark, sf01).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
    assert(red >= 9500, s"reduction ratio $red bp must stay high at 10× corpus")
    assert(comp >= 500, s"pairs completeness $comp bp must not collapse")
    assert(found > 0 && found <= cand && found <= truth)
  }

  test("n28 on-demand serving walk at sf0.1: identical report to n24's full-score walk (by construction — assert it at 10x)") {
    // both walks visit the same nodes in the same order and compute the
    // same IEEE doubles; only the SCORING ACCESS PATH differs (per-hop
    // broadcast point fetch vs the precomputed batch×corpus table), so
    // the reports must be row-for-row equal at any scale
    val full = graft.queries.Similarity.n24BatchedBeam(spark, sf01)
      .collect().map(_.toSeq.map(String.valueOf))
    val ondemand = graft.queries.Similarity.n28OndemandBeam(spark, sf01)
      .collect().map(_.toSeq.map(String.valueOf))
    assert(ondemand.toSeq === full.toSeq,
      "the serving-contract walk must equal the full-score walk at sf0.1")
  }

  test("n29 persisted PQ index at sf0.1: served from the written tables equals the in-session build") {
    val built = graft.queries.Similarity.n20Ivfpq(spark, sf01)
      .collect().map(_.toSeq.map(String.valueOf))
    val served = graft.queries.Similarity.n29PqPersist(spark, sf01)
      .collect().map(_.toSeq.map(String.valueOf))
    assert(served.toSeq === built.toSeq,
      "the persisted round trip must be lossless at sf0.1")
  }

  test("t43 temperature mix at sf0.1: achieved tracks target within binomial tolerance; gate algebra stays sane") {
    // measured at sf0.1: 5 sources, rate 437k-646k ppm, achieved/target
    // within ~2% per source — pin a generous 15% band (hash gating is
    // binomial over thousands of docs; a broken gate misses by far more)
    val rows = graft.queries.TextOps.t43TemperatureMix(spark, sf01).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7)))
    assert(rows.length >= 2, "the mixture needs several sources to mean anything")
    rows.foreach { case (src, raw, target, ppm, keptDocs, keptToks) =>
      assert(ppm >= 0 && ppm <= 1000000, s"$src: rate $ppm out of range")
      assert(keptToks <= raw, s"$src: kept tokens must not exceed supply")
      assert(target <= raw, s"$src: target is capped at the source's supply")
      if (ppm == 1000000)
        assert(keptToks === raw, s"$src: a fully-open gate keeps everything")
      else {
        assert(keptDocs > 0, s"$src: a nonzero rate must keep some docs at 10x")
        val dev = math.abs(keptToks - target).toDouble / target
        assert(dev <= 0.15,
          s"$src: achieved $keptToks vs target $target deviates ${dev * 100}%")
      }
    }
  }

  test("d32 retraction at sf0.1: the affected-cluster fold equals the full rebuild on the 10x live corpus") {
    // the oracle pins sf0.01; at sf0.1 the Spark-side rebuild twin
    // (cluster table over the live corpus's own pair plan) is the exact
    // bar — not a qualitative floor but row-for-row equality at 10x
    import org.apache.spark.sql.functions.col
    val Dd = graft.queries.Dedup
    val got = Dd.d32ClusterRetraction(spark, sf01).localCheckpoint()
    val liveDocs = Tables.documents(spark, sf01)
      .filter(!Dd.d32Retracted(col("doc_id")))
    val bands = Dd.bandTableOf(liveDocs).localCheckpoint()
    val want = Dd.clusterTableOf(liveDocs.select("doc_id"),
      Dd.candidatePairsPlan(bands))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "retraction fold must equal the live rebuild at sf0.1")
    // and the fixture must still exercise a real retraction at 10x
    assert(got.count() < Tables.documents(spark, sf01).count())
  }

  test("t44/p12 extraction at sf0.1: per-doc accounting closes and the keep gate still discriminates") {
    val rows = graft.queries.TextOps.t44ContentExtract(spark, sf01).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    rows.foreach { case (nLines, nKept, nDropped, keptToks) =>
      assert(nKept + nDropped === nLines, "line accounting must close")
      assert(keptToks >= 0 && (nKept > 0 || keptToks == 0))
    }
    // boilerplate planting is residue-driven, so the drop share stays in
    // a stable band at any scale (2 of 7 residues + short-tail lines)
    val dropShare = rows.map(_._3).sum.toDouble / rows.map(_._1).sum
    assert(dropShare > 0.2 && dropShare < 0.5,
      s"drop share $dropShare drifted out of the planting band at 10x")
    val keeps = graft.queries.TextOps.p12CleanChain(spark, sf01)
      .groupBy("keep").count().collect()
      .map(r => (r.getBoolean(0), r.getLong(1))).toMap
    assert(keeps.getOrElse(true, 0L) > 0 && keeps.getOrElse(false, 0L) > 0,
      s"the p12 gate must keep discriminating at 10x: $keeps")
  }

  test("n30 drift report at sf0.1: pseudo-slices of a stationary corpus stay near the baseline; skew is sane") {
    val rows = graft.queries.Similarity.n30CodebookDrift(spark, sf01).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(5), r.getLong(6)))
    assert(rows.length === graft.queries.Similarity.IvfMonitorBatches)
    rows.foreach { case (b, n, skewBp, driftBp) =>
      assert(n > 0)
      // a uniform pseudo-slice of a STATIONARY corpus cannot drift far
      // from the whole-corpus baseline (generous ±20% band; a drifted
      // INGEST is what moves this — s42's spec pins that direction)
      assert(driftBp > 8000 && driftBp < 12000,
        s"slice $b drift $driftBp bp implausible for a stationary corpus")
      // max list is never below the uniform share
      assert(skewBp >= 10000, s"slice $b skew $skewBp below uniform share")
    }
  }

  test("m15 GC planning at sf0.1: freed and shared accounting stays consistent per media") {
    val rows = graft.operators.Multimodal.m15GcReport(spark, sf01).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (nSlots, slotBytes, nFreed, freedBytes, nShared, sharedBytes) =>
      assert(nSlots > 0 && slotBytes > 0)
      // a media's distinct chunks bound both attributions; bytes follow
      assert(nFreed <= nSlots && nShared <= nSlots)
      assert(freedBytes <= slotBytes && sharedBytes <= slotBytes)
      assert((nFreed == 0) == (freedBytes == 0))
      assert((nShared == 0) == (sharedBytes == 0))
    }
    // the 10x corpus must still exercise the physical-reclaim path
    assert(rows.map(_._3).sum > 0, "no chunk freed at 10x — fixture went blind")
  }

  test("p08 split leakage at sf0.1: near-dup leakage dominates exact; rates stay plausible") {
    // measured at sf0.1: test 3 exact / 44 near (59/878 bp),
    //                    val  0 exact / 37 near (0/756 bp)
    val rows = graft.queries.Dedup.p08SplitLeakage(spark, sf01).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).sorted.toSeq === Seq("test", "val"))
    rows.foreach { case (split, nDocs, exact, near, exactBp, nearBp) =>
      assert(nDocs > 0)
      // exact twins share every band, so exact leaks are near leaks too
      assert(near >= exact,
        s"$split: near-dup leakage ($near) must dominate exact ($exact)")
      assert(nearBp < 5000,
        s"$split: leakage rate $nearBp bp implausibly high — diagnostic inverted?")
    }
    // the naive doc-hash split must keep FINDING leakage on a 10× corpus —
    // a zero here means the diagnostic went blind, not that leakage vanished
    assert(rows.map(_._4).sum > 0, "the diagnostic must surface near-dup leakage")
  }

  test("t45 decontamination at sf0.1: token accounting closes per doc; the rewrite keeps firing at 10x") {
    val rows = graft.queries.TextOps.t45DecontamRewrite(spark, sf01)
      .selectExpr("doc_id", "n_spans", "tokens_removed", "clean_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (id, spans, removed, kept) =>
      assert(kept >= 0, s"doc $id removed more tokens than it had")
      assert((spans == 0) == (removed == 0),
        s"doc $id: spans and removal must agree")
      // each merged island removes at least one token; a K-token floor
      // would be wrong (a doc-end window can be shorter than K)
      assert(removed >= spans,
        s"doc $id: $spans islands cannot remove only $removed tokens")
    }
    assert(rows.count(_._2 > 0) > 0,
      "the 10x corpus must still contain contaminated docs — a zero means " +
        "the detector went blind, not that contamination vanished")
  }

  test("n32 filter strategies at sf0.1: pre is exact, post may starve but never exceeds k, probe recall is bounded by pre") {
    val rows = graft.queries.Similarity.n32FilterStrategies(spark, sf01)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val k = graft.queries.Similarity.TopK.toLong
    assert(rows("pre") === ((k, k)), "pre IS the truth leg — exact by construction")
    val (postRet, postHits) = rows("post")
    assert(postRet <= k && postHits <= postRet,
      s"post returns at most k and hits at most what it returns: $rows")
    val (probeRet, probeHits) = rows("probe")
    assert(probeRet <= k && probeHits <= k, s"probe bounds: $rows")
  }

  test("m17 scene cuts at sf0.1: within-scene jitter never fakes a cut; the true boundary is found almost everywhere") {
    val cuts = graft.operators.Multimodal.m17SceneCuts(spark, sf01)
      .selectExpr("n_cuts").collect().map(_.getLong(0))
    assert(cuts.forall(_ <= 1),
      "within-scene jitter moves <= 2 bits — a second cut is impossible")
    assert(cuts.count(_ == 1) * 100 >= cuts.length * 99,
      s"at least 99% of clips must find their one true boundary " +
        s"(got ${cuts.count(_ == 1)}/${cuts.length})")
  }

  test("n31 dimension sweep at sf0.1: recall is monotone in the dim budget; the full-dim leg stays exact") {
    // measured at sf0.1: hits10 = 1 / 3 / 10 across dims 16 / 32 / 64
    val rows = graft.queries.Similarity.n31DimSweep(spark, sf01).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    assert(rows.map(_._1).toSeq ===
      graft.queries.Similarity.DimSweep.toSeq)
    rows.sliding(2).foreach { case Array((m1, h1), (m2, h2)) =>
      assert(h2 >= h1,
        s"recall must not shrink with more dims ($m1:$h1 → $m2:$h2)")
    }
    assert(rows.last._2 === graft.queries.Similarity.TopK.toLong,
      "the full-dim leg is exact by construction — anything less means " +
        "the truth leg drifted")
  }

  test("q198 k-anonymity at sf0.1: risk is monotone in k; accounting closes against the class table") {
    // measured at sf0.1: 30 QI classes; users at risk 3 / 18 / 32 and
    // risk_bp 20 / 120 / 213 at k = 2 / 5 / 10
    val rows = graft.queries.Extras.q198KAnonymity(spark, sf01).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    rows.sliding(2).foreach {
      case Array((k1, n1, c1, u1, b1), (k2, n2, c2, u2, b2)) =>
        assert(n1 === n2, "the class table is k-independent")
        assert(c2 >= c1 && u2 >= u1 && b2 >= b1,
          s"risk must be monotone in k ($k1→$k2)")
    }
    rows.foreach { case (k, nClasses, cRisk, uRisk, bp) =>
      assert(cRisk <= nClasses, s"k=$k: sub-k classes exceed class count")
      assert(uRisk >= cRisk, s"k=$k: a sub-k class has at least one member")
      assert(uRisk < (k - 1).toLong * nClasses + 1,
        s"k=$k: $uRisk at-risk users exceed the (k-1)·classes ceiling")
      assert(bp <= 10000, s"k=$k: risk share $bp bp out of range")
    }
  }

  test("q199 retention plan at sf0.1: per-type accounting closes and the window ordering holds") {
    val rows = graft.queries.Extras.q199RetentionPlan(spark, sf01).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val total = Tables.events(spark, sf01).count()
    assert(rows.map(r => r._4 + r._5).sum === total,
      "delete + keep must cover every event exactly once")
    // a longer window can only delete fewer of the same type-free stream;
    // across types the densities differ, so pin the per-type bound only:
    // nothing deletable may sit at or past the cutoff
    rows.foreach { case (t, days, cutoff, del, keep) =>
      assert(days > 0 && del >= 0 && keep > 0, s"$t accounting broken")
    }
    // the report must discriminate: at least two distinct windows exist
    // and something is deletable at 10×
    assert(rows.map(_._2).distinct.size >= 2, "windows must differ by type")
    assert(rows.map(_._4).sum > 0, "a month-long corpus must have trim work")
  }

  test("p15 curation funnel at sf0.1: gates are monotone per source, accounting closes, and every gate fires somewhere") {
    val rows = graft.queries.Dedup.p15CurationFunnel(spark, sf01).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.map(_._2).sum === docCount,
      "every document enters the funnel exactly once")
    rows.foreach { case (src, n0, n1, n2, n3, n4, toks, bp) =>
      assert(n0 >= n1 && n1 >= n2 && n2 >= n3 && n3 >= n4,
        s"$src: cumulative gates can only shrink the corpus")
      assert(bp === n4 * 10000 / n0, s"$src: retention accounting")
      assert(n4 == 0 || toks > 0, s"$src: survivors carry tokens")
    }
    // at 10x every gate must be doing real work SOMEWHERE (a gate that
    // passes everything is a disconnected rule)
    assert(rows.map(r => r._2 - r._3).sum > 0, "lang gate fires")
    assert(rows.map(r => r._3 - r._4).sum > 0, "quality gate fires")
    assert(rows.map(r => r._5 - r._6).sum > 0, "near-dup gate fires")
  }

  test("d34 source overlap at sf0.1: attribution is ordered and closes against the pair table") {
    val rows = graft.queries.Dedup.d34SourceOverlap(spark, sf01).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, n, da, db) =>
      assert(a <= b, "cells are unordered-pair keyed")
      assert(da >= 1 && db >= 1 && da <= n && db <= n,
        s"($a,$b): endpoint counts bounded by the pair count")
    }
    val totalPairs = graft.queries.Dedup.d01MinhashLsh(spark, sf01).count()
    assert(rows.map(_._3).sum === totalPairs,
      "every candidate pair attributes to exactly one source cell")
  }

  test("m18 PNG decode at sf0.1: every media row decodes with the fixture geometry") {
    val rows = graft.operators.Multimodal.m18PngDecode(spark, sf01).collect()
    assert(rows.length.toLong === docCount)
    rows.foreach { r =>
      assert(r.getLong(1) === graft.operators.Multimodal.PngW.toLong &&
        r.getLong(2) === graft.operators.Multimodal.PngH.toLong)
      assert(r.getLong(3) > 0L, "a non-trivial raster has pixel mass")
    }
  }

  test("t48/d35/n33 governance reports at sf0.1: shares close, bounds hold") {
    // t48: novelty is a share (≤ 10000 bp) and the novel counts cover
    // every distinct shingle exactly once across sources
    val t = graft.queries.TextOps.t48SourceNovelty(spark, sf01).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    t.foreach { case (src, nsh, nnov, bp) =>
      assert(nnov <= nsh && bp <= 10000, s"$src: novelty bounds")
    }
    assert(t.map(_._3).sum > 0, "someone introduces content")
    // d35: before-shares and after-shares each sum to ~10000 bp (integer
    // truncation can only lose < #cells bp), and the deltas sum to ~0
    val d = graft.queries.Dedup.d35DedupBias(spark, sf01).collect()
      .map(r => (r.getLong(4), r.getLong(5), r.getLong(6)))
    val cells = d.length
    assert(math.abs(d.map(_._1).sum - 10000L) < cells.toLong)
    assert(math.abs(d.map(_._2).sum - 10000L) < cells.toLong)
    assert(math.abs(d.map(_._3).sum) < 2L * cells,
      "share deltas must net out to ~zero")
    assert(d.exists(_._3 != 0L), "dedup must genuinely shift some cell at 10x")
    // n33: buckets in range, shares close, and the distribution is not
    // degenerate (more than one occupied cell)
    val n = graft.queries.Similarity.n33CosHistogram(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    n.foreach { case (b, cnt, bp) =>
      assert(b >= 0 && b <= 19 && cnt > 0 && bp <= 10000)
    }
    assert(n.length >= 2, "a real embedding corpus spreads over buckets")
    assert(math.abs(n.map(_._3).sum - 10000L) < n.length.toLong)
  }

  test("p14 takedown report at sf0.1: the state accounting closes across families") {
    val r = graft.queries.Dedup.p14TakedownExecuteReport(spark, sf01).head()
    val (docsLive, hashLive, vecsLive) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    val (chunksLive, reclaimed, clustersLive, goldensLive) =
      (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    assert(docsLive === Tables.documents(spark, sf01)
      .filter("doc_id % 7 <> 3").count())
    assert(hashLive <= docsLive, "dedup index is at most the live corpus")
    assert(vecsLive === Tables.embeddings(spark, sf01)
      .filter("vec_id % 7 <> 3").count())
    assert(clustersLive <= docsLive && goldensLive <= clustersLive)
    assert(chunksLive > 0 && reclaimed > 0,
      "a 1-in-7 takedown at 10x must both keep and reclaim chunks")
  }
}
