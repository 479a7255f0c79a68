package graft

import graft.queries.{Similarity, UdfOps}

/** Similarity-search semantics on the sf0.001 embeddings + sketch bounds. */
class SimilaritySpec extends SparkSpec {

  test("q33 brute-force kNN: scores sorted desc, self excluded, k rows") {
    val rows = Similarity.q33SimilarityKnn(spark, sf).collect()
    assert(rows.length === Similarity.TopK)
    val cos = rows.map(_.getDouble(2))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    assert(!rows.exists(_.getLong(0) == 0L))
    assert(cos.forall(c => c >= -1.0001 && c <= 1.0001))
  }

  test("n01 ANN results are a subset of the query bucket, exact-scored") {
    val exact = Similarity.q33SimilarityKnn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ann = Similarity.n01AnnLsh(spark, sf).collect()
    // every ANN hit's cosine matches the exact computation bit-for-bit
    ann.foreach { r =>
      val (id, cos) = (r.getLong(0), r.getDouble(3))
      exact.get(id).foreach(e => assert(e === cos))
    }
    // ANN candidates all share the query's bucket
    assert(ann.map(_.getInt(1)).distinct.length <= 1)
  }

  test("n02 IVF results are exact-scored members of the query's list") {
    val exact = Similarity.q33SimilarityKnn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ivf = Similarity.n02AnnIvf(spark, sf).collect()
    assert(ivf.nonEmpty && ivf.length <= Similarity.TopK)
    // all probed hits share one centroid and any overlap with the exact
    // top-k carries the identical (bit-for-bit) cosine
    assert(ivf.map(_.getLong(1)).distinct.length === 1)
    ivf.foreach { r =>
      exact.get(r.getLong(0)).foreach(e => assert(e === r.getDouble(3)))
    }
  }

  test("d04 near-dup pairs are symmetric-free and above threshold") {
    val rows = Similarity.d04EmbedNearDup(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1)) // canonical ordering, no dupes
    }
  }

  test("x01 approx distinct within 3*rsd of exact") {
    val approx = UdfOps.x01ApproxDistinct(spark, sf).collect()(0).getLong(0)
    val exact = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(math.abs(approx - exact).toDouble / exact <= 0.15,
      s"approx $approx vs exact $exact")
  }

  test("n06 PQ: codebook vectors encode to themselves with zero error") {
    // seed vectors ARE the sub-codebooks, so each must quantize to its own
    // id in every subspace with dist2 == 0 — the invariant that catches a
    // wrong slice offset or a broken argmin instantly
    val rows = graft.queries.Similarity.n06PqCodes(spark, sf)
      .filter(org.apache.spark.sql.functions.col("vec_id") <
        graft.queries.Similarity.NumCentroids)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("code") === r.getAs[Long]("vec_id"), r.toString)
      assert(r.getAs[Long]("dist2") === 0L, r.toString)
    }
  }

  test("x02 approx quantiles land within the exact ±1% percentile band") {
    // The query itself now emits the bounded-property booleans (its
    // driver-visible oracle contract); the spec checks both hold AND
    // re-derives the raw 5%-of-exact bound the plan originally promised.
    val row = graft.queries.Extended.x02ApproxQuantile(spark, sf).collect()(0)
    assert(row.getAs[Boolean]("p50_in_band"), "p50 estimate outside [p49, p51]")
    assert(row.getAs[Boolean]("p95_in_band"), "p95 estimate outside [p94, p96]")
    // the band itself must be ordered and positive (it is also
    // hash-verified against the DuckDB oracle in Verify)
    assert(row.getAs[Double]("p49") <= row.getAs[Double]("p51"))
    assert(row.getAs[Double]("p94") <= row.getAs[Double]("p96"))
    assert(row.getAs[Double]("p49") > 0.0)
    val approx = Tables.lineitem(spark, sf)
      .selectExpr(
        "percentile_approx(l_extendedprice, 0.5, 1000)",
        "percentile_approx(l_extendedprice, 0.95, 1000)")
      .collect()(0)
    val exact = Tables.lineitem(spark, sf)
      .selectExpr("percentile(l_extendedprice, 0.5)", "percentile(l_extendedprice, 0.95)")
      .collect()(0)
    assert(math.abs(approx.getDouble(0) - exact.getDouble(0)) / exact.getDouble(0) <= 0.05)
    assert(math.abs(approx.getDouble(1) - exact.getDouble(1)) / exact.getDouble(1) <= 0.05)
  }

  test("u02 UDAF minhash: group signature equals min over member doc sigs") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    // signature of the union == elementwise min of per-doc signatures
    val perDoc = graft.queries.Dedup.minhashSignatures(docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
    val expected = perDoc.groupBy("lang")
      .agg(min("s0").as("m0"), min("s1").as("m1"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = UdfOps.u02UdafMinhash(spark, sf).collect()
      .groupBy(_.getString(0)).map { case (lang, rs) =>
        val byIdx = rs.map(r => r.getInt(1) -> r.getLong(2)).toMap
        lang -> (byIdx(0), byIdx(1))
      }
    assert(got === expected)
  }

  test("n12 kNN join: <=k rows per query, within-list, exact-scored, no self") {
    val rows = Similarity.n12KnnJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getLong(0))
    byQuery.foreach { case (qid, rs) =>
      assert(qid % Similarity.KnnJoinStride === 0)
      assert(rs.length <= Similarity.KnnJoinK)
      // neighbors are candidates (never queries, never the query itself)
      assert(rs.forall(_.getLong(1) % Similarity.KnnJoinStride != 0))
      // sorted desc within the query (presentation order), list-coherent
      val cos = rs.map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    // each (query, neighbor) pair shares the neighbor's IVF list: the cid
    // column is the JOIN key, so it must equal the query's assigned list
    val qCid = Similarity.n12KnnJoin(spark, sf)
      .select("query_id", "cid").distinct().collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    qCid.values.foreach(cids => assert(cids.size === 1))
  }

  test("x07 KMV mergeability: sketch(A ∪ B) == kmin(sketch(A) ∪ sketch(B))") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextHash
    // arbitrary disjoint split of one key population — the sharding a
    // 100 TB run would do; the union sketch from per-shard sketches must
    // equal the sketch built over the whole population
    val k = graft.queries.ScaleOps.KmvK
    val all = Tables.orders(spark, sf)
      .select(expr(TextHash.sparkHash56("cast(o_custkey as string)")).as("h"))
      .distinct().cache()
    val sa = all.filter(col("h") % 3 === 0).orderBy("h").limit(k)
    val sb = all.filter(col("h") % 3 =!= 0).orderBy("h").limit(k)
    val merged = sa.union(sb).orderBy("h").limit(k)
      .collect().map(_.getLong(0)).toSeq
    val direct = all.orderBy("h").limit(k)
      .collect().map(_.getLong(0)).toSeq
    assert(merged === direct)
  }

  test("n13 mutual kNN: canonical pairs, strictly mutual, symmetric-scored") {
    val edges = Similarity.n13MutualKnn(spark, sf).collect()
    assert(edges.nonEmpty)
    edges.foreach(r => assert(r.getLong(0) < r.getLong(1)))
    // no duplicate pairs
    val pairs = edges.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length === pairs.length)
    // mutual ⊆ directed-top-k in BOTH directions: rebuild one direction's
    // neighborhood per source from the mutual set and check k-bound
    val bySrc = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.length).toMap
    bySrc.values.foreach(n => assert(n <= Similarity.KnnJoinK))
  }

  test("n22 graph ANN: monotone convergence, cost ceiling, full recall by the hop budget") {
    val rows = Similarity.n22GraphAnn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === (0 to Similarity.BeamHops).toSeq)
    // the cumulative scored set, best cosine, and recall can only grow
    rows.sliding(2).foreach { case Array((_, n0, b0, h0), (_, n1, b1, h1)) =>
      assert(n1 >= n0, "n_scored must be cumulative")
      assert(b1 >= b0, "best cosine can only improve")
      assert(h1 >= h0, "recall over a growing scored set can only improve")
    }
    // cost ceiling: seeds + hops * beam * max-degree (degree <= 2k after
    // symmetrization) — the bounded-walk property that makes graph ANN a
    // serving-path index
    val ceiling = Similarity.BeamSeeds + Similarity.BeamHops *
      Similarity.BeamWidth * 2 * Similarity.KnnJoinK
    rows.foreach { case (_, n, _, _) => assert(n <= ceiling, s"$n > $ceiling") }
    // high recall within the hop budget: >= 8/10 here (sf0.001; the
    // sf0.01 oracle fixture reaches 10/10 by hop 4) and strictly above
    // the entry hop — the approximate-but-navigable property the
    // hop/beam knobs were sized for
    assert(rows.last._4 >= 8L,
      s"expected recall >= 8/10 at hop ${Similarity.BeamHops}, got ${rows.last._4}")
    assert(rows.last._4 > rows.head._4, "the walk must improve on its seeds")
  }

  test("n23 layered vs hub entry: both monotone, equal final recall, layered no costlier") {
    val byMode = Similarity.n23LayeredAnn(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(3), r.getLong(5)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(byMode.keySet === Set("hub", "layered"))
    for ((mode, rows) <- byMode) {
      assert(rows.map(_._2).toSeq === (0 to Similarity.BeamHops).toSeq, mode)
      rows.sliding(2).foreach { case Array((_, _, n0, h0), (_, _, n1, h1)) =>
        assert(n1 >= n0 && h1 >= h0, s"$mode must be cumulative/monotone")
      }
    }
    // the routing layer must never HURT: converged recall at least
    // hub's (sf0.001: layered 9 vs hub 8; sf0.01: 10 vs 10) at no more
    // scored candidates — the "pay for a top layer" trade
    assert(byMode("layered").last._4 >= byMode("hub").last._4,
      s"layered entry converged below hub entry: " +
        s"${byMode("layered").last._4} < ${byMode("hub").last._4}")
    assert(byMode("layered").last._3 <= byMode("hub").last._3,
      "layered entry must not score more of the corpus than hub entry")
  }

  test("n24 batched beam: query 0's walk equals n22's single-query walk; all walks monotone") {
    // query 0's per-hop rows must be IDENTICAL to n22's report — the
    // batched spelling changes how many walks advance per join, never
    // what one walk computes (self-exclusion == n22's vec-0 exclusion
    // for query 0, seed sets provably equal)
    val batched = Similarity.n24BatchedBeam(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5)))
    val q0 = batched.filter(_._1 == 0L).sortBy(_._2)
      .map { case (_, hop, n, b, h, rbp) => (hop, n, b, h, rbp) }
    val single = Similarity.n22GraphAnn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getDouble(3), r.getLong(4),
        r.getLong(5))).sortBy(_._1)
    assert(q0.toSeq === single.toSeq,
      "batched walk diverged from the single-query walk for query 0")
    // every query's walk is monotone and hop-complete
    val byQ = batched.groupBy(_._1)
    assert(byQ.keySet === (0 until Similarity.BatchQueries)
      .map(_.toLong * Similarity.KnnJoinStride).toSet)
    for ((q, rows) <- byQ) {
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (0 to Similarity.BeamHops).toSeq)
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(b._3 >= a._3 && b._4 >= a._4 && b._5 >= a._5,
          s"query $q walk must be cumulative/monotone")
      }
    }
  }

  test("n26 persisted-graph serving equals n24's in-session batched walk row-for-row") {
    val served = Similarity.n26GraphServe(spark, sf).collect()
      .map(_.toSeq.map(String.valueOf))
    val built = Similarity.n24BatchedBeam(spark, sf).collect()
      .map(_.toSeq.map(String.valueOf))
    assert(served.toSeq === built.toSeq,
      "the graph-index round trip must be lossless")
  }

  test("n29 persisted PQ index serves exactly what the in-query build serves (== n20)") {
    val served = Similarity.n29PqPersist(spark, sf).collect()
      .map(_.toSeq.map(String.valueOf))
    val built = Similarity.n20Ivfpq(spark, sf).collect()
      .map(_.toSeq.map(String.valueOf))
    assert(served.toSeq === built.toSeq,
      "the PQ-index round trip must be lossless")
  }

  test("n28 on-demand scoring equals n24's lookup-table walk row-for-row") {
    // the serving contract (score only visited nodes, per-hop broadcast
    // point fetch) must compute the identical IEEE doubles as the
    // materialized batch×corpus score table — bit-equal report or the
    // two paths have drifted
    val onDemand = Similarity.n28OndemandBeam(spark, sf).collect()
      .map(_.toSeq.map(String.valueOf))
    val lookup = Similarity.n24BatchedBeam(spark, sf).collect()
      .map(_.toSeq.map(String.valueOf))
    assert(onDemand.toSeq === lookup.toSeq,
      "on-demand visited-node scoring must equal the full-pass lookup")
  }

  test("n27 Lloyd iterations: inertia non-increasing, full assignment every round") {
    val rows = Similarity.n27KmeansIter(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1 to Similarity.KmeansRounds).toSeq)
    val n = rows.head._2
    rows.foreach { case (_, na, inertia, moved) =>
      assert(na === n, "every round must assign the whole corpus")
      assert(inertia >= 0L && moved >= 0L)
    }
    // Lloyd monotonicity: each round's inertia can only improve (the
    // update step minimizes within-cluster SSE for the fixed assignment;
    // the floored-mean centroid stays within the exact mean's cell here)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3,
        s"inertia rose between rounds: ${a._3} -> ${b._3}")
    }
    assert(rows.head._4 === 0L, "round 1 has no previous assignment")
  }

  test("n25 persisted index serves exactly what the in-query build serves (== n14)") {
    val served = Similarity.n25IndexPersist(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val built = Similarity.n14IvfNprobe(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(served.toSeq === built.toSeq,
      "the written-index round trip must be lossless (x16's discipline)")
  }
}
