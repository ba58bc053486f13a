package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // same planted-cluster shape as SimilaritySpec: 16 dims, in-cluster
  // cosine ≈ 0.96-0.99 over random background
  private def clusteredCorpus(nClusters: Int, members: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    val dim = 16
    def unit(v: Array[Double]) = { val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n) }
    val rows = for {
      c <- 0 until nClusters
      center = unit(Array.fill(dim)(rnd.nextGaussian()))
      m <- 0 until members
    } yield {
      val noisy = unit(center.zip(Array.fill(dim)(rnd.nextGaussian() * 0.05))
        .map { case (a, b) => a + b })
      ((c * members + m).toLong, noisy.map(_.toFloat).toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }
  private lazy val clustered = clusteredCorpus(20, 12, 42)
  private lazy val local: Map[Long, Array[Float]] = clustered.collect()
    .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  test("train/encode: m*k codebooks, m codes per vector, codes in range") {
    val books = Pq.train(clustered, "vec_id", "embedding", m = 4, k = 16, iters = 3)
    val rows = books.collect()
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).distinct.length == rows.length)
    assert(rows.map(_.getInt(0)).toSet == Set(0, 1, 2, 3))
    assert(rows.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= 16))
    assert(rows.forall(_.getSeq[Float](2).length == 4)) // dsub = 16/4
    val codes = Pq.encode(clustered, "vec_id", "embedding", books).collect()
    assert(codes.length == 240)
    // 4 small codes replace 16 float32 dims — the compression the
    // method exists for
    assert(codes.forall(_.getSeq[Int](1).length == 4))
    assert(codes.forall(_.getSeq[Int](1).forall(c => c >= 1 && c <= 16)))
  }

  test("ADC candidate quality: retrieved top-5 stay in the query's cluster; quantization error is small") {
    // PQ is a CANDIDATE-GENERATION compressor: every member of a planted
    // cluster quantizes to (nearly) the same codes, so ADC cannot — and
    // need not — resolve the fine ranking WITHIN a cluster (ties broken
    // by id). The property the method is used for is that the retrieved
    // set lands in the right cluster, the exact-rerank step's input.
    val books = Pq.train(clustered, "vec_id", "embedding", m = 4, k = 16, iters = 3)
    val codes = Pq.encode(clustered, "vec_id", "embedding", books).localCheckpoint(true)
    val queries = (0 until 10).map(c => (c * 12).toLong) // one per cluster
    val purities = queries.map { qid =>
      val got = Pq.adcTopK(codes.where(col("vec_id") =!= qid), "vec_id",
        local(qid), books, k = 5).collect().map(_.getLong(0))
      got.count(id => id / 12 == qid / 12).toDouble / got.length
    }
    val purity = purities.sum / purities.size
    // and the fine-ranking recall, recorded for the record (ties make
    // it ~membership-random; the rerank step restores it)
    def exactL2Top5(q: Array[Float], self: Long): Seq[Long] =
      local.toSeq.filter(_._1 != self).map { case (id, v) =>
        id -> v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sortBy { case (id, d) => (d, id) }.take(5).map(_._1)
    val recalls = queries.map { qid =>
      val got = Pq.adcTopK(codes.where(col("vec_id") =!= qid), "vec_id",
        local(qid), books, k = 5).collect().map(_.getLong(0)).toSet
      val want = exactL2Top5(local(qid), qid)
      want.count(got).toDouble / want.size
    }
    info(f"PQ ADC cluster purity@5 = $purity%.4f, within-cluster recall@5 = ${recalls.sum / recalls.size}%.4f (10 queries, m=4 k=16)")
    assert(purity >= 0.9, f"ADC top-5 cluster purity = $purity%.4f")
    // quantization error: mean ADC self-distance (vector vs its own
    // codes) is bounded by the in-cluster spread — the codes still
    // carry the cluster geometry after 32x size reduction
    def meanSelfErr(bk: org.apache.spark.sql.DataFrame,
                    cd: org.apache.spark.sql.DataFrame): Float = {
      val errs = queries.map { qid =>
        Pq.adcTopK(cd.where(col("vec_id") === qid), "vec_id",
          local(qid), bk, k = 1).collect().head.getFloat(1)
      }
      errs.sum / errs.size
    }
    // k=16 codes must merge some of the 20 planted cluster centers per
    // subspace, so the error sits above the 0.05-noise radius but far
    // below the ~2.0 cross-cluster distance; doubling the codebook
    // resolves the merges and the error must drop with it — the
    // code-budget/accuracy dial PQ exists to turn
    val err16 = meanSelfErr(books, codes)
    val books32 = Pq.train(clustered, "vec_id", "embedding", m = 4, k = 32, iters = 3)
    val codes32 = Pq.encode(clustered, "vec_id", "embedding", books32)
      .localCheckpoint(true)
    val err32 = meanSelfErr(books32, codes32)
    info(f"mean ADC self-quantization d2: k=16 $err16%.5f -> k=32 $err32%.5f")
    assert(err16 < 0.5f, f"k=16 quantization error $err16%.5f")
    assert(err32 < err16, f"k=32 ($err32%.5f) must beat k=16 ($err16%.5f)")
  }

  test("IVFADC + exact rerank: full-probe equals brute force; pruned probes keep recall") {
    def exactTop(q: Array[Float], self: Long, k: Int): Seq[Long] =
      local.toSeq.filter(_._1 != self).map { case (id, v) =>
        id -> v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sortBy { case (id, d) => (d, id) }.take(k).map(_._1)
    val corpus = clustered.where(col("vec_id") =!= 0L)
    val q = local(0L)
    // nProbe = numCentroids and candidate pool = corpus: nothing is
    // pruned and the rerank is EXACT — must equal brute force id-for-id
    val full = Pq.ivfAdcTopK(corpus, "vec_id", "embedding", q, k = 5,
      m = 4, codesPerSub = 16, numCentroids = 8, nProbe = 8,
      candidates = 239).collect().map(_.getLong(0)).toSeq
    assert(full == exactTop(q, 0L, 5), s"full-probe IVFADC $full != brute")
    // pruned probes: the rerank restores the fine ranking ADC ties away
    // (plain ADC recall@5 here is ~0.54 — see the purity test)
    val recalls = (0 until 8).map { c =>
      val qid = (c * 12).toLong
      val got = Pq.ivfAdcTopK(clustered.where(col("vec_id") =!= qid),
        "vec_id", "embedding", local(qid), k = 5,
        m = 4, codesPerSub = 16, numCentroids = 8, nProbe = 3,
        candidates = 40).collect().map(_.getLong(0)).toSet
      val want = exactTop(local(qid), qid, 5)
      want.count(got).toDouble / want.size
    }
    val recall = recalls.sum / recalls.size
    info(f"IVFADC+rerank recall@5 = $recall%.4f (8 queries, nProbe 3/8, 40 candidates)")
    assert(recall >= 0.9, f"IVFADC recall@5 = $recall%.4f")
  }

  test("residual IVFADC: full-probe equals brute force; residual codes beat plain ADC at the same budget") {
    def exactTop(q: Array[Float], self: Long, k: Int): Seq[Long] =
      local.toSeq.filter(_._1 != self).map { case (id, v) =>
        id -> v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sortBy { case (id, d) => (d, id) }.take(k).map(_._1)
    val corpus = clustered.where(col("vec_id") =!= 0L)
    val q = local(0L)
    // nothing pruned + exact rerank over everything → brute force
    val full = Pq.ivfAdcResidualTopK(corpus, "vec_id", "embedding", q, k = 5,
      m = 4, codesPerSub = 16, numCentroids = 8, nProbe = 8,
      candidates = 239).collect().map(_.getLong(0)).toSeq
    assert(full == exactTop(q, 0L, 5), s"full-probe residual IVFADC $full != brute")
    // ADC fidelity at a fixed code budget: full probe + a candidate pool
    // barely above k means the rerank can only fix what ADC put in the
    // pool, so recall isolates CODE quality. Residual energy ≪ vector
    // energy on clustered data, so the same m×k grid quantizes finer
    // and the residual form must not lose to the plain one.
    // numCentroids ~ the planted cluster count puts each cell near one
    // cluster center, so residuals are the 0.05-noise offsets — the
    // textbook case where the residual grid is much finer than a
    // whole-sphere grid at the same m×k budget
    def poolRecall(residual: Boolean): Double = {
      val rs = (0 until 10).map { c =>
        val qid = (c * 12).toLong
        val body = clustered.where(col("vec_id") =!= qid)
        val got = (if (residual)
            Pq.ivfAdcResidualTopK(body, "vec_id", "embedding", local(qid),
              k = 5, m = 4, codesPerSub = 16, numCentroids = 16, nProbe = 16,
              candidates = 8)
          else
            Pq.ivfAdcTopK(body, "vec_id", "embedding", local(qid),
              k = 5, m = 4, codesPerSub = 16, numCentroids = 16, nProbe = 16,
              candidates = 8)).collect().map(_.getLong(0)).toSet
        val want = exactTop(local(qid), qid, 5)
        want.count(got).toDouble / want.size
      }
      rs.sum / rs.size
    }
    val plain = poolRecall(residual = false)
    val resid = poolRecall(residual = true)
    info(f"tight-pool recall@5: plain ADC $plain%.4f -> residual ADC $resid%.4f (full probe, 8 candidates, 10 queries)")
    // one retrieved hit = 0.02 recall here; residual must not lose by
    // more than sampling noise and must clear an absolute bar
    assert(resid >= plain - 0.021, f"residual ($resid%.4f) lost to plain ($plain%.4f)")
    assert(resid >= 0.75, f"residual tight-pool recall@5 = $resid%.4f")
  }

  private def exactTopK(q: Array[Float], self: Long, k: Int): Seq[Long] =
    local.toSeq.filter(_._1 != self).map { case (id, v) =>
      id -> v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
    }.sortBy { case (id, d) => (d, id) }.take(k).map(_._1)

  test("PqIndex: loaded search equals in-memory search id-for-id; full probe equals brute force") {
    val corpus = clustered.where(col("vec_id") =!= 0L)
    val q = local(0L)
    val idx = PqIndex.build(corpus, "vec_id", "embedding",
      m = 4, codesPerSub = 16, numCentroids = 8, iters = 3)
    def run(i: PqIndex, nProbe: Int, cand: Int) =
      i.search(corpus, "vec_id", "embedding", q, k = 5,
          nProbe = nProbe, candidates = cand)
        .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    val mem = run(idx, 3, 40)
    val dir = java.nio.file.Files.createTempDirectory("graft-pqidx").toString
    idx.write(dir)
    val loaded = PqIndex.load(spark, dir)
    // round-trip parity: same ids AND same exact-rerank distances — the
    // stored centroids/codebooks/codes reproduce the in-memory search
    // bit-for-bit (floats survive parquet exactly)
    assert(run(loaded, 3, 40) == mem, "loaded search != in-memory search")
    // nothing pruned + rerank over everything → brute force id-for-id
    val full = run(loaded, 8, 239).map(_._1)
    assert(full == exactTopK(q, 0L, 5), s"full-probe loaded search $full != brute")
    // the loaded codes table must be served through the bucketed
    // catalog entry (exchange-free probe scans), not a plain file scan
    assert(spark.catalog.tableExists(PqIndex.codesTable(dir)))
  }

  test("PqIndex.searchBatch: inline-codebook ADC equals the per-query LUT path; excludeSelf; full-probe+rerank == brute force") {
    val idx = PqIndex.build(clustered, "vec_id", "embedding",
      m = 4, codesPerSub = 16, numCentroids = 8, iters = 3)
    // parity with the single-query LUT path: same ids, same distances
    // (both sum float squared-diffs per subspace then across subspaces)
    val qids = Seq(0L, 24L, 120L)
    val qFrame = clustered.where(col("vec_id").isin(qids: _*))
    val batch = idx.searchBatch(qFrame, "vec_id", "embedding",
        k = 8, nProbe = 3, excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getFloat(2)))
      .groupBy(_._1)
    qids.foreach { qid =>
      val perQuery = idx.searchAdc(local(qid), candidates = 9, nProbe = 3)
        .collect().map(r => (r.getLong(0), r.getFloat(1)))
        .filter(_._1 != qid).take(8)
      val got = batch(qid).sortBy(t => (t._3, t._2)).map(t => (t._2, t._3)).toSeq
      assert(got.map(_._1) == perQuery.map(_._1).toSeq, s"qid=$qid ids diverge")
      got.zip(perQuery).foreach { case ((_, d1), (_, d2)) =>
        assert(math.abs(d1 - d2) < 1e-4f, s"qid=$qid d2 $d1 != $d2")
      }
      assert(!batch(qid).exists(_._2 == qid), "excludeSelf leaked a self-match")
    }
    // full probe + exact rerank over the ADC survivors == brute force
    val cand = idx.searchBatch(clustered.where(col("vec_id") === 0L),
      "vec_id", "embedding", k = 239, nProbe = 8, excludeSelf = true)
    val top = cand.orderBy(col("d2").asc, col("id2").asc)
    assert(top.count() == 239) // every other row reached at full probe
    // a null or wrong-width query vector must FAIL, not rank NULL
    // distances first and return arbitrary rows as the top-k
    val badNull = Seq((999L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val eNull = intercept[Exception] {
      idx.searchBatch(badNull, "vec_id", "embedding", k = 3).collect()
    }
    assert(eNull.getMessage.contains("NULL"), eNull.getMessage)
    val badWidth = Seq((999L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val eWidth = intercept[Exception] {
      idx.searchBatch(badWidth, "vec_id", "embedding", k = 3).collect()
    }
    assert(eWidth.getMessage.contains("got 2"), eWidth.getMessage)
  }

  test("PqIndex: cellStats covers every cell and sums to the corpus; compactTo reaches the bucket floor with search parity") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pqcomp").toString
    val base = clustered.where(col("vec_id") < 200L)
    PqIndex.build(base, "vec_id", "embedding",
      m = 4, codesPerSub = 16, numCentroids = 8, iters = 2).write(dir, buckets = 4)
    // three micro-batches fragment the bucketed codes table
    (0 until 3).foreach { i =>
      PqIndex.addTo(spark, dir,
        clustered.where(col("vec_id") === (200L + i)), "vec_id", "embedding")
    }
    val stats = PqIndex.cellStats(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(stats.keySet == (1 to 8).toSet) // every trained cell reported
    assert(stats.values.sum == 203L)
    val q = local(0L)
    val before = PqIndex.load(spark, dir)
      .search(clustered, "vec_id", "embedding", q, k = 5, nProbe = 8,
        candidates = 203)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    val dst = java.nio.file.Files.createTempDirectory("graft-pqcomp2").toString
    val (filesBefore, filesAfter) = PqIndex.compactTo(spark, dir, dst, buckets = 4)
    assert(filesBefore > 4, s"fragmentation expected, got $filesBefore files")
    assert(filesAfter <= 4, s"compaction missed the bucket floor: $filesAfter")
    val after = PqIndex.load(spark, dst)
      .search(clustered, "vec_id", "embedding", q, k = 5, nProbe = 8,
        candidates = 203)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    assert(after == before, "compaction changed search results")

    // a replayed insert (the ingest loop's at-least-once crash window)
    // leaves two bit-identical code rows for the same id; compaction
    // collapses them — the only time duplicates can exist at all
    PqIndex.addTo(spark, dst,
      clustered.where(col("vec_id") === 202L), "vec_id", "embedding")
    assert(spark.read.parquet(s"$dst/codes")
      .where(col("id") === 202L).count() == 2L)
    val dst2 = java.nio.file.Files.createTempDirectory("graft-pqcomp3").toString
    PqIndex.compactTo(spark, dst, dst2, buckets = 4)
    val codes2 = spark.read.parquet(s"$dst2/codes")
    assert(codes2.count() == 203L)
    assert(codes2.where(col("id") === 202L).count() == 1L)
  }

  test("PqIndex.addTo: appended batch encodes against the frozen quantizers and is searchable") {
    // build WITHOUT cluster 0's members 1-11, then append them
    val base = clustered.where(col("vec_id") === 0L || col("vec_id") >= 12L)
    val batch = clustered.where(col("vec_id") >= 1L && col("vec_id") <= 11L)
    val dir = java.nio.file.Files.createTempDirectory("graft-pqadd").toString
    PqIndex.build(base, "vec_id", "embedding",
      m = 4, codesPerSub = 16, numCentroids = 8, iters = 3).write(dir)
    val q = local(0L)
    val before = PqIndex.load(spark, dir)
      .search(clustered, "vec_id", "embedding", q, k = 5,
        nProbe = 8, candidates = 228)
      .collect().map(_.getLong(0)).toSet
    assert(!before.exists(id => id >= 1L && id <= 11L),
      "held-out ids visible before addTo")
    PqIndex.addTo(spark, dir, batch, "vec_id", "embedding")
    // self-id 0 is indexed here, so query its own vector against all
    // 240: brute top-5 including the appended near-duplicates
    val after = PqIndex.load(spark, dir)
      .search(clustered, "vec_id", "embedding", q, k = 5,
        nProbe = 8, candidates = 240)
      .collect().map(_.getLong(0)).toSeq
    val want = (local.toSeq.map { case (id, v) =>
      id -> v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
    }).sortBy { case (id, d) => (d, id) }.take(5).map(_._1)
    assert(after == want, s"post-addTo full-probe search $after != brute $want")
  }

  test("PqIndex.removeFrom: tombstoned ids vanish from search, die in compactTo, unmask on revive") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pqdel").toString
    PqIndex.build(clustered, "vec_id", "embedding",
      m = 4, codesPerSub = 16, numCentroids = 8, iters = 3).write(dir)
    val q = local(0L)
    def top5() = PqIndex.load(spark, dir)
      .search(clustered, "vec_id", "embedding", q, k = 5,
        nProbe = 8, candidates = 240)
      .collect().map(_.getLong(0)).toSeq
    val before = top5()
    val victim = before(1) // a genuine neighbour, not the query itself
    PqIndex.removeFrom(spark, dir, Seq(victim).toDF("vec_id"), "vec_id")
    val after = top5()
    assert(!after.contains(victim), s"tombstoned $victim still in $after")
    // full-probe parity with brute force over the SURVIVORS
    val want = local.toSeq.filter { case (id, _) => id != victim }
      .map { case (id, v) =>
        id -> v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum }
      .sortBy { case (id, d) => (d, id) }.take(5).map(_._1)
    assert(after == want, s"survivor search $after != brute $want")
    // compaction drops the code rows for real, destination starts clean
    val dst = java.nio.file.Files.createTempDirectory("graft-pqdel2").toString
    PqIndex.compactTo(spark, dir, dst)
    assert(spark.read.parquet(s"$dst/codes")
      .where(col("id") === victim).count() == 0L)
    assert(!new java.io.File(s"$dst/tombstones").exists())
    // re-inserting a tombstoned id is refused (the stored codes still
    // exist — a second copy would double-serve); revive() unmasks them
    intercept[IllegalArgumentException] {
      PqIndex.addTo(spark, dir,
        clustered.where(col("vec_id") === victim), "vec_id", "embedding")
    }
    PqIndex.revive(spark, dir, Seq(victim).toDF("vec_id"), "vec_id")
    assert(top5() == before)
  }
}
