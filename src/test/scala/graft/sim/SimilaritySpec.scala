package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f)),
    (2L, Seq(0.9f, 0.1f, 0.0f)),   // close to 1
    (3L, Seq(0.0f, 1.0f, 0.0f)),   // orthogonal to 1
    (4L, Seq(0.0f, 0.95f, 0.05f)), // close to 3
    (5L, Seq(-1.0f, 0.0f, 0.0f)),  // opposite of 1
  ).toDF("vec_id", "embedding")

  test("cosine of identical/orthogonal/opposite vectors") {
    val a = typedLit(Seq(1.0f, 0.0f)); val o = typedLit(Seq(0.0f, 1.0f))
    val row = spark.range(1).select(
      Similarity.cosine(a, a).as("same"),
      Similarity.cosine(a, o).as("orth"),
      Similarity.cosine(a, transform(a, x => -x)).as("opp")).collect()(0)
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(row.getDouble(1)) < 1e-12)
    assert(math.abs(row.getDouble(2) + 1.0) < 1e-12)
  }

  test("randomProjection: exact sign-rule replica, decorrelated columns, JL distance sanity") {
    import graft.functions.VectorFunctions
    val dIn = 64; val dOut = 16; val seed = 7L
    def sign(j: Int, k: Int): Double =
      if ((j * 2654435761L + k * 40503L + j.toLong * k * 2246822519L + seed)
          % 1000003L % 2L == 0L) 1.0 else -1.0
    // exact parity with the serial replica (codegen path, float input)
    val rnd = new scala.util.Random(3)
    val rows = (0 until 40).map(i =>
      (i.toLong, Array.fill(dIn)(rnd.nextGaussian().toFloat).toSeq))
    val df = rows.toDF("id", "v")
    val got = df.select(col("id"),
        VectorFunctions.randomProjection(col("v"), dOut, seed).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def project(v: Seq[Float]): Seq[Double] =
      (0 until dOut).map { k =>
        v.zipWithIndex.map { case (x, j) => x.toDouble * sign(j, k) }.sum /
          math.sqrt(dOut.toDouble)
      }
    for ((id, v) <- rows) {
      val want = project(v)
      got(id).zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
    }
    // sign columns decorrelate (the j·k cross term is load-bearing:
    // without it adjacent columns measure rho in [-1.00, -0.78])
    for (k <- 0 until dOut - 1) {
      val rho = (0 until dIn).map(j => sign(j, k) * sign(j, k + 1)).sum / dIn
      assert(math.abs(rho) <= 0.15, s"adjacent sign columns k=$k correlate at $rho")
    }
    // JL sanity: mean pairwise distance distortion is small even at 16 dims
    val ids = rows.map(_._1)
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val dists = for (i <- ids.indices; l <- i + 1 until ids.size) yield {
      val (va, vb) = (rows(i)._2.map(_.toDouble), rows(l)._2.map(_.toDouble))
      (d2(got(rows(i)._1), got(rows(l)._1)), d2(va, vb))
    }
    val meanRatio = dists.map { case (p, o) => p / o }.sum / dists.size
    assert(meanRatio > 0.7 && meanRatio < 1.3,
      s"mean squared-distance ratio $meanRatio outside JL band")
    // null rows project to null
    val withNull = Seq((1L, Some(Seq(1.0f, 2.0f))), (2L, None)).toDF("id", "v")
    val nulls = withNull.select(
      VectorFunctions.randomProjection(col("v"), 4, 0L).as("p"))
      .collect().map(_.isNullAt(0))
    assert(nulls.toSeq == Seq(false, true))
  }

  test("brute-force top-1 picks the nearest neighbour") {
    val top1 = Similarity.cosineTopK(vecs, "vec_id", "embedding", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(top1(1L) == 2L && top1(2L) == 1L)
    assert(top1(3L) == 4L && top1(4L) == 3L)
  }

  test("cosine dup pairs above threshold only") {
    val pairs = Similarity.cosineDupPairs(vecs, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)))
  }

  test("bucketed dup pairs equal the exact all-pairs result, via equi-joins only") {
    val exact = Similarity.cosineDupPairs(vecs, "vec_id", "embedding", 0.95, numTables = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Similarity.cosineDupPairs(vecs, "vec_id", "embedding", 0.95)
    val got = bucketed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact && exact == Set((1L, 2L), (3L, 4L)))
    // the scale contract: no O(n²) nested-loop join in the default plan
    val plan = bucketed.queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("grid-salted hot LSH buckets return the identical pair set") {
    // a 60-vector near-identical cluster (plus the base corpus) with
    // skewedBucketFreq = 8 forces every bucket hot: the 2-D grid salt
    // must spread the bucket's pair blocks WITHOUT changing the pair
    // set or the cosines — compared against the default (dormant-salt)
    // call at identical LSH parameters.
    val rnd = new scala.util.Random(11)
    val crowd = (100L until 160L).map(i =>
      (i, Seq(1.0f + rnd.nextFloat() * 1e-3f, rnd.nextFloat() * 1e-3f, 0.0f)))
    val df = vecs.unionByName(crowd.toDF("vec_id", "embedding"))
    def pairs(freq: Long) = Similarity.cosineDupPairs(df, "vec_id", "embedding",
        0.95, numPlanes = 4, numTables = 4, skewedBucketFreq = freq)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val plain = pairs(20000L) // dormant: nothing is hot at this corpus
    val salted = pairs(8L)    // every crowd bucket over the threshold
    assert(salted == plain, "grid salt must not change the pair set or cosines")
    assert(plain.keySet.exists { case (a, b) => a >= 100L && b >= 100L },
      "the crowd must actually produce in-bucket pairs for the test to bite")
  }

  test("LSH dup pairs at the d16 parameters: subset of exact, all above threshold") {
    val exact = Similarity.cosineDupPairs(vecs, "vec_id", "embedding", 0.95, numTables = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.cosineDupPairs(vecs, "vec_id", "embedding", 0.95,
      numPlanes = 4, numTables = 16).collect()
    // rerank guarantees subset-with-identical-cosines; 4 planes × 16
    // tables make the miss probability at cos≥0.95 ≈ 3.5e-8, so on this
    // corpus the sets are equal
    assert(lsh.map(r => (r.getLong(0), r.getLong(1))).toSet == exact.keySet)
    lsh.foreach { r =>
      assert(r.getDouble(2) >= 0.95)
      assert(math.abs(exact((r.getLong(0), r.getLong(1))) - r.getDouble(2)) < 1e-9)
    }
  }

  test("centroids compute the element-wise per-group mean, reassembled in order") {
    val grouped = Seq(
      (1, Seq(1.0f, 0.0f, 3.0f)), (1, Seq(3.0f, 2.0f, 5.0f)),
      (2, Seq(10.0f, 20.0f, 30.0f)),
    ).toDF("label", "embedding")
    val c = Similarity.centroids(grouped, "label", "embedding").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(c(1) == Seq(2.0, 1.0, 4.0))
    assert(c(2) == Seq(10.0, 20.0, 30.0))
  }

  test("IVF ANN at full probe width equals brute-force top-k; narrow probes are a subset") {
    val brute = Similarity.cosineTopK(vecs, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // nProbe = numCentroids → every pair is a candidate → exact answer
    val full = Similarity.annIvfTopK(vecs, "vec_id", "embedding", k = 2,
      numCentroids = 3, nProbe = 3, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(full == brute)
    // narrow probe: pairs carry true cosines (checked against the full
    // all-pairs ranking — a narrow probe's #2 need not be the global #2)
    val allPairs = Similarity.cosineTopK(vecs, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val narrow = Similarity.annIvfTopK(vecs, "vec_id", "embedding", k = 2,
      numCentroids = 3, nProbe = 1, iters = 2).collect()
    assert(narrow.nonEmpty)
    narrow.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(allPairs.contains(key) && math.abs(allPairs(key) - r.getDouble(2)) < 1e-9)
    }
  }

  // Deterministic planted-cluster corpus — the data shape ANN exists for
  // (real near-neighbour structure): nClusters × members in 16 dims,
  // members = unit(center + N(0, 0.05)) so in-cluster cosines sit ≈
  // 0.96-0.99 and cross-cluster cosines are the random-vector background.
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

  private def top5Map(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect().groupBy(_.getLong(0)).map { case (q, rs) =>
      q -> rs.sortBy(r => (-r.getDouble(2), r.getLong(1))).map(_.getLong(1)).take(5).toSeq
    }

  private def recallAt5(exact: Map[Long, Seq[Long]], got: Map[Long, Seq[Long]]): Double = {
    val per = exact.toSeq.map { case (q, e) =>
      val g = got.getOrElse(q, Nil).toSet
      e.count(g).toDouble / e.size
    }
    per.sum / per.size
  }

  test("recall@5 harness: shipped d07/e02 parameters reach >= 0.95 vs the exact baseline") {
    // This is what the brute-force baseline is FOR: measuring the shipped
    // approximate paths. Numbers recorded in SURVEY §5.
    val exact = top5Map(Similarity.cosineTopK(clustered, "vec_id", "embedding", k = 5))
    val lsh = top5Map(Similarity.annLshTopK(clustered, "vec_id", "embedding", k = 5,
      numPlanes = 10, numTables = 8)) // = d07 shipped parameters
    val ivf = top5Map(Similarity.annIvfTopK(clustered, "vec_id", "embedding", k = 5,
      numCentroids = 16, nProbe = 4, iters = 2)) // = e02 shipped parameters
    val rLsh = recallAt5(exact, lsh)
    val rIvf = recallAt5(exact, ivf)
    info(f"recall@5: lsh=$rLsh%.4f ivf=$rIvf%.4f (240 queries)")
    assert(rLsh >= 0.95, f"LSH recall@5 = $rLsh%.4f at shipped parameters")
    assert(rIvf >= 0.95, f"IVF recall@5 = $rIvf%.4f at shipped parameters")
  }

  test("exact O(n2) paths refuse oversized inputs (stats-based guard)") {
    val e = intercept[IllegalStateException] {
      Similarity.cosineTopK(vecs, "vec_id", "embedding", k = 1, maxExactBytes = 1L)
    }
    assert(e.getMessage.contains("annLshTopK"))
    intercept[IllegalStateException] {
      Similarity.cosineDupPairs(vecs, "vec_id", "embedding", 0.9,
        numTables = 0, maxExactBytes = 1L)
    }
    // the LSH mode is the scale path — never guarded
    Similarity.cosineDupPairs(vecs, "vec_id", "embedding", 0.9, maxExactBytes = 1L).collect()
    // and the default cap admits broadcast-small tables
    assert(Similarity.cosineTopK(vecs, "vec_id", "embedding", k = 1).count() > 0)
  }

  test("IVF sample-trained quantizer: full probe width still equals brute force") {
    val brute = Similarity.cosineTopK(clustered, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // trainCap 60 << 240 rows forces the sampled training path; with
    // nProbe = numCentroids every pair is still a candidate, so the
    // result is exact regardless of where the sampled Lloyd converged
    val sampled = Similarity.annIvfTopK(clustered, "vec_id", "embedding", k = 2,
      numCentroids = 8, nProbe = 8, iters = 2, trainCap = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sampled == brute)
  }

  test("centroid ranking is a partial aggregation — no Window, no sort of the scored rows") {
    val v = clustered.select(col("vec_id").as("id"), col("embedding").as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    val cents = Similarity.trainQuantizer(v, numCentroids = 8, iters = 1, trainCap = 60)
    for (n <- Seq(1, 4)) {
      val ranked = Similarity.rankCentroids(v, cents, n)
      val plan = ranked.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), plan)
      assert(plan.contains("partial_"), plan) // map-side combine before the exchange
      assert(ranked.count() == 240L * n, s"n=$n must emit n probes per vector")
    }
    // assignment tie-break parity with the old window order (cos desc,
    // cid asc): every id gets exactly one cell
    assert(Similarity.rankCentroids(v, cents, 1).select("id").distinct().count() == 240L)
  }

  test("persistent IVF index: build -> write -> load -> search survives the session") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(clustered, "vec_id", "embedding",
      numCentroids = 16, iters = 2, trainCap = 60).write(dir)
    // a fresh handle over the parquet bytes alone — no corpus, no retraining
    val idx = IvfIndex.load(spark, dir)
    val brute = top5Map(Similarity.cosineTopK(clustered, "vec_id", "embedding", k = 5))
    // full probe width over the loaded index == brute force (e02 contract)
    val full = top5Map(idx.search(clustered, "vec_id", "embedding", k = 5,
      nProbe = 16, excludeSelf = true))
    assert(full == brute)
    // shipped narrow probe keeps the recall bar
    val narrow = top5Map(idx.search(clustered, "vec_id", "embedding", k = 5,
      nProbe = 4, excludeSelf = true))
    assert(recallAt5(brute, narrow) >= 0.95)
    // EXTERNAL queries (ids not in the corpus): k results, true cosines
    val external = Seq((9001L, Seq.fill(16)(0.25f))).toDF("vec_id", "embedding")
    val got = idx.search(external, "vec_id", "embedding", k = 3, nProbe = 16).collect()
    assert(got.length == 3 && got.forall(_.getLong(0) == 9001L))
    assert(got.forall(r => r.getDouble(2) <= 1.0 && r.getDouble(2) >= -1.0))
  }

  test("e03b serve parity: loaded-index search == built-handle search on the e03b batch shape") {
    // round-15 verdict Next #4: e03b (prebuilt per-JVM index, serve
    // pricing) was rows-only + brute-parity specs, but nothing pinned
    // the SERVED gate's results against the in-gate build form at gate
    // parameters. Pin it here: one index, searched through the freshly
    // built handle (e03's form) and through a loaded handle over the
    // written bytes (e03b's form), on the same query batch — one query
    // per planted cluster, k = 10, nProbe = 4, excludeSelf — must agree
    // exactly, values included (the d51/d51b precedent).
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-e03b").toString
    val built = IvfIndex.build(clustered, "vec_id", "embedding",
      numCentroids = 16, iters = 2, trainCap = 60)
    built.write(dir)
    val loaded = IvfIndex.load(spark, dir)
    // the e03b batch: the minimum-id vector of each planted cluster
    val queries = clustered.withColumn("grp", (col("vec_id") / 12).cast("long"))
      .groupBy(col("grp")).agg(min(col("vec_id")).as("vec_id"))
      .join(clustered, "vec_id")
      .select(col("vec_id"), col("embedding"))
    def resultSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaBuilt = resultSet(built.search(queries, "vec_id", "embedding",
      k = 10, nProbe = 4, excludeSelf = true))
    val viaLoaded = resultSet(loaded.search(queries, "vec_id", "embedding",
      k = 10, nProbe = 4, excludeSelf = true))
    assert(viaBuilt.nonEmpty && viaLoaded == viaBuilt,
      "the served (loaded) form must return exactly the built form's neighbours")
  }

  test("randomProjection composes with IVF: half-width search keeps cluster recall") {
    import graft.functions.VectorFunctions
    // the scale path e13 exists for: shrink vectors BEFORE the
    // shuffle-heavy ANN tier, search in projected space
    val proj = clustered.select(col("vec_id"),
      transform(VectorFunctions.randomProjection(col("embedding"), 8, 7L),
        x => x.cast("float")).as("embedding"))
    val got = top5Map(Similarity.annIvfTopK(proj, "vec_id", "embedding", k = 5,
      numCentroids = 16, nProbe = 16, iters = 2))
    // projection is a CANDIDATE-GENERATION compressor (like PQ's ADC):
    // fine ranking is the exact-rerank step's job, the property that
    // must survive the width cut is that retrieved neighbours land in
    // the query's planted cluster
    val purities = got.toSeq.map { case (id, nbrs) =>
      nbrs.count(n => n / 12 == id / 12).toDouble / nbrs.size
    }
    val purity = purities.sum / purities.size
    // and exact top-5 recall, recorded for the record
    val brute = top5Map(Similarity.cosineTopK(clustered, "vec_id", "embedding", k = 5))
    info(f"projected-space (16 -> 8 dims): cluster purity@5 = $purity%.4f, " +
      f"exact recall@5 = ${recallAt5(brute, got)}%.4f")
    assert(purity >= 0.85, f"projected cluster purity@5 = $purity%.4f")
  }

  test("IvfIndex.removeFrom: tombstoned ids vanish everywhere, die in compactTo, unmask on revive") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfdel").toString
    IvfIndex.build(clustered, "vec_id", "embedding",
      numCentroids = 16, iters = 2, trainCap = 60).write(dir)
    val brute = top5Map(Similarity.cosineTopK(clustered, "vec_id", "embedding", k = 5))
    def full() = top5Map(IvfIndex.load(spark, dir)
      .search(clustered, "vec_id", "embedding", k = 5, nProbe = 16, excludeSelf = true))
    val victim = brute(0L).head
    IvfIndex.removeFrom(spark, dir, Seq(victim).toDF("vec_id"), "vec_id")
    val after = full()
    assert(after.values.forall(!_.contains(victim)),
      s"tombstoned $victim still retrieved as a neighbour")
    // full-probe parity with brute force over the survivors (victim
    // still QUERIES — it is deleted from the index, not the query set)
    val bruteAfter = top5Map(Similarity.cosineTopK(
        clustered.where(col("vec_id") =!= victim), "vec_id", "embedding", k = 5))
      .filter { case (id, _) => id != victim }
    assert(after.filter { case (id, _) => id != victim } == bruteAfter)
    // cellStats reflects the logical delete (sums to survivors)
    val n = IvfIndex.cellStats(spark, dir).agg(sum(col("n_postings"))).head().getLong(0)
    assert(n == clustered.count() - 1)
    // compaction drops the posting physically, destination starts clean
    val dst = java.nio.file.Files.createTempDirectory("graft-ivfdel2").toString
    IvfIndex.compactTo(spark, dir, dst)
    assert(spark.read.parquet(s"$dst/postings")
      .where(col("id") === victim).count() == 0L)
    assert(!new java.io.File(s"$dst/tombstones").exists())
    // re-inserting a tombstoned id is refused (its stored posting still
    // exists — a second copy would double-serve); revive() unmasks it
    intercept[IllegalArgumentException] {
      IvfIndex.addTo(spark, dir,
        clustered.where(col("vec_id") === victim), "vec_id", "embedding")
    }
    IvfIndex.revive(spark, dir, Seq(victim).toDF("vec_id"), "vec_id")
    assert(full() == brute)
  }

  test("loaded IVF index reads cid-bucketed postings: no postings-side exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-bkt").toString
    IvfIndex.build(clustered, "vec_id", "embedding",
      numCentroids = 16, iters = 2, trainCap = 60).write(dir, buckets = 8)
    // force the fresh-session path: the catalog entry dies with the
    // session, so load must re-register the external bucketed table from
    // the index's meta file
    spark.sql(s"DROP TABLE IF EXISTS ${IvfIndex.postingsTable(dir)}")
    val idx = IvfIndex.load(spark, dir)

    // the direct proof (SourcesSpec style): a cid aggregation over the
    // loaded postings needs no Exchange — the scan is pre-partitioned
    val agg = idx.postings.groupBy("cid").agg(count(lit(1)).as("n"))
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange"), aggPlan)
    assert(agg.collect().map(_.getLong(1)).sum == 240L)

    // and a real search exploits the bucket layout on the probe join
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val res = idx.search(clustered, "vec_id", "embedding", k = 5,
        nProbe = 4, excludeSelf = true)
      res.collect() // materialize so AQE's final plan is the one inspected
      val plan = res.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("load revalidates a stale catalog entry against the index meta file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-stale").toString
    IvfIndex.build(clustered, "vec_id", "embedding",
      numCentroids = 16, iters = 2, trainCap = 60).write(dir, buckets = 4)
    val tbl = IvfIndex.postingsTable(dir)
    // simulate an out-of-band rewrite: the catalog still declares a
    // DIFFERENT bucket count than the files on disk carry (meta = 4).
    // Left in place, the bogus HashPartitioning(cid, 8) makes bucket-aware
    // joins zip the wrong partitions and silently drop matches.
    val schema = spark.read.parquet(s"$dir/postings").schema.toDDL
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(
      s"""CREATE TABLE $tbl ($schema) USING parquet
         |CLUSTERED BY (cid) SORTED BY (cid) INTO 8 BUCKETS
         |LOCATION '$dir/postings'""".stripMargin)
    val idx = IvfIndex.load(spark, dir)
    // the registration was rebuilt from the meta file
    val declared = spark.sql(s"DESCRIBE TABLE EXTENDED $tbl").collect()
      .find(_.getString(0) == "Num Buckets").map(_.getString(1).trim)
    assert(declared.contains("4"), s"declared=$declared")
    // and a bucket-exploiting search (no broadcast) is still exact at
    // full probe width — the e02 contract a stale declaration breaks
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val brute = top5Map(Similarity.cosineTopK(clustered, "vec_id", "embedding", k = 5))
      val full = top5Map(idx.search(clustered, "vec_id", "embedding", k = 5,
        nProbe = 16, excludeSelf = true))
      assert(full == brute)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("index dirs with a quote in the path register cleanly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-o'q").toString
    IvfIndex.build(clustered, "vec_id", "embedding",
      numCentroids = 8, iters = 1, trainCap = 60).write(dir, buckets = 4)
    // fresh-session path: re-register from meta, path quoted in the DDL
    spark.sql(s"DROP TABLE IF EXISTS ${IvfIndex.postingsTable(dir)}")
    val idx = IvfIndex.load(spark, dir)
    assert(idx.postings.count() == 240L)
    assert(idx.search(clustered.limit(5), "vec_id", "embedding", k = 3,
      nProbe = 8, excludeSelf = true).count() > 0)
  }

  test("int8 quantization: codes in range, error <= scale/2, search survives") {
    val q = Similarity.quantizeInt8(clustered, "vec_id", "embedding")
    val joined = q.join(clustered, q("id") === clustered("vec_id"))
      .select(col("id"), col("vmin"), col("vmax"), col("codes"), col("embedding"))
      .collect()
    assert(joined.length == 240)
    joined.foreach { r =>
      val vmin = r.getDouble(1); val vmax = r.getDouble(2)
      val codes = r.getSeq[Byte](3); val orig = r.getSeq[Float](4)
      assert(codes.length == orig.length)
      val scale = if (vmax > vmin) (vmax - vmin) / 255.0 else 1.0
      // every element reconstructs within half a quantization step
      codes.zip(orig).foreach { case (c, x) =>
        val x2 = vmin + (c.toDouble + 128.0) * scale
        assert(math.abs(x2 - x) <= scale / 2 + 1e-9,
          s"id=${r.getLong(0)} x=$x x2=$x2 scale=$scale")
      }
    }
    // dequantized search: top-1 over reconstructed vectors matches the
    // exact top-1 for nearly all queries on the clustered corpus (the
    // in-cluster gap is far wider than the quantization error)
    val deq = q.select(col("id").as("vec_id"),
      Similarity.dequantizeInt8(col("codes"), col("vmin"), col("vmax")).as("embedding"))
    val exact = Similarity.cosineTopK(clustered, "vec_id", "embedding", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaQ = Similarity.cosineTopK(deq, "vec_id", "embedding", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = exact.count { case (id, nn) => viaQ.get(id).contains(nn) }
    assert(agree >= 228, s"top-1 agreement $agree/240") // >= 95 %

    // constant vector: scale-1 branch, all codes -128, exact round-trip
    import spark.implicits._
    val const = Seq((1L, Array(2.5f, 2.5f, 2.5f))).toDF("vec_id", "embedding")
    val cq = Similarity.quantizeInt8(const, "vec_id", "embedding").collect().head
    assert(cq.getSeq[Byte](3).forall(_ == -128))
    val back = Similarity.dequantizeInt8(col("codes"), col("vmin"), col("vmax"))
    val rec = Similarity.quantizeInt8(const, "vec_id", "embedding")
      .select(back.as("r")).collect().head.getSeq[Float](0)
    assert(rec.forall(_ == 2.5f))
  }

  test("ANN LSH candidates are a subset of brute-force with matching cosines") {
    val brute = Similarity.cosineTopK(vecs, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ann = Similarity.annLshTopK(vecs, "vec_id", "embedding", k = 4,
      numPlanes = 4, numTables = 8).collect()
    assert(ann.nonEmpty)
    ann.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(brute.contains(key) && math.abs(brute(key) - r.getDouble(2)) < 1e-9)
    }
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("semDedup with ONE learned cluster equals the exact all-pairs result") {
    val exact = pairSet(Similarity.cosineDupPairs(clustered, "vec_id", "embedding",
      threshold = 0.9, numTables = 0))
    val sem = pairSet(Similarity.semDedupPairs(clustered, "vec_id", "embedding",
      threshold = 0.9, numClusters = 1))
    assert(exact.nonEmpty && sem == exact)
  }

  test("semDedup on the clustered corpus: learned clusters keep every tight pair") {
    // θ=0.99 pairs live inside the generator's tight clusters; a learned
    // k=20 clustering must co-locate them (cross-cluster cos ≪ θ)
    val exact = pairSet(Similarity.cosineDupPairs(clustered, "vec_id", "embedding",
      threshold = 0.99, numTables = 0))
    val sem = pairSet(Similarity.semDedupPairs(clustered, "vec_id", "embedding",
      threshold = 0.99, numClusters = 20, iters = 5))
    assert(exact.nonEmpty && sem.subsetOf(exact))
    assert(sem.size.toDouble / exact.size >= 0.95, s"recall ${sem.size}/${exact.size}")
  }

  test("semDedupKeep drops exactly the id2 side of the duplicate pairs") {
    val pairs = Similarity.semDedupPairs(clustered, "vec_id", "embedding",
      threshold = 0.99, numClusters = 1)
    val dropped = pairs.select("id2").collect().map(_.getLong(0)).toSet
    val kept = Similarity.semDedupKeep(clustered, "vec_id", "embedding",
        threshold = 0.99, numClusters = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(dropped.nonEmpty && kept == (0L until 240L).toSet -- dropped)
  }

  test("scale-sized IVF/LSH keep recall on a 5x larger clustered corpus") {
    // 100 clusters × 12 members: suggestedCentroids(1200) = 35 cells,
    // suggestedPlanes(1200) = 5 — the sizes the e02/d16 gates now pick.
    // The sizing fix must not buy its linear cost with recall.
    val big = clusteredCorpus(nClusters = 100, members = 12, seed = 7)
    val exact = top5Map(Similarity.cosineTopK(big, "vec_id", "embedding", k = 5))
    val cents = Similarity.suggestedCentroids(1200)
    val ivf = top5Map(Similarity.annIvfTopK(big, "vec_id", "embedding", k = 5,
      numCentroids = cents, nProbe = 4, iters = 2,
      trainCap = math.max(2000, 40 * cents)))
    val r = recallAt5(exact, ivf)
    info(f"recall@5 at $cents cells, nProbe=4: $r%.4f (1200 queries)")
    assert(r >= 0.95, f"IVF recall@5 = $r%.4f with sqrt(n) cells")
    // the scale-sized LSH dup join still catches ~every planted dup pair
    val exactPairs = Similarity.cosineDupPairs(big, "vec_id", "embedding",
      threshold = 0.9, numTables = 0).count()
    val lshPairs = Similarity.cosineDupPairs(big, "vec_id", "embedding",
      threshold = 0.9, numPlanes = Similarity.suggestedPlanes(1200),
      numTables = 16).count()
    info(s"dup pairs: exact=$exactPairs lsh=$lshPairs")
    assert(exactPairs > 0 && lshPairs >= math.ceil(exactPairs * 0.95).toLong)
  }

  test("IVF recall at fixed nProbe is stable across corpus sizes (adaptive sizing)") {
    // ROADMAP: pin the recall/latency trade across SCALE POINTS, not one
    // size — suggestedCentroids doubles the cell count between these two
    // corpora (35 -> 49 cells), so constant recall at the SAME nProbe=4
    // is evidence the k ~ sqrt(n) sizing holds the trade, not luck.
    for ((nc, mem) <- Seq((100, 12), (200, 12))) {
      val corpus = clusteredCorpus(nClusters = nc, members = mem, seed = 11)
      val n = nc * mem
      val exact = top5Map(Similarity.cosineTopK(corpus, "vec_id", "embedding", k = 5))
      val cents = Similarity.suggestedCentroids(n)
      val ivf = top5Map(Similarity.annIvfTopK(corpus, "vec_id", "embedding", k = 5,
        numCentroids = cents, nProbe = 4, iters = 2,
        trainCap = math.max(2000, 40 * cents)))
      val r = recallAt5(exact, ivf)
      info(f"n=$n cells=$cents nProbe=4: recall@5 = $r%.4f")
      assert(r >= 0.95, f"recall@5 = $r%.4f at n=$n, cells=$cents, nProbe=4")
    }
  }

  test("scale-aware sizing: ~sqrt(n) IVF cells, LSH buckets held near the target size") {
    // floor clamp: small corpora keep the hand-tuned minimums
    assert(Similarity.suggestedCentroids(200) == 16)
    assert(Similarity.suggestedCentroids(20000) == 142) // ceil(sqrt(n))
    assert(Similarity.suggestedPlanes(200) == 4)
    // 2^planes buckets of ~64: n=2000 -> 5 planes, n=20000 -> 9
    assert(Similarity.suggestedPlanes(2000) == 5)
    assert(Similarity.suggestedPlanes(20000) == 9)
    assert(Similarity.suggestedPlanes(1L << 40) == 20) // hard cap
  }

  test("IvfIndex.addTo appends to the bucketed store; a fresh load searches the increment without rebuild") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-add").toString
    val seed = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f)), (4L, Array(0f, 0f, 0f, 1f))
    ).toDF("id", "v")
    IvfIndex.build(seed, "id", "v", numCentroids = 2, iters = 2).write(dir, buckets = 2)
    val batch = Seq((10L, Array(0.9f, 0.1f, 0f, 0f))).toDF("id", "v")
    IvfIndex.addTo(spark, dir, batch, "id", "v")
    // a FRESH load sees the increment: searching near the added vector
    // returns it first
    val got = IvfIndex.load(spark, dir)
      .search(Seq((99L, Array(0.9f, 0.1f, 0f, 0f))).toDF("id", "v"),
        "id", "v", k = 1, nProbe = 2)
      .collect().map(r => r.getLong(1)).toSet
    assert(got == Set(10L), got.toString)
    // storeDupIds flags the added vector's near-dup, not an orthogonal probe
    val probes = Seq((50L, Array(0.91f, 0.09f, 0f, 0f)),
      (51L, Array(0f, 0f, 0.7f, -0.7f))).toDF("id", "v")
    val dups = IvfIndex.storeDupIds(spark, dir, probes, "id", "v", 0.95)
      .collect().map(_.getLong(0)).toSet
    assert(dups == Set(50L), dups.toString)
  }

  test("compactTo collapses ingest-fragmented postings; search and bucketing survive") {
    val src = java.nio.file.Files.createTempDirectory("graft-ivf-frag").toString
    val dst = java.nio.file.Files.createTempDirectory("graft-ivf-cpt").toString
    IvfIndex.build(clustered, "vec_id", "embedding",
      numCentroids = 8, iters = 2, trainCap = 60).write(src, buckets = 4)
    // five micro-batch appends — each insertInto commits its own file set,
    // the streaming small-files tax in miniature
    for (b <- 0 until 5) {
      val batch = clustered.where(col("vec_id") % 5 === b)
        .select((col("vec_id") + 1000L * (b + 1)).as("vec_id"), col("embedding"))
      IvfIndex.addTo(spark, src, batch, "vec_id", "embedding")
    }
    val (before, after) = IvfIndex.compactTo(spark, src, dst, buckets = 4)
    assert(before > after, s"files before=$before after=$after")
    assert(after <= 4, s"compacted to $after files (4 buckets)")
    // the compacted index is the SAME index: identical search results
    val q = clustered.limit(40)
    val a = IvfIndex.load(spark, src).search(q, "vec_id", "embedding", k = 3,
      nProbe = 8, excludeSelf = true).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = IvfIndex.load(spark, dst).search(q, "vec_id", "embedding", k = 3,
      nProbe = 8, excludeSelf = true).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
    // and it kept the exchange-free bucketed layout
    val agg = IvfIndex.load(spark, dst).postings
      .groupBy("cid").agg(count(lit(1)).as("n"))
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(agg.collect().map(_.getLong(1)).sum == 480L) // 240 built + 240 added
  }

  test("occupancySkew spikes when ingest concentrates into one frozen cell") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-ivf-drift").toString
    IvfIndex.build(clustered, "vec_id", "embedding",
      numCentroids = 8, iters = 2, trainCap = 60).write(src, buckets = 4)
    // cellStats covers EVERY trained cell, including empty ones
    assert(IvfIndex.cellStats(spark, src).count() == 8L)
    val skew0 = IvfIndex.occupancySkew(spark, src)
    // pathological ingest: 120 near-identical vectors in one novel
    // direction — under the frozen quantizer they all land in whichever
    // cell is nearest, and the monitor must flag the hot cell
    val rnd = new scala.util.Random(99)
    val center = Array.fill(16)(rnd.nextGaussian())
    val cn = math.sqrt(center.map(x => x * x).sum)
    val blob = (0 until 120).map { i =>
      val v = center.map(x => x / cn + rnd.nextGaussian() * 0.02)
      val n = math.sqrt(v.map(x => x * x).sum)
      ((5000 + i).toLong, v.map(x => (x / n).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    IvfIndex.addTo(spark, src, blob, "vec_id", "embedding")
    val skew1 = IvfIndex.occupancySkew(spark, src)
    assert(skew1 > skew0 * 1.5, f"skew $skew0%.2f -> $skew1%.2f must rise")
  }

  test("rebuildTo after region drift: more cells, shallower hot cell, still exact") {
    val src = java.nio.file.Files.createTempDirectory("graft-ivf-rb-src").toString
    val dst = java.nio.file.Files.createTempDirectory("graft-ivf-rb-dst").toString
    // 40 tight clusters with TRANSPOSED ids (id = member*40 + cluster) so
    // the deterministic lowest-id k-means init spans distinct clusters —
    // consecutive ids walk across clusters, the shape a shuffled corpus
    // table has in practice
    // generator id = cluster*12 + member  ->  transposed = member*40 + cluster
    val all40 = clusteredCorpus(40, 12, 7)
      .select(((col("vec_id") % 12) * 40 + floor(col("vec_id") / 12)).cast("long")
        .as("vec_id"), col("embedding"))
    val original = all40.where(col("vec_id") % 40 < 20)  // clusters 0..19
    val drifted = all40.where(col("vec_id") % 40 >= 20)  // novel region
    // quantizer trained on the ORIGINAL corpus only, deliberately coarse
    IvfIndex.build(original, "vec_id", "embedding",
      numCentroids = 6, iters = 3, trainCap = 600).write(src, buckets = 4)
    IvfIndex.addTo(spark, src, drifted, "vec_id", "embedding")
    def maxOcc(dir: String): Long = IvfIndex.cellStats(spark, dir)
      .agg(max(col("n_postings"))).head().getLong(0)
    val hotBefore = maxOcc(src) // 480 rows over 6 frozen cells: >= 80 deep
    IvfIndex.rebuildTo(spark, src, dst, iters = 3)
    val rebuilt = IvfIndex.load(spark, dst)
    // default sizing is ~sqrt(n) over an APPROX row count (sampled on
    // stats-less tables) — range-check rather than pin the sample noise
    val cells = rebuilt.centroids.count().toInt
    assert(cells >= 16 && cells <= 32, s"cells=$cells for n=480")
    val hotAfter = maxOcc(dst)
    assert(hotAfter < hotBefore,
      s"rebuild must shrink the hottest posting list: $hotBefore -> $hotAfter")
    // the rebuilt index still answers exactly at full probe width over the
    // UNION corpus (the vectors all live in the postings — no corpus reread)
    val brute = top5Map(Similarity.cosineTopK(all40, "vec_id", "embedding", k = 5))
    val full = top5Map(rebuilt.search(all40, "vec_id", "embedding", k = 5,
      nProbe = cells, excludeSelf = true))
    assert(full == brute)
  }

  test("prototypePrune keeps the farthest-from-centroid fraction per cluster") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), 1L), (2L, Seq(1.0f, 0.1f), 1L),
      (3L, Seq(0.0f, 1.0f), 1L), // farthest from cluster 1's centroid
      (4L, Seq(0.0f, 1.0f), 2L), (5L, Seq(0.0f, 1.0f), 2L),
      (6L, Seq(1.0f, 0.0f), 2L) // farthest from cluster 2's centroid
    ).toDF("id", "v", "cid")
    val kept = Similarity.prototypePrune(df, "id", "v", keepFrac = 1.0 / 3,
      clusterCol = Some("cid")).select("id").as[Long].collect().toSet
    assert(kept == Set(3L, 6L))
    // keepFrac = 1 keeps everything
    val all = Similarity.prototypePrune(df, "id", "v", keepFrac = 1.0,
      clusterCol = Some("cid")).count()
    assert(all == 6L)
    // exact ties (identical vectors) break by id: the smaller id survives
    val tied = Similarity.prototypePrune(df.where(col("id").isin(4L, 5L)),
      "id", "v", keepFrac = 0.5, clusterCol = Some("cid"))
      .select("id").as[Long].collect().toSeq
    assert(tied == Seq(4L))
  }

  test("knnLabel: majority of k nearest seeds, smaller label on vote ties") {
    val seeds = Seq(
      (1L, Seq(1.0f, 0.0f), "a"), (2L, Seq(0.9f, 0.1f), "a"),
      (3L, Seq(0.0f, 1.0f), "b"), (4L, Seq(0.1f, 0.9f), "b")
    ).toDF("sid", "sv", "sl")
    val corpus = Seq(
      (10L, Seq(1.0f, 0.05f)), (11L, Seq(0.05f, 1.0f))
    ).toDF("id", "v")
    val got = Similarity.knnLabel(corpus, "id", "v", seeds, "sid", "sv", "sl", k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(10L) == (("a", 2L)))
    assert(got(11L) == (("b", 2L)))
    // the diagonal point sees one seed of each label in its top-2:
    // the vote ties 1-1 and breaks toward the smaller label
    val tie = Similarity.knnLabel(Seq((20L, Seq(0.7f, 0.7f))).toDF("id", "v"),
      "id", "v", seeds, "sid", "sv", "sl", k = 2)
      .collect()(0)
    assert(tie.getString(1) == "a" && tie.getLong(2) == 1L)
    // k past the seed count degrades to voting over ALL seeds: every
    // point then ties 2-2 and the smaller label wins
    val allSeeds = Similarity.knnLabel(corpus, "id", "v", seeds,
      "sid", "sv", "sl", k = 99).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(allSeeds(10L) == (("a", 2L)) && allSeeds(11L) == (("a", 2L)))
    // guards: empty and oversized seed sets refuse
    intercept[IllegalArgumentException] {
      Similarity.knnLabel(corpus, "id", "v", seeds.where(lit(false)),
        "sid", "sv", "sl", k = 1)
    }
    intercept[IllegalArgumentException] {
      Similarity.knnLabel(corpus, "id", "v", seeds, "sid", "sv", "sl",
        k = 1, maxSeeds = 2)
    }
  }

  test("knnLabelIndexed at full probe equals knnLabel brute, id-for-id") {
    // 60 labeled seeds in three angular blobs (past nothing — small on
    // purpose: full probe + candidates=|seeds| makes the ADC prefilter
    // keep EVERY seed, so the indexed path must reproduce the literal
    // path exactly, vote counts included)
    val rnd = new scala.util.Random(5)
    def jitter(base: Array[Float]): Seq[Float] =
      base.map(x => x + rnd.nextGaussian().toFloat * 0.05f).toSeq
    val bases = Map("a" -> Array(1.0f, 0.0f, 0.0f, 0.0f),
      "b" -> Array(0.0f, 1.0f, 0.0f, 0.0f),
      "c" -> Array(0.0f, 0.0f, 1.0f, 0.0f))
    val seeds = (0L until 60L).map { i =>
      val l = Seq("a", "b", "c")(i.toInt % 3)
      (i, jitter(bases(l)), l)
    }.toDF("sid", "sv", "sl")
    val corpus = (100L until 130L).map { i =>
      (i, jitter(bases(Seq("a", "b", "c")(i.toInt % 3))))
    }.toDF("id", "v")
    val idx = PqIndex.build(seeds, "sid", "sv",
      m = 2, codesPerSub = 8, numCentroids = 4, iters = 2)
    val brute = Similarity.knnLabel(corpus, "id", "v", seeds,
      "sid", "sv", "sl", k = 5).orderBy("id").collect().map(_.toSeq)
    val indexed = Similarity.knnLabelIndexed(corpus, "id", "v", idx, seeds,
      "sid", "sv", "sl", k = 5, nProbe = 4, candidates = 60)
      .orderBy("id").collect().map(_.toSeq)
    assert(indexed.toSeq == brute.toSeq)
    // guard: a candidate pool smaller than k refuses
    intercept[IllegalArgumentException] {
      Similarity.knnLabelIndexed(corpus, "id", "v", idx, seeds,
        "sid", "sv", "sl", k = 5, candidates = 3)
    }
  }

  test("knnLabelIndexed recall sweep: label agreement vs brute at narrowing probes; shipped settings >= 0.95") {
    // the e02/e03 recall@k harness applied to LABELS: 600 seeds (well
    // past a comfortable literal, the size knnLabelIndexed exists for —
    // brute still runs here as the baseline), 300 queries, four blobs;
    // quantifies the nProbe/candidates trade the scaladoc documents
    val rnd = new scala.util.Random(17)
    val labels = Vector("a", "b", "c", "d")
    def base(l: Int) = Array.tabulate(8)(j =>
      if (j == 2 * l || j == 2 * l + 1) 1.0f else 0.0f)
    // heavy overlap on purpose: with clean blobs every probe width
    // scores 1.0 and the sweep quantifies nothing — at 0.45σ the blobs
    // interleave enough that a 1-of-24-cell probe visibly loses
    // neighbors while the shipped defaults stay above the bar
    def jitter(b: Array[Float]): Seq[Float] =
      b.map(x => x + rnd.nextGaussian().toFloat * 0.45f).toSeq
    val seeds = (0L until 600L).map { i =>
      val l = (i % 4).toInt; (i, jitter(base(l)), labels(l))
    }.toDF("sid", "sv", "sl")
    val corpus = (1000L until 1300L).map { i =>
      (i, jitter(base((i % 4).toInt)))
    }.toDF("id", "v")
    val idx = PqIndex.build(seeds, "sid", "sv",
      m = 4, codesPerSub = 16, numCentroids = 24, iters = 3)
    val brute = Similarity.knnLabel(corpus, "id", "v", seeds,
      "sid", "sv", "sl", k = 5).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def agree(nProbe: Int, candidates: Int): Double = {
      val got = Similarity.knnLabelIndexed(corpus, "id", "v", idx, seeds,
        "sid", "sv", "sl", k = 5, nProbe = nProbe, candidates = candidates)
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      brute.count { case (id, l) => got(id).contains(l) }.toDouble / brute.size
    }
    val narrow = agree(1, 8)
    val shipped = agree(4, 64)
    val full = agree(24, 600)
    info(f"label agreement vs brute: nProbe=1/c=8 $narrow%.4f, " +
      f"nProbe=4/c=64 $shipped%.4f, full $full%.4f (300 queries, 600 seeds)")
    assert(full == 1.0, f"full probe + all candidates must equal brute, got $full%.4f")
    assert(shipped >= 0.95, f"shipped-default agreement $shipped%.4f < 0.95")
    assert(narrow >= 0.5, f"even the narrowest probe should beat chance: $narrow%.4f")
  }

  test("knnLabelIndexed never drops a corpus row: empty probed cells yield NULL, 0") {
    // two far-apart seed clusters; tombstone the whole "b" cluster in
    // the written index — a "b"-side corpus row probing ONE cell then
    // meets no seed codes, and must come back (NULL, 0), not vanish
    val seeds = (0L until 20L).map { i =>
      if (i % 2 == 0) (i, Seq(10.0f, 0.0f), "a") else (i, Seq(-10.0f, 0.0f), "b")
    }.toDF("sid", "sv", "sl")
    val dir = java.nio.file.Files.createTempDirectory("graft-knnidx").toString
    PqIndex.build(seeds, "sid", "sv",
      m = 2, codesPerSub = 4, numCentroids = 2, iters = 3).write(dir)
    PqIndex.removeFrom(spark, dir,
      seeds.where(col("sl") === "b").select("sid"), "sid")
    val idx = PqIndex.load(spark, dir)
    val corpus = Seq((100L, Seq(-10.0f, 0.0f)), (101L, Seq(10.0f, 0.0f)))
      .toDF("id", "v")
    val got = Similarity.knnLabelIndexed(corpus, "id", "v", idx, seeds,
      "sid", "sv", "sl", k = 3, nProbe = 1, candidates = 10)
      .collect().map(r => r.getLong(0) -> ((Option(r.getString(1)), r.getLong(2))))
      .toMap
    assert(got.keySet == Set(100L, 101L), "every corpus row must appear")
    assert(got(101L) == ((Some("a"), 3L)))
    assert(got(100L) == ((None, 0L)), s"empty-cell row must be (NULL, 0): $got")
  }

  test("knnLabel: non-numeric seed ids pass through as the tie-break, no cast-to-null") {
    // two IDENTICAL seed vectors, different labels: the k=1 winner is
    // decided purely by the seed-id tie-break, which must compare the
    // STRING ids ("s-a" < "s-b"), not a long cast (which nulls and NPEs)
    val seeds = Seq(("s-b", Seq(1.0f, 0.0f), "late"),
      ("s-a", Seq(1.0f, 0.0f), "early")).toDF("sid", "sv", "sl")
    val corpus = Seq((10L, Seq(1.0f, 0.0f))).toDF("id", "v")
    val got = Similarity.knnLabel(corpus, "id", "v", seeds, "sid", "sv", "sl", k = 1)
      .collect()(0)
    assert(got.getString(1) == "early" && got.getLong(2) == 1L)
    // null seed ids refuse with a clear error instead of NPE-ing later
    val nullSeeds = Seq((null.asInstanceOf[String], Seq(1.0f, 0.0f), "x"))
      .toDF("sid", "sv", "sl")
    intercept[IllegalArgumentException] {
      Similarity.knnLabel(corpus, "id", "v", nullSeeds, "sid", "sv", "sl", k = 1)
    }
  }

  test("prototypePrune learned-cluster path prunes about half") {
    val rnd = new scala.util.Random(11)
    val blobs = (0L until 20L).map { i =>
      val base = if (i % 2 == 0) Array(5.0f, 0.0f, 0.0f) else Array(0.0f, 5.0f, 0.0f)
      (i, base.map(x => x + rnd.nextGaussian().toFloat * 0.1f).toSeq)
    }.toDF("id", "v")
    val kept = Similarity.prototypePrune(blobs, "id", "v", keepFrac = 0.5,
      numClusters = 2, iters = 3)
    val n = kept.count()
    assert(n >= 10L && n <= 11L) // sum of per-cluster ceil(n_c / 2)
    assert(kept.select("id").as[Long].collect().forall(_ < 20L))
  }
}
