package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search.
  *
  * Baseline: brute-force cosine top-k (exact; O(n²) pairs but no text
  * payload — only ids + vectors move). Scale path: random-hyperplane LSH
  * buckets so candidate pairs shrink to per-bucket joins; at 100 TB the
  * bucket key is the only shuffle key and the vector column stays columnar
  * until the final rerank.
  */
object Similarity {

  /** Cap for the intentionally-O(n²) exact paths (cosineTopK, exact-mode
    * cosineDupPairs). Same philosophy as starJoin's broadcast threshold
    * (Relational.scala): brute force is acceptable exactly when the whole
    * table is broadcast-small. Past this, the quadratic pair join is a
    * scale-killer and the call refuses with a pointer to the bucketed
    * paths (annLshTopK / annIvfTopK / LSH-mode cosineDupPairs).
    */
  val ExactPathMaxBytes: Long = 64L << 20

  /** Stats-based refusal for the exact O(n²) paths — checked against the
    * optimizer's size estimate, so a parquet-backed table is judged by
    * its actual bytes, not by running an action.
    */
  private def guardQuadratic(df: DataFrame, op: String, maxBytes: Long): Unit = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est > maxBytes)
      throw new IllegalStateException(
        s"$op is an exact O(n²) baseline: input estimated at $est bytes exceeds " +
          s"maxExactBytes=$maxBytes. Use the bucketed scale paths instead " +
          "(annLshTopK / annIvfTopK for top-k, cosineDupPairs with numTables>0 " +
          "for near-dup), or raise maxExactBytes deliberately for a bounded sample.")
  }

  /** Element-wise float→double cast (exact). */
  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Native codegen'd dot product (graft.functions.DotProduct) — the HOF
    * formulation aggregate(zip_with(...)) is ~20× slower (interpreted).
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.dotp(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a); val bd = asDouble(b)
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** Exact brute-force cosine top-k neighbours for every vector.
    * Norms are precomputed once; ranking is a window over the query id.
    * Refuses inputs whose optimizer-estimated size exceeds
    * `maxExactBytes` — this is the recall baseline for the ANN paths,
    * not a scale operator.
    */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
                 maxExactBytes: Long = ExactPathMaxBytes): DataFrame = {
    guardQuadratic(df, "cosineTopK", maxExactBytes)
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", norm(col("v")))
    val a = v.alias("a"); val b = v.alias("b")
    val pairs = a.join(b, col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cos"))
    val w = Window.partitionBy(col("id1")).orderBy(col("cos").desc, col("id2").asc)
    pairs.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("id1"), col("id2"), round(col("cos"), 6).as("cos"), col("rk").cast("long").as("rk"))
  }

  /** Random-hyperplane LSH bucket signature: `numPlanes` sign bits packed
    * into a long — native codegen'd expression
    * (graft.functions.HyperplaneBucket). `seed` selects an independent
    * plane set (one per LSH table).
    */
  def hyperplaneBucket(vec: Column, numPlanes: Int, seed: Int = 0): Column =
    graft.functions.VectorFunctions.hyperplaneBucket(vec, numPlanes, seed)

  /** Scored candidate pairs from shared hyperplane buckets: `numTables`
    * independent plane sets; vectors ride the LINEAR band explode
    * (n × numTables rows) so the exact cosine is computed right where the
    * bucket join co-locates the two vectors. Nothing PAIR-sized ever
    * carries a vector: the join output is slim (id1, id2, cos) rows.
    *
    * The previous shape (slim id-pair candidates + a two-sided vector
    * join-back) was measured catastrophically worse at 100× data: the
    * second join-back sort-merge-sorted candidate×vector rows — billions
    * of ~300-byte rows — spilling >70 GB where this shape sorts only the
    * n×numTables banded rows (~GBs, linear in n). Candidates duplicated
    * across tables cost one extra codegen'd dot product each; callers
    * dedup the slim output where it is cheapest (after their threshold
    * filter, or before top-k ranking).
    *
    * Hot buckets (≥ `skewedBucketFreq` members — an adversarial
    * all-near-identical embedding corpus, or a degenerate plane set)
    * join through the measured 2-D grid salt
    * ([[graft.dedup.Dedup.gridSaltedSides]] — the hamming joins'
    * machinery verbatim): each member of a hot bucket carries
    * salt = hash(id) mod fan on one side and explodes the fan on the
    * other, so the bucket's f²/2 candidate pairs spread over fan²
    * join blocks instead of landing on one task. The pair set is
    * IDENTICAL (every in-bucket pair meets in exactly one block —
    * spec-pinned); suggestedPlanes keeps buckets ~64 rows so the salt
    * is dormant on healthy corpora. Detection is a ~1.5% sampled probe
    * over the slim (t, bucket) projection — the vector column never
    * rides the probe; pass `verdictKey` (unique per dataset + params)
    * to cache its verdict JVM-wide, leaving repeat plan construction
    * job-free (the minhashLshPairs convention).
    */
  private def lshScoredPairs(v: DataFrame, numPlanes: Int, numTables: Int,
                             ordered: Boolean,
                             skewedBucketFreq: Long = 20000L,
                             saltFan: Int = 64,
                             verdictKey: String = ""): DataFrame = {
    import graft.dedup.Dedup.{gridProbeMod, gridProbeRows, gridSaltedSides}
    def banded(in: DataFrame, withVec: Boolean) = {
      val cols = if (withVec) Seq(col("id"), col("v"), col("nrm")) else Seq(col("id"))
      in.select(cols :+
          explode(array((0 until numTables).map(t =>
            struct(lit(t).as("t"),
              hyperplaneBucket(col("v"), numPlanes, seed = t).as("bucket"))): _*)).as("tb"): _*)
        .select(cols ++ Seq(col("tb.t"),
          xxhash64(concat_ws(":", col("tb.t"), col("tb.bucket"))).as("bucket")): _*)
    }
    val tabled = banded(v, withVec = true)
    val probeMod = gridProbeMod(skewedBucketFreq)
    val probe = banded(gridProbeRows(v, "id", probeMod), withVec = false)
    val (aS, bS) = gridSaltedSides(tabled, probe, probeMod,
      "id", Seq("t", "bucket"), skewedBucketFreq, saltFan,
      if (verdictKey.isEmpty) "" else s"$verdictKey#lsh$numPlanes/$numTables")
    val a = aS.alias("a"); val b = bS.alias("b")
    val idCond =
      if (ordered) col("a.id") =!= col("b.id") else col("a.id") < col("b.id")
    a.join(b, col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket") &&
        col("a.__salt") === col("b.__salt") &&
        col("a.__rsalt") === col("b.__rsalt") && idCond)
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cos"))
  }

  /** ANN via hyperplane LSH: scored candidates from shared buckets
    * (several independent tables to boost recall; cosine computed inline
    * at the bucket join), cross-table dedup on the slim pair rows, top-k.
    */
  def annLshTopK(df: DataFrame, idCol: String, vecCol: String,
                 k: Int, numPlanes: Int = 12, numTables: Int = 4,
                 verdictKey: String = ""): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", norm(col("v")))
    val w = Window.partitionBy(col("id1")).orderBy(col("cos").desc, col("id2").asc)
    lshScoredPairs(v, numPlanes, numTables, ordered = true,
        verdictKey = verdictKey)
      // same pair from different tables has the identical cosine, so the
      // dedup key is the pair alone — and it dedups 24-byte rows
      .dropDuplicates("id1", "id2")
      .withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("id1"), col("id2"), round(col("cos"), 6).as("cos"))
  }

  /** Rank centroids per vector by cosine: (id, cid) rows for each
    * vector's `n` nearest centroids. The centroid table is tiny
    * (numCentroids rows) and broadcast, so this is a map-side pass over
    * the vectors — no data×data join. Ranking is a partial-aggregating
    * groupBy (map-side `max_by` / top-n array), NOT a window: the
    * n×numCentroids scored rows reduce to n rows before the exchange and
    * nothing is sorted. Ties break toward the lower cid (same order the
    * previous window formulation used).
    */
  /** Cell assignment that CARRIES the vector (and its norm) through the
    * aggregation: (id, cid, v, nrm) with the same argmax/tie-break as
    * [[rankCentroids]](n = 1). Exists so build paths that need both the
    * assignment and the vector (IVF postings, PQ residuals, Lloyd
    * refits) pay ONE partial-aggregating pass instead of a slim
    * assignment plus an id equi-join back to the vector table — the
    * join's broadcast/shuffle build was a separate Spark job per call,
    * and the sim-tier builds make dozens of such calls (r16 verdict,
    * Next #3: e10 ran 66 jobs for 2 MB of vectors). `v`/`nrm` are
    * constant per id (one row per id), so max_by carrying them returns
    * the identical row set the join produced.
    */
  private[sim] def assignWithVec(v: DataFrame, cents: DataFrame): DataFrame =
    v.crossJoin(broadcast(cents))
      .withColumn("__ccos", dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
      .groupBy(col("id"))
      .agg(max_by(struct(col("cid"), col("v"), col("nrm")),
        struct(col("__ccos"), -col("cid"))).as("__best"))
      .select(col("id"), col("__best.cid").as("cid"),
        col("__best.v").as("v"), col("__best.nrm").as("nrm"))

  /** A driver-held LocalRelation copy of collected rows. Broadcast
    * exchanges over a LocalTableScan build driver-side WITHOUT a Spark
    * job, so iterative loops whose per-round state is structure-sized
    * (centroid/codebook tables — "always driver-collectable" by
    * declaration) re-enter the next round's plan job-free where a
    * checkpointed frame paid a broadcast-build job per consumer.
    */
  private[sim] def localTable(spark: SparkSession,
                              rows: Array[org.apache.spark.sql.Row],
                              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  private[sim] def rankCentroids(v: DataFrame, cents: DataFrame, n: Int): DataFrame = {
    // codegen'd float dot product + precomputed norms on both sides —
    // no interpreted array-cast HOFs in this per-(vector × centroid) path
    val scored = v.crossJoin(broadcast(cents))
      .withColumn("__ccos", dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
    if (n == 1)
      // assignment: declarative max_by keeps ONE (score, cid) per id in the
      // partial buffer — only n rows shuffle
      scored.groupBy(col("id"))
        .agg(max_by(col("cid"), struct(col("__ccos"), -col("cid"))).as("cid"))
    else
      // probes: per-id top-n via sorted collect over the numCentroids
      // scores (bounded, tiny) — still partial-aggregated, still no Sort
      scored.groupBy(col("id"))
        .agg(slice(array_sort(collect_list(
          struct((-col("__ccos")).as("nc"), col("cid").as("cid")))), 1, n).as("top"))
        .select(col("id"), explode(col("top.cid")).as("cid"))
  }

  /** IVF (inverted-file) ANN — the second scale path next to hyperplane
    * LSH (annLshTopK): a k-means coarse quantizer learned with a few
    * distributed Lloyd iterations, then per-centroid posting lists.
    *
    * Distributed shape: centroids live in a numCentroids-row broadcast
    * table (assignment is a map-side pass, never a data×data join);
    * centroid refit reuses the posexplode/per-dim-average machinery of
    * `centroids`; the candidate join is an equi-join on the centroid id
    * (each query probes its `nProbe` nearest cells and meets only the
    * vectors assigned there) with the exact cosine computed inline where
    * the cell join co-locates the two vectors — pair-sized rows are always
    * slim (id1, id2, cos). With nProbe = numCentroids the candidate set
    * covers every pair and the result equals the brute-force top-k
    * (asserted in spec).
    */
  def annIvfTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
                 numCentroids: Int = 16, nProbe: Int = 4, iters: Int = 3,
                 trainCap: Long = 1000000L): DataFrame = {
    require(nProbe > 0 && nProbe <= numCentroids)
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", norm(col("v")))
    val cents = trainQuantizer(v, numCentroids, iters, trainCap)
    // vectors attach to the LINEAR tables (n postings, n×nProbe probes) so
    // the exact cosine is computed inside the cell equi-join where the two
    // vectors meet; only slim (id1, id2, cos) rows exist pair-wise. The
    // previous shape (id-pair candidates + two vector join-backs) sorted
    // candidate×vector rows at 100× data — >70 GB of spill for the same
    // answer. No pair dedup is needed: each id2 lives in exactly one cell
    // and a query's probed cells are distinct.
    val postings = rankCentroids(v, cents, 1).join(v, "id")
      .select(col("id").as("id2"), col("cid"),
        col("v").as("v2"), col("nrm").as("nrm2"))
    val probes = rankCentroids(v, cents, nProbe).join(v, "id")
      .select(col("id").as("id1"), col("cid"),
        col("v").as("v1"), col("nrm").as("nrm1"))
    val w = Window.partitionBy(col("id1")).orderBy(col("cos").desc, col("id2").asc)
    probes.join(postings, "cid")
      .where(col("id1") =!= col("id2"))
      .select(col("id1"), col("id2"),
        (dot(col("v1"), col("v2")) / (col("nrm1") * col("nrm2"))).as("cos"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("id1"), col("id2"), round(col("cos"), 6).as("cos"))
  }

  /** Optimizer row-count estimate, falling back to an exact count. */
  private[sim] def estRows(v: DataFrame): Long =
    v.queryExecution.optimizedPlan.stats.rowCount.map(_.toLong)
      .getOrElse(v.count())

  /** Lloyd-train the IVF coarse quantizer over a BOUNDED seeded sample of
    * `v` (columns id/v/nrm): at 100 TB the quantizer needs ~1M
    * representative vectors, not `iters` full scans. The sample is
    * materialized once (localCheckpoint) so every Lloyd iteration re-reads
    * the bounded table. Returns the (cid, cv, cnrm) centroid table —
    * numCentroids rows, checkpointed, broadcast-ready.
    *
    * PARTITIONING NOTE (r16 optimization round): widening these bounded
    * frames to the core count was tried two ways — wrapping the
    * embeddings reader in a fill-cores exchange, and repartitioning the
    * train sample / residuals at their one materialization point — and
    * BOTH measured strictly worse at identical results (e10 warm task
    * CPU 7 → 116 s; ~0.35 s/task of fixed overhead across the builds'
    * many small stages dwarfs the map work). The 1-partition execution
    * of a ≤ trainCap-row frame is the efficient local shape; at real
    * scale the scan itself yields the parallelism. Do not re-try
    * without re-running the JobProbe A/B.
    */
  private[sim] def trainQuantizer(v: DataFrame, numCentroids: Int, iters: Int,
                                  trainCap: Long): DataFrame = {
    require(numCentroids > 0)
    require(trainCap >= numCentroids, s"trainCap=$trainCap < numCentroids=$numCentroids")
    val nEst = estRows(v)
    val trainV =
      if (nEst <= trainCap) v
      else v.sample(withReplacement = false,
          math.min(1.0, trainCap.toDouble / nEst), seed = 42L)
        .localCheckpoint(true)
    // deterministic init: the numCentroids lowest-id training vectors. The
    // centroid table carries float vectors + a precomputed norm so the
    // assignment pass is pure codegen'd arithmetic. cid is stamped with
    // monotonically_increasing_id over ONE sorted partition (the frame is
    // ≤ numCentroids rows post-limit) — same numbering a row_number window
    // would give, without WindowExec's move-everything-to-one-partition
    // shape (bounded here, but it spams the scale-warning log).
    //
    // JOB-STRUCTURE NOTE (r17 optimization round, verdict Next #3): the
    // per-round centroid table is held as a driver-side LocalRelation
    // (collect + localTable) instead of an eagerly-checkpointed frame.
    // The values are identical — the refit aggregation is unchanged,
    // collect just moves the numCentroids rows to the driver — but the
    // next round's broadcast now builds from a LocalTableScan, which
    // materializes driver-side with NO Spark job, and the refit's
    // vector is carried through assignWithVec's aggregation instead of
    // an id equi-join back to trainV (another broadcast build per
    // round). Jobs per Lloyd round: ~4 → 1. (The r16 lazy-checkpoint
    // experiment attacked the same cost and lost — e10 warm task time
    // 7.2 → 33.4 s — because a LAZY checkpoint re-evaluated the chain
    // per consumer; the LocalRelation form materializes exactly once
    // per round, on the driver, where the table lives anyway.)
    val initDf = trainV.orderBy(col("id")).limit(numCentroids)
      .coalesce(1).sortWithinPartitions(col("id"))
      .select((monotonically_increasing_id() + 1).cast("int").as("cid"),
        col("v").as("cv"), col("nrm").as("cnrm"))
    val centSchema = initDf.schema
    val spark = v.sparkSession
    var cents = localTable(spark, initDf.collect(), centSchema)
    // Shuffle-partition scope for the bounded loop (the star-contraction
    // loop's explicit-sizing precedent, Dedup.scala): the train frame is
    // ≤ trainCap rows by construction, so the refit aggregations need
    // bytes-sized partitioning, not the session's core-count default —
    // AQE's parallelismFirst mode never coalesces below the core count,
    // so every refit otherwise pays `cores` near-empty reduce tasks per
    // exchange. Sized from the bounded row count, never a constant.
    val loopP = boundedShufflePartitions(spark, math.min(nEst, trainCap))
    val prevP = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", loopP.toString)
    try {
      for (_ <- 1 to iters) {
        val assigned = assignWithVec(trainV, cents)
        // the double→float cast runs over numCentroids rows only
        val refit = centroids(assigned, "cid", "v")
          .select(col("grp").as("cid"),
            transform(col("centroid"), x => x.cast("float")).as("cv"))
          .withColumn("cnrm", norm(col("cv")))
        cents = localTable(spark, refit.collect(), centSchema)
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevP)
    cents
  }

  /** Shuffle partitions for a BOUNDED frame of `rows` ~300-byte vector
    * rows: enough partitions to keep each under ~64 MB, capped at the
    * core count, floored at 1 — the scale-adaptive replacement for the
    * session's core-count default inside bounded train loops.
    */
  private[sim] def boundedShufflePartitions(spark: SparkSession, rows: Long): Int =
    math.max(1L, math.min(spark.sparkContext.defaultParallelism.toLong,
      rows * 300L / (64L << 20))).toInt

  /** Per-group element-wise mean of an embedding column (cluster
    * centroids, per-source average embeddings). Distributed shape:
    * posexplode to (group, dim, value) rows, partial-aggregated avg per
    * (group, dim), then the per-group vector is reassembled ordered by
    * dim — no vector ever sits on the driver.
    */
  def centroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol).as("grp"), posexplode(col(vecCol)).as(Seq("dim", "e")))
      .groupBy(col("grp"), col("dim"))
      .agg(avg(col("e").cast("double")).as("c"))
      .groupBy(col("grp"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
        x => x.getField("c")).as("centroid"))

  /** Scale-aware IVF cell count: ~√n cells keep each cell ~√n rows, so a
    * fixed-nProbe search scans O(√n) candidates per query and the whole
    * all-queries search costs O(n^1.5) — a FIXED cell count degrades to
    * O(n²/k) as the corpus grows (measured: the 16-cell e02 gate ran
    * 45× slower on 10× data before sizing by n). Callers pass an
    * `approxRowCount`-style estimate; exactness is irrelevant, only the
    * order of magnitude steers the cost.
    */
  def suggestedCentroids(n: Long, minCentroids: Int = 16): Int =
    math.max(minCentroids,
      math.ceil(math.sqrt(math.max(n, 1L).toDouble)).toInt)

  /** Scale-aware hyperplane count for the LSH dup join: 2^planes buckets
    * per table sized to ~`targetBucket` rows bound per-table candidate
    * pairs at ~n·targetBucket/2 — linear in n — where a fixed plane
    * count lets buckets (and the candidate join) grow quadratically.
    * More planes lower per-table collision probability for
    * NEAR-threshold pairs; the high-cosine pairs dedup targets stay
    * caught (p_collide = (1-θ/π)^planes per table across `numTables`
    * tables). Boundary-threshold recall at corpus scale is the
    * cluster-scoped SemDedup path's job (e05/e06), not brute LSH's.
    */
  def suggestedPlanes(n: Long, targetBucket: Int = 64,
                      minPlanes: Int = 4, maxPlanes: Int = 20): Int =
    math.min(maxPlanes, math.max(minPlanes,
      math.ceil(math.log(math.max(n, 1L).toDouble / targetBucket) /
        math.log(2.0)).toInt))

  /** Embedding near-duplicate pairs: cosine ≥ threshold.
    *
    * Scale path (default): hyperplane-LSH bucket candidates + exact rerank
    * — equi-joins only, no O(n²) BroadcastNestedLoopJoin. The default
    * 8 planes × 16 tables make the per-pair miss probability at cos=0.9
    * ≈ (1-(1-acos(0.9)/π)^8)^16 ≈ 4.2e-3 (per-table collision
    * (1-0.1436)^8 ≈ 0.29), and far smaller for the closer-than-threshold
    * pairs dedup actually targets — at cos=0.99 the miss probability is
    * ≈ 2e-9; pass numTables=0 for the exact all-pairs fallback on small
    * inputs (or when the oracle demands exactness).
    */
  def cosineDupPairs(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, numPlanes: Int = 8,
                     numTables: Int = 16,
                     maxExactBytes: Long = ExactPathMaxBytes,
                     skewedBucketFreq: Long = 20000L,
                     saltFan: Int = 64,
                     verdictKey: String = ""): DataFrame = {
    if (numTables <= 0) guardQuadratic(df, "cosineDupPairs(numTables=0)", maxExactBytes)
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", norm(col("v")))
    val scored =
      if (numTables <= 0) { // exact all-pairs (test/recall-baseline mode)
        val a = v.alias("a"); val b = v.alias("b")
        a.join(b, col("a.id") < col("b.id"))
          .select(col("a.id").as("id1"), col("b.id").as("id2"),
            (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cos"))
      } else lshScoredPairs(v, numPlanes, numTables, ordered = false,
        skewedBucketFreq, saltFan, verdictKey)
    // threshold first, THEN cross-table dedup: the surviving dup set is
    // tiny, so the dedup never touches the full candidate stream
    scored.where(col("cos") >= threshold)
      .dropDuplicates("id1", "id2")
      .select(col("id1"), col("id2"), round(col("cos"), 6).as("cos"))
  }

  /** SemDedup — semantic dedup scoped to clusters (Abbas et al. 2023,
    * arXiv:2303.09540): compare embeddings ONLY within a cluster and
    * call cosine ≥ `threshold` a semantic duplicate. Clustering bounds
    * the pair join: k clusters cut candidate pairs from n²/2 to
    * ~n²/(2k), and the comparison is an equi-join on the cluster id —
    * shuffle-partitioned, AQE-skew-handled — never an all-pairs join.
    *
    * `clusterCol`: use a caller-supplied cluster column (precomputed
    * labels, an upstream model's assignment — this path is engine-
    * portable and oracle-checkable). `None`: learn a k-means coarse
    * clustering with the IVF machinery (bounded-sample Lloyd, broadcast
    * centroids, map-side max_by assignment) — the self-contained form.
    *
    * Near-dups that land in different clusters are missed — that is
    * SemDedup's documented recall trade; raise k for speed, lower it
    * for recall (k=1 is exact all-pairs, spec-asserted equal to
    * cosineDupPairs' exact mode).
    *
    * Output: (id1 < id2, cos) duplicate pairs, cos rounded 6dp.
    */
  def semDedupPairs(df: DataFrame, idCol: String, vecCol: String,
                    threshold: Double, clusterCol: Option[String] = None,
                    numClusters: Int = 256, iters: Int = 3,
                    trainCap: Long = 1000000L): DataFrame = {
    val withC = clusterCol match {
      case Some(c) =>
        df.select(col(idCol).as("id"), col(vecCol).as("v"), col(c).as("cid"))
          .withColumn("nrm", norm(col("v")))
      case None =>
        val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
          .withColumn("nrm", norm(col("v")))
        v.join(rankCentroids(v, trainQuantizer(v, numClusters, iters, trainCap), 1), "id")
    }
    // the cluster equi-join already co-locates both vectors — score inline
    // (the former id-pair + vector-join-back shape re-shuffled every
    // candidate pair twice more for nothing)
    val a = withC.alias("a"); val b = withC.alias("b")
    a.join(b, col("a.cid") === col("b.cid") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .where(col("cos") >= threshold)
      .select(col("id1"), col("id2"), round(col("cos"), 6).as("cos"))
  }

  /** The keep-side of SemDedup: greedy keep-smallest-id — a document
    * survives unless it has a semantic duplicate with a smaller id
    * (the same canonical rule the MinHash ingest index uses). One
    * anti-join against the pairs' id2 side.
    */
  def semDedupKeep(df: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, clusterCol: Option[String] = None,
                   numClusters: Int = 256, iters: Int = 3,
                   trainCap: Long = 1000000L): DataFrame = {
    val dropped = semDedupPairs(df, idCol, vecCol, threshold, clusterCol,
      numClusters, iters, trainCap).select(col("id2")).distinct()
    df.join(dropped, df(idCol) === col("id2"), "left_anti")
  }

  /** Prototype-distance data pruning (Sorscher et al. 2022, "Beyond
    * neural scaling laws" — the SSL-prototypes metric; composed with
    * SemDedup it is D4, Abbas et al. 2023): rank every example by
    * cosine to its cluster's PROTOTYPE (the centroid) and keep the
    * `keepFrac` fraction FARTHEST from it per cluster — prototypical
    * (easy, redundant) examples prune first, which is the
    * keep-hard-examples rule the paper shows beats random pruning when
    * data is abundant.
    *
    * Determinism/portability: centroids are 6dp-rounded per dimension
    * BEFORE scoring and cosines 6dp-rounded BEFORE ranking, with the id
    * as tie-break — so the kept set is a pure function of the input and
    * replays exactly in any engine (gate e14). `clusterCol` supplies
    * precomputed labels (the oracle-checkable path); `None` learns a
    * k-means coarse clustering with the IVF machinery, like SemDedup.
    *
    * Scale: one posexplode aggregation for centroids (k·dim rows), a
    * BROADCAST join back (k vectors), then ONE shuffle on the cluster
    * id for the per-cluster rank window. Cluster sizes are ~n/k by
    * construction (k ~ √n via suggestedCentroids), so no window
    * partition degenerates; the vector column never reaches the driver.
    *
    * Output: (id, cid, cos) of the KEPT rows, cos to the prototype
    * rounded 6dp.
    */
  def prototypePrune(df: DataFrame, idCol: String, vecCol: String,
                     keepFrac: Double, clusterCol: Option[String] = None,
                     numClusters: Int = 256, iters: Int = 3,
                     trainCap: Long = 1000000L): DataFrame = {
    require(keepFrac > 0.0 && keepFrac <= 1.0,
      s"keepFrac must be in (0, 1], got $keepFrac")
    val withC = clusterCol match {
      case Some(c) =>
        df.select(col(idCol).as("id"), col(vecCol).as("v"), col(c).as("cid"))
      case None =>
        val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
          .withColumn("nrm", norm(col("v")))
        v.join(rankCentroids(v, trainQuantizer(v, numClusters, iters, trainCap), 1), "id")
          .select(col("id"), col("v"), col("cid"))
    }
    val protos = centroids(withC, "cid", "v")
      .select(col("grp").as("cid"),
        transform(col("centroid"), c => round(c, 6)).as("cv"))
    val vd = asDouble(col("v"))
    val scored = withC.join(broadcast(protos), "cid")
      .select(col("id"), col("cid"),
        round(dot(vd, col("cv")) / (norm(vd) * norm(col("cv"))), 6).as("cos"))
    val w = Window.partitionBy(col("cid")).orderBy(col("cos").asc, col("id").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("cid"))))
      .where(col("rnk") <= ceil(col("n") * lit(keepFrac)))
      .select(col("id"), col("cid"), col("cos"))
  }

  /** KNN label propagation from a SMALL labeled seed set — the
    * semi-supervised labeling step modern corpus pipelines run between
    * "a few thousand expert/model-graded examples" and "a label on
    * every document" (the FineWeb-Edu recipe: grade a seed set, then
    * classify the corpus by embedding neighborhood; classic
    * semi-supervised KNN, Zhu & Ghahramani 2002). Every row of `df`
    * gets the majority label of its k nearest seeds by cosine.
    *
    * Scale shape: the seed set collects to the DRIVER and ships as one
    * literal (the PQ-codebook/ADC-LUT convention) — scoring is then
    * MAP-ONLY: no join, no shuffle, n·|seeds| codegen'd dot products.
    * That is the honest cost of brute KNN against a bounded seed set
    * and the right plan at 100 TB (the corpus never moves); `maxSeeds`
    * refuses unbounded "seed" tables — for seed sets past driver size,
    * search an IvfIndex/PqIndex instead and vote over its results.
    *
    * Determinism/portability: cosines 6dp-rounded BEFORE ranking
    * (IEEE −0.0 normalized away, the e13 lesson), seed-id ascending
    * tie-break, majority vote broken toward the lexicographically
    * smaller label — the assignment replays exactly in any engine
    * (gate e15).
    *
    * Output: (id, label_pred string, votes long).
    */
  def knnLabel(df: DataFrame, idCol: String, vecCol: String,
               seeds: DataFrame, seedIdCol: String, seedVecCol: String,
               seedLabelCol: String, k: Int,
               maxSeeds: Int = 2048): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // The seed id is only a deterministic tie-break: keep numeric ids
    // numeric (the e15 oracle's ordering) but pass any other type
    // through as string — forcing long would cast e.g. string ids to
    // null and NPE below (round-12 advice).
    val idIsNumeric = seeds.schema(seedIdCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    val seedRows = seeds.select(
      (if (idIsNumeric) col(seedIdCol).cast("long")
       else col(seedIdCol).cast("string")),
      transform(col(seedVecCol), x => x.cast("double")),
      col(seedLabelCol).cast("string")).collect()
    require(seedRows.nonEmpty, "knnLabel: empty seed set")
    require(seedRows.forall(!_.isNullAt(0)),
      "knnLabel: seed ids must be non-null (they are the deterministic tie-break)")
    require(seedRows.length <= maxSeeds,
      s"knnLabel: ${seedRows.length} seeds exceed maxSeeds=$maxSeeds — the " +
        "seeds ship as ONE Catalyst literal tree (seeds × dims constant " +
        "nodes), which analysis and codegen only tolerate at a few " +
        "thousand vectors; use knnLabelIndexed (PqIndex.build over the " +
        "seeds, ADC prefilter + exact rerank + the same vote) for larger " +
        "labeled corpora, or raise the cap deliberately for " +
        "low-dimensional seeds")
    val labels = seedRows.map(_.getString(2)).distinct.sorted
    val seedLit = array(seedRows.map { r =>
      val v = r.getSeq[Double](1)
      val nrm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
      val sid = if (idIsNumeric) lit(r.getLong(0)) else lit(r.getString(0))
      struct(sid.as("sid"),
        lit(r.getString(2)).as("sl"),
        typedLit(v).as("sv"), lit(nrm).as("snrm"))
    }: _*)
    val vd = asDouble(col(vecCol))
    val scored = df.select(col(idCol).as("id"),
      transform(seedLit, e => struct(
        // ascending struct sort = cosine DESC via negation; +0.0 folds
        // IEEE −0.0 into 0.0 so both engines tie-break on sid alone
        (-round(dot(vd, e.getField("sv")) / (norm(vd) * e.getField("snrm")), 6)
          + lit(0.0)).as("negcos"),
        e.getField("sid").as("sid"),
        e.getField("sl").as("sl"))).as("__scored"))
    val topk = scored.select(col("id"),
      slice(array_sort(col("__scored")), 1, k).as("__topk"))
    val counted = topk.select(col("id") +: labels.zipWithIndex.map { case (l, i) =>
      size(filter(col("__topk"), x => x.getField("sl") === lit(l)))
        .cast("long").as(s"__c_$i")
    }: _*)
    // argmax over the label vocabulary, ascending order + strict > keeps
    // the lexicographically smaller label on vote ties
    val (bestLabel, bestVotes) = labels.zipWithIndex.tail.foldLeft(
      (lit(labels.head), col("__c_0"))) {
      case ((bl, bc), (l, i)) =>
        val c = col(s"__c_$i")
        (when(c > bc, lit(l)).otherwise(bl), when(c > bc, c).otherwise(bc))
    }
    counted.select(col("id"), bestLabel.as("label_pred"), bestVotes.as("votes"))
  }

  /** [[knnLabel]] for seed sets PAST the literal cap — the composition
    * knnLabel's refusal points at: the labeled seeds live in a served
    * [[PqIndex]] (built over (seed id, seed vector) — any size, the
    * compressed tier), each corpus row ADC-prefilters to `candidates`
    * seed neighbors ([[PqIndex.searchBatch]]), the survivors rerank by
    * EXACT cosine against the seed vector table, and the top-k vote with
    * knnLabel's exact machinery (cosine 6dp-rounded before ranking,
    * seed-id ascending tie-break, vote ties to the lexicographically
    * smaller label). With full probe and `candidates` ≥ |seeds| the ADC
    * prefilter keeps every seed, so the result EQUALS the brute literal
    * path id-for-id (SimilaritySpec pins it); at production settings the
    * usual IVF-PQ recall trade applies.
    *
    * Scale shape: no seed literal, no window over the corpus — the ADC
    * join meets only probed cells' codes, the rerank joins the bounded
    * (corpus × candidates) rows to the seed table on the seed id, and
    * the two ranking windows partition by corpus id (≤ candidates rows
    * each). Seeds scale with the index tier, corpus scales map-wise:
    * the 100 TB shape for "label the crawl from a million graded docs".
    *
    * Output: (idCol, label_pred string, votes long) — knnLabel's
    * schema, one row per corpus row; rows the prefilter found no seed
    * candidates for carry (NULL, 0).
    */
  def knnLabelIndexed(df: DataFrame, idCol: String, vecCol: String,
                      index: PqIndex, seeds: DataFrame,
                      seedIdCol: String, seedVecCol: String,
                      seedLabelCol: String, k: Int,
                      nProbe: Int = 4, candidates: Int = 64): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(candidates >= k,
      s"candidates ($candidates) must be >= k ($k): the exact rerank can " +
        "only keep what the ADC prefilter returns")
    val cand = index.searchBatch(df.select(col(idCol), col(vecCol)),
      idCol, vecCol, k = candidates, nProbe = nProbe)
    val sv = seeds.select(col(seedIdCol).as("id2"),
      asDouble(col(seedVecCol)).as("__sv"),
      col(seedLabelCol).cast("string").as("__sl"))
    val qv = df.select(col(idCol).as("id1"), asDouble(col(vecCol)).as("__qv"))
    // knnLabel's exact scoring arithmetic (6dp round, −0.0 folded away)
    // so the two paths agree wherever the prefilter kept the true top-k
    val scored = cand.join(sv, Seq("id2")).join(qv, Seq("id1"))
      .select(col("id1"), col("id2"), col("__sl"),
        (-round(dot(col("__qv"), col("__sv"))
          / (norm(col("__qv")) * norm(col("__sv"))), 6) + lit(0.0)).as("__negcos"))
    val wr = Window.partitionBy(col("id1"))
      .orderBy(col("__negcos").asc, col("id2").asc)
    val topk = scored.withColumn("__rk", row_number().over(wr))
      .where(col("__rk") <= k)
    val wv = Window.partitionBy(col("id1"))
      .orderBy(col("__votes").desc, col("__sl").asc)
    val voted = topk.groupBy(col("id1"), col("__sl"))
      .agg(count(lit(1)).as("__votes"))
      .withColumn("__vr", row_number().over(wv)).where(col("__vr") === 1)
      .select(col("id1"), col("__sl"), col("__votes"))
    // EVERY corpus row appears in the output (knnLabel's contract): a
    // row whose probed cells held no seed codes (empty or fully
    // tombstoned cells at low nProbe) comes back with a NULL label and
    // 0 votes — observable, never silently dropped; raise nProbe /
    // candidates to close that recall gap, the standard IVF trade
    qv.select(col("id1")).join(voted, Seq("id1"), "left")
      .select(col("id1").as(idCol), col("__sl").as("label_pred"),
        coalesce(col("__votes"), lit(0L)).as("votes"))
  }

  // ---- int8 embedding quantization (storage scale path) ---------------

  /** Per-vector affine int8 quantization: codes = round((x − min)/scale)
    * − 128 with scale = (max − min)/255 — 4× smaller embedding storage
    * with ≤ scale/2 per-element error, which is what a 100 TB embedding
    * corpus actually ships to disk; search paths rerank on dequantized
    * vectors (see SimilaritySpec's recall assertion). Output columns:
    * id, vmin, vmax (double), codes (array<tinyint>).
    *
    * The arithmetic is all double-precision IEEE with half-away-from-zero
    * rounding — semantics shared by every SQL engine, so the exact codes
    * replay in DuckDB (gate e04). Constant vectors (max == min) take
    * scale 1 and quantize to all −128, dequantizing exactly.
    *
    * Runs through `transform` HOFs: a one-time STORAGE pass over the
    * corpus, not a per-query hot path — clarity wins over codegen here
    * (the query-side kernels in VectorExpressions stay codegen'd).
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val e = transform(col(vecCol), x => x.cast("double"))
    df.select(col(idCol).as("id"),
        array_min(col(vecCol)).cast("double").as("vmin"),
        array_max(col(vecCol)).cast("double").as("vmax"),
        e.as("__e"))
      .withColumn("__scale",
        when(col("vmax") > col("vmin"), (col("vmax") - col("vmin")) / lit(255.0))
          .otherwise(lit(1.0)))
      .withColumn("codes", transform(col("__e"),
        x => (round((x - col("vmin")) / col("__scale"))
          .cast("int") - lit(128)).cast("tinyint")))
      .drop("__e", "__scale")
  }

  /** Inverse of [[quantizeInt8]]: x' = vmin + (code + 128)·scale, as
    * float (the storage element type). Max reconstruction error is
    * scale/2 per element.
    */
  def dequantizeInt8(codes: Column, vmin: Column, vmax: Column): Column = {
    val scale = when(vmax > vmin, (vmax - vmin) / lit(255.0)).otherwise(lit(1.0))
    transform(codes,
      c => (vmin + (c.cast("double") + lit(128.0)) * scale).cast("float"))
  }
}
