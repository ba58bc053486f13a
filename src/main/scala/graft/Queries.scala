package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cube._
import graft.tables.Tpch

/** The driver-checked query inventory (SURVEY.md §2). Every entry runs
  * through the graft engine (CubeQuery → Slicer) — not raw SQL — and has a
  * DuckDB oracle unless it is a rows-only operator.
  *
  * Convention for oracle comparability: double outputs are rounded (sums
  * to 2 dp, ratios/stddevs to 6 dp) and integer outputs are cast to BIGINT
  * on both sides, so value hashing is immune to FP summation order and
  * int-width differences between engines.
  */
object Queries {
  type Q = (SparkSession, String) => DataFrame

  private def li(s: SparkSession, dir: String) = Tpch.table(s, dir, "lineitem")
  private def ord(s: SparkSession, dir: String) = Tpch.table(s, dir, "orders")
  private def part(s: SparkSession, dir: String) = Tpch.table(s, dir, "part")
  private def ev(s: SparkSession, dir: String) = Tpch.table(s, dir, "events")

  /** Oracle-checked query. */
  private def oq(sql: String)(f: Q): (Q, Option[String]) = (f, Some(sql.stripMargin))
  /** Rows-only query (no SQL-expressible oracle). */
  private def nq(f: Q): (Q, Option[String]) = (f, None)

  /** Scratch dirs created by the per-JVM materialized caches below
    * (sample tables, serve indexes, LM ladders) plus the per-invocation
    * index-build gates, all registered for a shutdown-hook delete:
    * these hold full parquet copies of corpus slices (20% of documents,
    * half the embedding table plus PQ/IVF indexes), so repeated
    * bench/verify JVMs would otherwise accumulate multi-GB temp data at
    * sf10. Best-effort: a kill -9 still leaks, but every normal JVM
    * exit — including a failed run — cleans up after itself.
    */
  private val scratchDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    scratchDirs.forEach { root =>
      try {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        val all = Files.walk(root)
        try all.sorted(Comparator.reverseOrder[Path]())
          .forEach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
        finally all.close()
      } catch { case _: Exception => () }
    }
  }, "graft-scratch-cleanup"))

  private[graft] def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    scratchDirs.add(p)
    p.toString
  }

  /** Per-JVM PQ index dirs for the e11/e12 serve-path gates: sf dir →
    * a built-and-written index, created on first use so repeated
    * invocations (bench reps) measure search-only cost — the
    * build-once/serve-many contract the index exists for.
    */
  private val pqServeIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The one serve-index build both gates share (e11 and e12 key the
    * same map, so they must build identically or silently serve from
    * whichever gate ran first).
    */
  private def pqServeIndexDir(s: SparkSession, dir: String): String =
    pqServeIndexes.computeIfAbsent(dir, d => {
      val tmp = scratchDir("graft-pq-srv")
      val eAll = emb(s, d)
      graft.sim.PqIndex.build(eAll.where(col("vec_id") =!= 0L),
          "vec_id", "embedding", m = 8, codesPerSub = 16,
          numCentroids = graft.sim.Similarity.suggestedCentroids(
            graft.dedup.Dedup.approxRowCount(eAll)), iters = 2)
        .write(tmp)
      tmp
    })

  /** Per-JVM persistent IVF index for the e03b serve gate — the
    * e10/e11 build/serve split applied to the IVF tier (round-14
    * verdict, Next #2): e03 keeps pricing the one-time build + write
    * (and stays the correctness gate); this index builds once per JVM
    * per sf dir with e03's exact sizing, so e03b's median prices load +
    * probe alone — the production serve shape (an index outlives the
    * queries against it).
    */
  private val ivfServeIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ivfServeIndexDir(s: SparkSession, dir: String): String =
    ivfServeIndexes.computeIfAbsent(dir, d => {
      val tmp = scratchDir("graft-ivf-srv")
      val e = emb(s, d)
      val cents = graft.sim.Similarity.suggestedCentroids(
        graft.dedup.Dedup.approxRowCount(e))
      graft.sim.IvfIndex.build(e, "vec_id", "embedding",
        numCentroids = cents, iters = 2,
        trainCap = math.max(2000, 40 * cents)).write(tmp)
      tmp
    })

  /** Per-JVM seed PqIndex for the e16 big-seed KNN serve gate — the
    * e10/e11 build/serve split applied to the label-propagation tier
    * (round-13 verdict, Next #2): the seed index (two Lloyd trainings +
    * codes over the half-table seed set) builds + writes ONCE per JVM
    * per sf dir; every later invocation — bench reps 2..n, whose median
    * is the recorded wall — prices load + ADC prefilter + exact rerank
    * + vote only. That is the production shape: "label the crawl from a
    * million graded docs" builds the graded-seed index once per seed
    * generation, never per labeling batch.
    */
  private val e16SeedIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def e16SeedIndexDir(s: SparkSession, dir: String): String =
    e16SeedIndexes.computeIfAbsent(dir, d => {
      val tmp = scratchDir("graft-e16-srv")
      val seeds = sampleTable(s, d, "embeddings", "m2r0")(col("vec_id") % 2 === 0)
      graft.sim.PqIndex.build(seeds, "vec_id", "embedding",
          m = 8, codesPerSub = 16,
          numCentroids = graft.sim.Similarity.suggestedCentroids(
            graft.dedup.Dedup.approxRowCount(seeds)), iters = 2)
        .write(tmp)
      tmp
    })

  /** Per-JVM persisted CharLangId model dirs for the d51b serve gate —
    * the pqServeIndexDir convention: trained on the SAME constant
    * 250-doc labeled slice as d51 and written once per sf dir, so
    * repeated invocations (bench reps) measure load + score only. d51
    * keeps pricing the one-time train (the e10/e11 build/serve split).
    */
  private val langIdServeModels =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def langIdServeModelDir(s: SparkSession, dir: String): String =
    langIdServeModels.computeIfAbsent(dir, d => {
      val tmp = scratchDir("graft-lid-srv")
      graft.text.CharLangId.write(
        graft.text.CharLangId.train(
          sampleTable(s, d, "documents", "lt250")(col("doc_id") < 250),
          "text", "lang"), tmp)
      tmp
    })

  /** Per-JVM MATERIALIZED constant-sample tables — the fix for the
    * sampled-gate scan floor (round-13 verdict, Next #1). A constant
    * modulo sample (`doc_id % 25 = 2`) cannot row-group-prune: the test
    * tables scatter ids across files (sf10 documents: one row group
    * spans ids 3..499992), so every invocation of a sampled gate paid
    * the FULL corpus text read to produce a few-percent slice — the
    * measured d51b wall was the scan, not the scoring (SURVEY §8l).
    * Materializing each constant slice once per JVM per sf dir (the
    * pqServeIndexDir convention) makes every later invocation — bench
    * reps 2..n, whose median is the recorded wall — read only the
    * sample itself. This is the production layout, not a bench trick:
    * a constant eval/serve slice of a 100 TB crawl is written once and
    * read many times, never re-derived from the crawl per query. The
    * oracles keep reading the BASE table with the same modulo predicate
    * — identical rows by construction, so every gate's oracle strength
    * is unchanged.
    */
  private val sampleTables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def sampleTable(s: SparkSession, dir: String, table: String,
      key: String)(pred: org.apache.spark.sql.Column): DataFrame = {
    val path = sampleTables.computeIfAbsent(s"$dir#$table#$key", _ => {
      val tmp = scratchDir("graft-sample")
      Tpch.table(s, dir, table).where(pred).write.mode("overwrite").parquet(tmp)
      tmp
    })
    // The read-back is BARE: most consumers are light scoring passes
    // where a fill-the-cores exchange measured as a net loss (see the
    // docs/docsWide comment) — the one heavy consumer (d52s's Gopher
    // battery) wraps its slice in Tpch.fillCores at the call site.
    s.read.parquet(path)
  }

  /** Per-JVM MATERIALIZED n-gram LM ladder (round-14 verdict, Next #1 —
    * the sampleTable convention applied to DERIVED aggregates): the
    * d31/d36/d41/d43/d46 perplexity family each trained overlapping
    * n-gram count tables from the 'en' corpus slice per gate — five
    * corpus scans + shuffles per sweep rep rebuilding what is ONE
    * Zipf-bounded artifact (d46 alone rebuilt the whole 1..5 ladder per
    * invocation, 71.5 s at sf10). Here the full ladder — exactly
    * [[graft.text.CorpusOps.ngramLms]](en, 5, minN = 1), one corpus
    * pass, one aggregation — is written once per JVM per sf dir,
    * partitioned by order so each gate's tier read partition-prunes to
    * its own files. This is the production layout: a 100 TB pipeline
    * trains its reference LM once per corpus generation and scores many
    * batches against the stored counts, never retraining per query.
    * The oracles keep replaying train + score from the BASE table —
    * counts are exact integers, so the materialized ladder is
    * row-identical to the per-gate rebuild by construction
    * (CorpusOpsSpec pins every tier == the per-order builders,
    * including the named-column bigram/trigram derivations below).
    */
  private val lmLadders =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** One tier of the materialized ladder as (ctx, token, ngram_count) —
    * the [[graft.text.CorpusOps.ngramLm]] shape (ctx = "" at n = 1).
    */
  private def lmTier(s: SparkSession, dir: String, n: Int): DataFrame = {
    val path = lmLadders.computeIfAbsent(dir, d => {
      val tmp = scratchDir("graft-lm")
      val lms = graft.text.CorpusOps.ngramLms(
        docsWide(s, d).where(col("lang") === "en"), "text", 5, minN = 1)
      // ctx totals DENORMALIZED onto every row at build time: the
      // Stupid Backoff ladder reads a tier's total only when the
      // (ctx, token) row exists, so carrying it here removes one
      // grain-sized join per tier from every scoring query
      lms.join(lms.groupBy(col("n"), col("ctx"))
            .agg(sum(col("ngram_count")).as("ctx_total")),
          Seq("n", "ctx"))
        .write.mode("overwrite").partitionBy("n").parquet(tmp)
      tmp
    })
    s.read.parquet(path).where(col("n") === n)
      .select(col("ctx"), col("token"), col("ngram_count"), col("ctx_total"))
  }

  /** The ladder's unigram tier in [[graft.text.CorpusOps.unigramLm]]'s
    * (token, token_count) shape — spec-pinned equal, including 1-token
    * documents no higher order sees.
    */
  private def lmUnigram(s: SparkSession, dir: String): DataFrame =
    lmTier(s, dir, 1).select(col("token"), col("ngram_count").as("token_count"))

  /** The n = 2 tier in [[graft.text.CorpusOps.bigramLm]]'s named-column
    * shape: a bigram's ctx IS the single previous token.
    */
  private def lmBigram(s: SparkSession, dir: String): DataFrame =
    lmTier(s, dir, 2).select(col("ctx").as("prev_token"), col("token"),
      col("ngram_count").as("bigram_count"))

  /** The n = 3 tier in [[graft.text.CorpusOps.trigramLm]]'s shape: the
    * space-joined 2-token ctx splits back bijectively (whitespace
    * tokenization — tokens contain no spaces), spec-pinned equal.
    */
  private def lmTrigram(s: SparkSession, dir: String): DataFrame = {
    val c = split(col("ctx"), " ")
    lmTier(s, dir, 3).select(element_at(c, 1).as("prev2_token"),
      element_at(c, 2).as("prev_token"), col("token"),
      col("ngram_count").as("trigram_count"))
  }

  /** Per-JVM MATERIALIZED MinHash/shingle artifact table (round-15
    * verdict, Next #1 — the lmTier convention applied to the dedup
    * family): seven gates re-derived the same corpus-wide artifacts per
    * invocation — d02s + d49 each rebuilt the word-3-shingle inverted
    * index, and d03/d15/d30/d34/t17 each rebuilt the MinHash
    * signature/band tables inside minhashLshPairs. Here
    * [[graft.dedup.Dedup.minhashArtifacts]](k = 3, numHashes = 32) —
    * one corpus pass + one df aggregation producing (id, sz, shs, dfs,
    * sig) with `shs` globally df-sorted — is written once per JVM per
    * sf dir; the LSH consumers band + verify from the store
    * ([[graft.dedup.Dedup.minhashLshPairsFromArtifacts]]) and the
    * exact-shingle consumers project from the SECOND-TIER store
    * [[dedupShinglePairs]] (the near-dup pair core, see below). This is
    * the production layout: a 100 TB pipeline shingles + signs its
    * corpus once per generation and runs every dedup decision off the
    * stored artifacts, never re-tokenizing per query. The oracles keep
    * replaying shingling from the BASE documents table — pair sets are
    * identical by construction (DedupSpec pins store-fed == direct-call
    * for all three consumers, through a real parquet round-trip).
    */
  private val dedupArtifactStores =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def dedupArtifacts(s: SparkSession, dir: String): DataFrame = {
    val path = dedupArtifactStores.computeIfAbsent(dir, d => {
      val tmp = scratchDir("graft-mh")
      graft.dedup.Dedup.minhashArtifacts(docsWide(s, d), "doc_id", "text",
          k = 3, numHashes = 32)
        .write.mode("overwrite").parquet(tmp)
      tmp
    })
    // BARE read-back: banding + verification above this scan are light
    // enough that the fill-the-cores exchange measured as a small net
    // loss across all five LSH consumers (interleaved on/off minima:
    // d03 -0.13, d15 -0.15, d34 -0.17, t17 -0.23, d30 +0.16 noise) —
    // see the docs/docsWide comment for the per-gate fill policy.
    s.read.parquet(path)
  }

  /** The store-fed MinHash-LSH pair set at the gate parameters — the
    * one expression d03/d15/d30/d34/t17 all consume.
    */
  private def minhashPairsFromStore(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.minhashLshPairsFromArtifacts(dedupArtifacts(s, dir),
      numHashes = 32, bands = 8, threshold = 0.5,
      verdictKey = s"$dir#docs")

  /** Per-JVM MATERIALIZED near-dup PAIR table (the artifact lever
    * applied one level up, the same argument the round-15 verdict made
    * for e02: d02s and d49 consumed the IDENTICAL inverted-index
    * join+count pass at identical parameters (k = 3, cut = 0.1,
    * thresholds >= 0.5), so running it per gate priced the same derived
    * artifact twice). [[graft.dedup.Dedup.shinglePairsFromArtifacts]]
    * over the [[dedupArtifacts]] store — the cut is a per-row `dfs`
    * filter, no query-time corpus aggregations — writes (id1, id2, sz1,
    * sz2, inter) for every pair with max-containment >= 0.5, once per
    * JVM per sf dir; d02s and d49 are per-row projections of it
    * (J and C are both <= max-containment, so their 0.5-threshold
    * answers are exactly derivable). The production reading: the
    * near-dup pair table is built once per corpus generation and every
    * dedup decision — keep/drop, cluster, split — reads it. The build
    * is priced in the first consumer's cold rep (the lmTier / serve-
    * index convention); the oracles keep replaying the full
    * shingle-from-text computation in DuckDB against the BASE table.
    */
  private val dedupPairStores =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def dedupShinglePairs(s: SparkSession, dir: String): DataFrame = {
    val path = dedupPairStores.computeIfAbsent(dir, d => {
      val tmp = scratchDir("graft-shpairs")
      val art = dedupArtifacts(s, d)
      graft.dedup.Dedup.shinglePairsFromArtifacts(art,
          nDocs = graft.dedup.Dedup.approxRowCount(art),
          minCoeff = 0.5, stopShingleFraction = 0.1)
        .write.mode("overwrite").parquet(tmp)
      tmp
    })
    s.read.parquet(path)
  }

  /** The d52 oracle SQL — the full Gopher Table-A1 replay — factored
    * out so the t05 composed-pipeline oracle can chain the IDENTICAL
    * battery as a keep-filter CTE. Parameterized only on the stop-hits
    * gate (see gopherSignals: the stop list is English-specific; every
    * other threshold stays at its published value).
    */
  private[graft] def gopherSigSql(minStopHits: Int): String = (
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(coalesce(text,''))), '\s+'), x -> len(x) > 0) AS tk,
        |    list_filter(list_transform(string_split(coalesce(text,''), chr(10)), s -> trim(s)), s -> len(s) > 0) AS ln,
        |    list_filter(list_transform(string_split_regex(coalesce(text,''), '\n{2,}'), s -> trim(s)), s -> len(s) > 0) AS pg,
        |    len(regexp_extract_all(coalesce(text,''), '#|\.\.\.|…')) AS sym
        |  FROM documents
        |), base AS (
        |  SELECT doc_id, tk, sym, len(tk) AS n,
        |    coalesce(list_aggregate(list_transform(tk, x -> len(x)), 'sum'), 0) AS tc,
        |    len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS alpha,
        |    len(list_intersect(list_distinct(tk),
        |      ['the','be','to','of','and','that','have','with'])) AS stop,
        |    len(ln) AS nl,
        |    len(list_filter(ln, l -> regexp_matches(l, '^([-*•]|[0-9]+[.)])\s'))) AS bullet,
        |    len(list_filter(ln, l -> regexp_matches(l, '(\.\.\.|…)$'))) AS ellip
        |  FROM t
        |), seg AS (
        |  SELECT doc_id, 'l' AS kind, seg FROM (SELECT doc_id, unnest(ln) AS seg FROM t)
        |  UNION ALL
        |  SELECT doc_id, 'p' AS kind, seg FROM (SELECT doc_id, unnest(pg) AS seg FROM t)
        |), segc AS (
        |  SELECT doc_id, kind, seg, count(*) AS c, len(seg) AS cl
        |  FROM seg GROUP BY 1, 2, 3, 5
        |), sega AS (
        |  SELECT doc_id, kind, count(*) AS nd, sum(c) AS cnt,
        |    sum((c - 1) * cl) AS dup, sum(c * cl) AS tot
        |  FROM segc GROUP BY 1, 2
        |), g AS (
        |  SELECT doc_id, nn.gn AS gn,
        |    CASE WHEN len(tk) >= nn.gn THEN list_transform(range(len(tk) - nn.gn + 1),
        |      i -> array_to_string(tk[i+1:i+nn.gn], ' ')) ELSE [] END AS grams
        |  FROM t CROSS JOIN (SELECT unnest([2,3,4,5,6,7,8,9,10]) AS gn) nn
        |), gc AS (
        |  SELECT doc_id, gn, gram, count(*) AS c, len(gram) - (gn - 1) AS cl
        |  FROM (SELECT doc_id, gn, unnest(grams) AS gram FROM g) GROUP BY 1, 2, 3, 5
        |), gc2 AS (
        |  SELECT *, max(c) OVER (PARTITION BY doc_id, gn) AS mc FROM gc
        |), ga AS (
        |  SELECT doc_id, gn, max(CASE WHEN c = mc THEN c * cl END) AS topm,
        |    sum((c - 1) * cl) AS dupm
        |  FROM gc2 GROUP BY 1, 2
        |), gp AS (
        |  SELECT doc_id,
        |    coalesce(max(CASE WHEN gn = 2 THEN topm END), 0) AS top2,
        |    coalesce(max(CASE WHEN gn = 3 THEN topm END), 0) AS top3,
        |    coalesce(max(CASE WHEN gn = 4 THEN topm END), 0) AS top4,
        |    coalesce(max(CASE WHEN gn = 5 THEN dupm END), 0) AS dup5,
        |    coalesce(max(CASE WHEN gn = 6 THEN dupm END), 0) AS dup6,
        |    coalesce(max(CASE WHEN gn = 7 THEN dupm END), 0) AS dup7,
        |    coalesce(max(CASE WHEN gn = 8 THEN dupm END), 0) AS dup8,
        |    coalesce(max(CASE WHEN gn = 9 THEN dupm END), 0) AS dup9,
        |    coalesce(max(CASE WHEN gn = 10 THEN dupm END), 0) AS dup10
        |  FROM ga GROUP BY 1
        |), sigs AS (
        |  SELECT b.doc_id,
        |    CAST(b.n AS BIGINT) AS n_words,
        |    CASE WHEN b.n <= 0 THEN 0.0 ELSE round(b.tc / CAST(b.n AS DOUBLE), 6) END AS mean_word_len,
        |    CASE WHEN b.n <= 0 THEN 0.0 ELSE round(b.sym / CAST(b.n AS DOUBLE), 6) END AS symbol_word_ratio,
        |    CASE WHEN b.n <= 0 THEN 0.0 ELSE round(b.alpha / CAST(b.n AS DOUBLE), 6) END AS alpha_word_frac,
        |    CAST(b.stop AS BIGINT) AS stop_hits,
        |    CASE WHEN b.nl <= 0 THEN 0.0 ELSE round(b.bullet / CAST(b.nl AS DOUBLE), 6) END AS bullet_line_frac,
        |    CASE WHEN b.nl <= 0 THEN 0.0 ELSE round(b.ellip / CAST(b.nl AS DOUBLE), 6) END AS ellipsis_line_frac,
        |    CASE WHEN coalesce(l.cnt, 0) <= 0 THEN 0.0
        |         ELSE round((l.cnt - l.nd) / CAST(l.cnt AS DOUBLE), 6) END AS dup_line_frac,
        |    CASE WHEN coalesce(l.tot, 0) <= 0 THEN 0.0
        |         ELSE round(l.dup / CAST(l.tot AS DOUBLE), 6) END AS dup_line_char_frac,
        |    CASE WHEN coalesce(p.cnt, 0) <= 0 THEN 0.0
        |         ELSE round((p.cnt - p.nd) / CAST(p.cnt AS DOUBLE), 6) END AS dup_para_frac,
        |    CASE WHEN coalesce(p.tot, 0) <= 0 THEN 0.0
        |         ELSE round(p.dup / CAST(p.tot AS DOUBLE), 6) END AS dup_para_char_frac,
        |    CASE WHEN b.n < 2 OR b.tc <= 0 THEN 0.0 ELSE round(least(g.top2 / CAST(b.tc AS DOUBLE), 1.0), 6) END AS top_2gram_char_frac,
        |    CASE WHEN b.n < 3 OR b.tc <= 0 THEN 0.0 ELSE round(least(g.top3 / CAST(b.tc AS DOUBLE), 1.0), 6) END AS top_3gram_char_frac,
        |    CASE WHEN b.n < 4 OR b.tc <= 0 THEN 0.0 ELSE round(least(g.top4 / CAST(b.tc AS DOUBLE), 1.0), 6) END AS top_4gram_char_frac,
        |    CASE WHEN b.n < 5 OR b.tc <= 0 THEN 0.0 ELSE round(least(g.dup5 / CAST(b.tc AS DOUBLE), 1.0), 6) END AS dup_5gram_char_frac,
        |    CASE WHEN b.n < 6 OR b.tc <= 0 THEN 0.0 ELSE round(least(g.dup6 / CAST(b.tc AS DOUBLE), 1.0), 6) END AS dup_6gram_char_frac,
        |    CASE WHEN b.n < 7 OR b.tc <= 0 THEN 0.0 ELSE round(least(g.dup7 / CAST(b.tc AS DOUBLE), 1.0), 6) END AS dup_7gram_char_frac,
        |    CASE WHEN b.n < 8 OR b.tc <= 0 THEN 0.0 ELSE round(least(g.dup8 / CAST(b.tc AS DOUBLE), 1.0), 6) END AS dup_8gram_char_frac,
        |    CASE WHEN b.n < 9 OR b.tc <= 0 THEN 0.0 ELSE round(least(g.dup9 / CAST(b.tc AS DOUBLE), 1.0), 6) END AS dup_9gram_char_frac,
        |    CASE WHEN b.n < 10 OR b.tc <= 0 THEN 0.0 ELSE round(least(g.dup10 / CAST(b.tc AS DOUBLE), 1.0), 6) END AS dup_10gram_char_frac
        |  FROM base b
        |  LEFT JOIN sega l ON l.doc_id = b.doc_id AND l.kind = 'l'
        |  LEFT JOIN sega p ON p.doc_id = b.doc_id AND p.kind = 'p'
        |  LEFT JOIN gp g ON g.doc_id = b.doc_id
        |)
        |SELECT *,
        |  (n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
        |   AND symbol_word_ratio <= 0.1 AND bullet_line_frac <= 0.9
        |   AND ellipsis_line_frac <= 0.3 AND alpha_word_frac >= 0.8
        |   AND stop_hits >= __MIN_STOP__ AND dup_line_frac <= 0.30 AND dup_para_frac <= 0.30
        |   AND dup_line_char_frac <= 0.20 AND dup_para_char_frac <= 0.20
        |   AND top_2gram_char_frac <= 0.20 AND top_3gram_char_frac <= 0.18
        |   AND top_4gram_char_frac <= 0.16 AND dup_5gram_char_frac <= 0.15
        |   AND dup_6gram_char_frac <= 0.14 AND dup_7gram_char_frac <= 0.13
        |   AND dup_8gram_char_frac <= 0.12 AND dup_9gram_char_frac <= 0.11
        |   AND dup_10gram_char_frac <= 0.10) AS keep
        |FROM sigs""").stripMargin
    .replace("__MIN_STOP__", minStopHits.toString)
  /** s01: cube query compiled to portable SQL text (SqlCompiler) — the
    * identical string is executed by Spark (query side) and DuckDB
    * (oracle side).
    */
  private[graft] val s01Sql: String = SqlCompiler.compile(
    Tpch.ordersCube,
    CubeQuery()
      .addAxis("o_orderstatus").addAxis("o_orderdate_month")
      .addValue("n_orders").addValue("sum_total").addValue("n_cust")
      .addFilter("o_orderpriority", Seq("1-URGENT", "2-HIGH"), FilterOp.In),
    table = "orders", roundDp = Map("sum_total" -> 2))

  /** s02: the same cube query compiled per-dialect — regex filters have no
    * spelling shared by Spark and DuckDB (regexp_like vs regexp_matches),
    * so the SQL backend specializes, exactly like the reference's
    * per-dialect `to_sql` (bacon/cubedef.py). Hash-identical results from
    * the two renderings prove they carry the same semantics.
    */
  private[graft] def s02Sql(dialect: SqlCompiler.Dialect): String = SqlCompiler.compile(
    Tpch.ordersCube,
    CubeQuery()
      .addAxis("o_orderpriority")
      .addValue("n_orders").addValue("sum_total")
      .addFilter("o_orderpriority", "^[123]-", FilterOp.Match)
      .addFilter("o_orderstatus", "F", FilterOp.NMatch),
    table = "orders", roundDp = Map("sum_total" -> 2), dialect = dialect)

  /** s05: regex with a BACKSLASH class (`\d`) — the literal-escaping
    * trap: Spark's default parser consumes backslashes in string
    * literals ('\d' parses as 'd') while DuckDB keeps them, so the
    * SparkSql dialect must double them (Dialect.stringLit) or the
    * pattern silently matches the wrong rows on one engine.
    */
  private[graft] def s05Sql(dialect: SqlCompiler.Dialect): String = SqlCompiler.compile(
    Tpch.ordersCube,
    CubeQuery()
      .addAxis("o_orderpriority")
      .addValue("n_orders").addValue("sum_total")
      .addFilter("o_orderpriority", """^\d-(URGENT|HIGH)""", FilterOp.Match),
    table = "orders", roundDp = Map("sum_total" -> 2), dialect = dialect)

  /** s06: pivot query compiled to FILTER-ed aggregates — one
    * `agg FILTER (WHERE pivot IS NOT DISTINCT FROM v)` column per
    * (pivot value × measure), fixed pivotValues (no distinct-values
    * job). Two measures, so the compiler exercises the `value_measure`
    * column naming AND per-dialect identifier quoting (`1-URGENT_…` is
    * backtick-quoted for Spark, double-quoted for DuckDB).
    */
  private[graft] def s06Sql(dialect: SqlCompiler.Dialect): String = SqlCompiler.compile(
    Tpch.ordersCube,
    CubeQuery()
      .addAxis("o_orderstatus").addAxis("o_orderpriority").setPivot("o_orderpriority")
      .addValue("n_orders").addValue("sum_total"),
    table = "orders", roundDp = Map("sum_total" -> 2), dialect = dialect,
    pivotValues = Seq("1-URGENT", "2-HIGH", "5-LOW"))

  /** s07: set label as an AXIS — per-element row multiplication compiled
    * as a per-dialect unnest subquery (explode vs unnest) with make_set
    * semantics (NULL → ∅, '' discarded, duplicates collapsed); the
    * whole-set filter stays in the INNER where, pre-explosion, exactly
    * like the Slicer path.
    */
  private[graft] def s07Sql(dialect: SqlCompiler.Dialect): String = SqlCompiler.compile(
    Tpch.partCube,
    CubeQuery()
      .addAxis("p_brand").addAxis("name_words")
      .addValue("n_parts").addValue("sum_retail")
      .addFilter("name_words", Seq("red", "blue", "green"), FilterOp.HasAny),
    table = "part", roundDp = Map("sum_retail" -> 2), dialect = dialect)

  /** s03: membership set-ops (array_contains chains — shared predicate
    * spelling; only the `split` set-label constructor is per-dialect).
    */
  private[graft] def s03Sql(dialect: SqlCompiler.Dialect): String = SqlCompiler.compile(
    Tpch.partCube,
    CubeQuery()
      .addAxis("p_brand")
      .addValue("n_parts").addValue("sum_retail")
      .addFilter("name_words", Seq("red", "blue"), FilterOp.HasAny)
      .addFilter("name_words", Seq("small"), FilterOp.HasNone),
    table = "part", roundDp = Map("sum_retail" -> 2), dialect = dialect)

  /** s04: universally-quantified set-op (subsetof) — exercises the
    * per-dialect `listForall` lambda spelling.
    */
  private[graft] def s04Sql(dialect: SqlCompiler.Dialect): String = SqlCompiler.compile(
    Tpch.partCube,
    CubeQuery()
      .addAxis("p_brand")
      .addValue("n_parts")
      .addFilter("name_words",
        Seq("small", "hot", "widget", "gear", "plate", "red", "blue", "bolt"),
        FilterOp.SubsetOf),
    table = "part", dialect = dialect)

  val cube: Map[String, (Q, Option[String])] = Map(
    // §2.1-2, 9: Sum + Count accumulators over a 2-axis slice
    "q01_agg_basic" -> oq(
      """SELECT l_returnflag, l_linestatus,
        |round(sum(l_quantity),2) AS sum_qty,
        |round(sum(l_extendedprice),2) AS sum_price,
        |count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""") { (s, dir) =>
      val q = CubeQuery()
        .addAxis("l_returnflag").addAxis("l_linestatus")
        .addValue("sum_qty").addValue("sum_price").addValue("n_rows")
      Slicer.slice(li(s, dir), Tpch.lineitemCube, q)
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("sum_qty"), 2).as("sum_qty"),
          round(col("sum_price"), 2).as("sum_price"),
          col("n_rows"))
    },

    // §2.3: Min/Max accumulators
    "q02_minmax" -> oq(
      """SELECT o_orderpriority,
        |round(min(o_totalprice),2) AS min_total,
        |round(max(o_totalprice),2) AS max_total,
        |count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority""") { (s, dir) =>
      val q = CubeQuery().addAxis("o_orderpriority")
        .addValue("min_total").addValue("max_total").addValue("n_orders")
      Slicer.slice(ord(s, dir), Tpch.ordersCube, q)
        .select(col("o_orderpriority"),
          round(col("min_total"), 2).as("min_total"),
          round(col("max_total"), 2).as("max_total"),
          col("n_orders"))
    },

    // §2.4-5: reference Average (= sum/count(*)) + Welford sample StdDev
    "q03_avg_stddev" -> oq(
      """SELECT l_returnflag,
        |round(sum(l_quantity)/count(*),6) AS avg_qty,
        |round(stddev_samp(l_quantity),6) AS std_qty
        |FROM lineitem GROUP BY l_returnflag""") { (s, dir) =>
      val q = CubeQuery().addAxis("l_returnflag")
        .addValue("avg_qty").addValue("std_qty")
      Slicer.slice(li(s, dir), Tpch.lineitemCube, q)
        .select(col("l_returnflag"),
          round(col("avg_qty"), 6).as("avg_qty"),
          round(col("std_qty"), 6).as("std_qty"))
    },

    // §2.6: Group accumulator — consistent-else-null
    "q04_group_acc" -> oq(
      """SELECT o_custkey,
        |CASE WHEN count(DISTINCT o_orderstatus) = 1
        |      AND count(o_orderstatus) = count(*)
        |     THEN min(o_orderstatus) END AS grp_status,
        |count(*) AS n_orders
        |FROM orders GROUP BY o_custkey""") { (s, dir) =>
      val q = CubeQuery().addAxis("o_custkey").addValue("grp_status").addValue("n_orders")
      Slicer.slice(ord(s, dir), Tpch.ordersCube, q)
        .select(col("o_custkey"), col("grp_status"), col("n_orders"))
    },

    // §2.7: RatioSum accumulator
    "q05_ratio" -> oq(
      """SELECT l_returnflag,
        |round(sum(l_extendedprice*(1-l_discount))
        |      / nullif(sum(l_extendedprice),0), 6) AS margin_ratio
        |FROM lineitem GROUP BY l_returnflag""") { (s, dir) =>
      val q = CubeQuery().addAxis("l_returnflag").addValue("margin_ratio")
      Slicer.slice(li(s, dir), Tpch.lineitemCube, q)
        .select(col("l_returnflag"), round(col("margin_ratio"), 6).as("margin_ratio"))
    },

    // §2.8: Union accumulator over a set-valued measure. The set is emitted
    // in canonical space-joined string form on both sides: the driver's
    // pandas-side compare cannot sort/hash array cells.
    "q06_union_acc" -> oq(
      """SELECT p_brand,
        |array_to_string(list_sort(list(DISTINCT w)), ' ') AS type_word_set
        |FROM (SELECT p_brand, unnest(string_split(p_type, ' ')) AS w FROM part)
        |GROUP BY p_brand""") { (s, dir) =>
      val q = CubeQuery().addAxis("p_brand").addValue("type_word_set")
      Slicer.slice(part(s, dir), Tpch.partCube, q)
        .select(col("p_brand"), array_join(col("type_word_set"), " ").as("type_word_set"))
    },

    // §2.8b: Union.get's included_empty companion flag
    // (bacon/accumulators.py:54-76): per group, the union of red/blue
    // name-words AND whether any record contributed an empty set.
    "q06b_union_empty" -> oq(
      """SELECT p_brand,
        |array_to_string(list_sort(list_distinct(flatten(
        |  list(list_intersect(string_split(p_name,' '), ['red','blue']))))), ' ') AS rb_word_set,
        |CAST(max(CASE WHEN len(list_intersect(string_split(p_name,' '), ['red','blue'])) = 0
        |         THEN 1 ELSE 0 END) AS BIGINT) AS included_empty
        |FROM part GROUP BY p_brand""") { (s, dir) =>
      val q = CubeQuery().addAxis("p_brand")
        .addValue("rb_word_set").addValue("rb_included_empty")
      Slicer.slice(part(s, dir), Tpch.partCube, q)
        .select(col("p_brand"),
          array_join(col("rb_word_set"), " ").as("rb_word_set"),
          col("rb_included_empty").cast("long").as("included_empty"))
    },

    // §2.10: 0-dimensional slice (grand total)
    "q07_grand_total" -> oq(
      """SELECT round(sum(l_extendedprice),2) AS sum_price, count(*) AS n_rows
        |FROM lineitem""") { (s, dir) =>
      val q = CubeQuery().addValue("sum_price").addValue("n_rows")
      Slicer.slice(li(s, dir), Tpch.lineitemCube, q)
        .select(round(col("sum_price"), 2).as("sum_price"), col("n_rows"))
    },

    // §2.11: comparison filters gt/ne/le (Python null semantics)
    "q08_filter_cmp" -> oq(
      """SELECT l_linestatus, round(sum(l_quantity),2) AS sum_qty, count(*) AS n_rows
        |FROM lineitem
        |WHERE l_quantity > 25 AND l_returnflag <> 'A'
        |  AND l_shipdate <= DATE '1997-06-30'
        |GROUP BY l_linestatus""") { (s, dir) =>
      val q = CubeQuery().addAxis("l_linestatus")
        .addValue("sum_qty").addValue("n_rows")
        .addFilter("l_quantity_raw", 25, FilterOp.Gt)
        .addFilter("l_returnflag", "A", FilterOp.Ne)
        .addFilter("l_shipdate_day", java.sql.Date.valueOf("1997-06-30"), FilterOp.Le)
      val cube = Tpch.lineitemCube.withLabel(Label("l_quantity_raw", col("l_quantity")))
      Slicer.slice(li(s, dir), cube, q)
        .select(col("l_linestatus"), round(col("sum_qty"), 2).as("sum_qty"), col("n_rows"))
    },

    // §2.12: in / ni filters
    "q09_filter_in" -> oq(
      """SELECT o_orderpriority, count(*) AS n_orders, round(sum(o_totalprice),2) AS sum_total
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT','2-HIGH') AND o_custkey NOT IN (1,2,3)
        |GROUP BY o_orderpriority""") { (s, dir) =>
      val q = CubeQuery().addAxis("o_orderpriority")
        .addValue("n_orders").addValue("sum_total")
        .addFilter("o_orderpriority", Seq("1-URGENT", "2-HIGH"), FilterOp.In)
        .addFilter("o_custkey", Seq(1L, 2L, 3L), FilterOp.Ni)
      Slicer.slice(ord(s, dir), Tpch.ordersCube, q)
        .select(col("o_orderpriority"), col("n_orders"), round(col("sum_total"), 2).as("sum_total"))
    },

    // §2.13: regex match / nmatch (re.search semantics = unanchored rlike)
    "q10_filter_match" -> oq(
      """SELECT p_brand, count(*) AS n_parts
        |FROM part
        |WHERE regexp_matches(p_name, 'red|blue') AND NOT regexp_matches(p_name, 'widget')
        |GROUP BY p_brand""") { (s, dir) =>
      val q = CubeQuery().addAxis("p_brand").addValue("n_parts")
        .addFilter("p_name", "red|blue", FilterOp.Match)
        .addFilter("p_name", "widget", FilterOp.NMatch)
      Slicer.slice(part(s, dir), Tpch.partCube, q)
    },

    // §2.14a: set algebra — hasany / hasall / hasnone
    "q11_set_ops" -> oq(
      """SELECT p_type, count(*) AS n_parts
        |FROM part
        |WHERE list_has_any(string_split(p_name,' '), ['red','blue'])
        |  AND list_has_all(string_split(p_name,' '), ['bolt'])
        |GROUP BY p_type""") { (s, dir) =>
      val q = CubeQuery().addAxis("p_type").addValue("n_parts")
        .addFilter("name_words", Seq("red", "blue"), FilterOp.HasAny)
        .addFilter("name_words", Seq("bolt"), FilterOp.HasAll)
      Slicer.slice(part(s, dir), Tpch.partCube, q)
    },

    // §2.14b: set algebra — subsetof / disjointfrom
    "q12_set_ops2" -> oq(
      """SELECT p_brand, count(*) AS n_parts
        |FROM part
        |WHERE len(list_filter(string_split(p_name,' '),
        |        x -> NOT list_contains(['red','blue','small','large','bolt','nut','widget'], x))) = 0
        |  AND NOT list_has_any(string_split(p_name,' '), ['gear','gizmo'])
        |GROUP BY p_brand""") { (s, dir) =>
      val q = CubeQuery().addAxis("p_brand").addValue("n_parts")
        .addFilter("name_words", Seq("red", "blue", "small", "large", "bolt", "nut", "widget"), FilterOp.SubsetOf)
        .addFilter("name_words", Seq("gear", "gizmo"), FilterOp.DisjointFrom)
      Slicer.slice(part(s, dir), Tpch.partCube, q)
    },

    // §2.16: hidden values — accumulated but not emitted
    "q13_hidden" -> oq(
      """SELECT l_returnflag, round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag""") { (s, dir) =>
      val q = CubeQuery().addAxis("l_returnflag")
        .addValue("sum_qty").addValue("sum_tax")
        .hideValue("sum_tax")
      Slicer.slice(li(s, dir), Tpch.lineitemCube, q)
        .select(col("l_returnflag"), round(col("sum_qty"), 2).as("sum_qty"))
    },

    // §2.17: pivot axis — one measure, fixed pivot values (no discovery job)
    "q14_pivot" -> oq(
      """SELECT l_linestatus,
        |round(sum(CASE WHEN l_returnflag='A' THEN l_quantity END),2) AS "A",
        |round(sum(CASE WHEN l_returnflag='N' THEN l_quantity END),2) AS "N",
        |round(sum(CASE WHEN l_returnflag='R' THEN l_quantity END),2) AS "R"
        |FROM lineitem GROUP BY l_linestatus""") { (s, dir) =>
      val q = CubeQuery().addAxis("l_linestatus").addValue("sum_qty")
        .setPivot("l_returnflag")
      Slicer.slice(li(s, dir), Tpch.lineitemCube, q, pivotValues = Seq("A", "N", "R"))
        .select(col("l_linestatus"),
          round(col("A"), 2).as("A"), round(col("N"), 2).as("N"), round(col("R"), 2).as("R"))
    },

    // §2.18: order by measure desc + limit (top-k customers)
    "q15_order_limit" -> oq(
      """SELECT o_custkey, round(sum(o_totalprice),2) AS sum_total
        |FROM orders GROUP BY o_custkey
        |ORDER BY sum(o_totalprice) DESC, o_custkey LIMIT 10""") { (s, dir) =>
      val q = CubeQuery().addAxis("o_custkey").addValue("sum_total")
        .orderBy("-sum_total").setLimit(10)
      Slicer.slice(ord(s, dir), Tpch.ordersCube, q)
        .select(col("o_custkey"), round(col("sum_total"), 2).as("sum_total"))
    },

    // §2.19: slice reuse — coarsen a persisted finer slice (ManipulateSlice)
    "q16_reagg" -> oq(
      """SELECT CAST(date_trunc('year', o_orderdate) AS DATE) AS o_orderdate_year,
        |round(sum(o_totalprice),2) AS sum_total, count(*) AS n_orders
        |FROM orders GROUP BY 1""") { (s, dir) =>
      val fine = CubeQuery().addAxis("o_orderdate_year").addAxis("o_orderdate_month")
        .addValue("sum_total").addValue("n_orders")
      val finer = Slicer.slice(ord(s, dir), Tpch.ordersCube, fine)
      Slicer.Reagg.from(finer, Seq("o_orderdate_year"),
          Seq("sum_total" -> Agg.Sum, "n_orders" -> Agg.Count))
        .select(col("o_orderdate_year"), round(col("sum_total"), 2).as("sum_total"), col("n_orders"))
    },

    // §2.20a: rollup subtotals + grouping level
    "q17_rollup" -> oq(
      """SELECT l_returnflag, l_linestatus,
        |round(sum(l_quantity),2) AS sum_qty,
        |CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS grouping_level
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""") { (s, dir) =>
      val q = CubeQuery().addAxis("l_returnflag").addAxis("l_linestatus").addValue("sum_qty")
      Slicer.slice(li(s, dir), Tpch.lineitemCube, q,
          totals = Slicer.RollupTotals, withGroupingId = true)
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("sum_qty"), 2).as("sum_qty"),
          col("grouping_level").cast("long").as("grouping_level"))
    },

    // §2.20b: full cube subtotals
    "q18_cube" -> oq(
      """SELECT o_orderstatus, o_orderpriority,
        |round(sum(o_totalprice),2) AS sum_total,
        |CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS grouping_level
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""") { (s, dir) =>
      val q = CubeQuery().addAxis("o_orderstatus").addAxis("o_orderpriority").addValue("sum_total")
      Slicer.slice(ord(s, dir), Tpch.ordersCube, q,
          totals = Slicer.CubeTotals, withGroupingId = true)
        .select(col("o_orderstatus"), col("o_orderpriority"),
          round(col("sum_total"), 2).as("sum_total"),
          col("grouping_level").cast("long").as("grouping_level"))
    },

    // §2.21: drill-down — eq-filter on first axis, axis removed (DrillOnFirstAxis)
    "q19_drill" -> oq(
      """SELECT l_linestatus, round(sum(l_quantity),2) AS sum_qty, count(*) AS n_rows
        |FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_linestatus""") { (s, dir) =>
      val base = CubeQuery().addAxis("l_returnflag").addAxis("l_linestatus")
        .addValue("sum_qty").addValue("n_rows")
      val drilled = base.addFilter("l_returnflag", "R").removeAxis("l_returnflag")
      Slicer.slice(li(s, dir), Tpch.lineitemCube, drilled)
        .select(col("l_linestatus"), round(col("sum_qty"), 2).as("sum_qty"), col("n_rows"))
    },

    // §2.26: date hierarchy truncations year/quarter/month
    "q20_date_trunc" -> oq(
      """SELECT CAST(date_trunc('year', o_orderdate) AS DATE) AS o_orderdate_year,
        |CAST(date_trunc('quarter', o_orderdate) AS DATE) AS o_orderdate_quarter,
        |CAST(date_trunc('month', o_orderdate) AS DATE) AS o_orderdate_month,
        |count(*) AS n_orders, round(sum(o_totalprice),2) AS sum_total
        |FROM orders GROUP BY 1,2,3""") { (s, dir) =>
      val q = CubeQuery()
        .addAxis("o_orderdate_year").addAxis("o_orderdate_quarter").addAxis("o_orderdate_month")
        .addValue("n_orders").addValue("sum_total")
      Slicer.slice(ord(s, dir), Tpch.ordersCube, q)
        .select(col("o_orderdate_year"), col("o_orderdate_quarter"), col("o_orderdate_month"),
          col("n_orders"), round(col("sum_total"), 2).as("sum_total"))
    },

    // §2.27: hour truncation on the events stream table
    "q21_events_hour" -> oq(
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS ts_hour,
        |count(*) AS n_events, round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1""") { (s, dir) =>
      val q = CubeQuery().addAxis("ts_hour").addValue("n_events").addValue("sum_value")
      Slicer.slice(ev(s, dir), Tpch.eventsCube, q)
        .select(date_format(col("ts_hour"), "yyyy-MM-dd HH:00").as("ts_hour"),
          col("n_events"), round(col("sum_value"), 2).as("sum_value"))
    },

    // §2.28: date part labels (isodow/moy/quarternum/monthday/doy/isoweek/isoyear)
    "q22_date_parts" -> oq(
      """SELECT CAST(isodow(o_orderdate) AS BIGINT) AS o_orderdate_weekday,
        |CAST(month(o_orderdate) AS BIGINT) AS o_orderdate_moy,
        |CAST(quarter(o_orderdate) AS BIGINT) AS o_orderdate_quarternum,
        |CAST(dayofmonth(o_orderdate) AS BIGINT) AS o_orderdate_monthday,
        |CAST(dayofyear(o_orderdate) AS BIGINT) AS o_orderdate_doy,
        |CAST(weekofyear(o_orderdate) AS BIGINT) AS o_orderdate_isoweeknum,
        |CAST(isoyear(o_orderdate) AS BIGINT) AS o_orderdate_isoyear,
        |count(*) AS n_orders
        |FROM orders GROUP BY 1,2,3,4,5,6,7""") { (s, dir) =>
      val q = CubeQuery()
        .addAxis("o_orderdate_weekday").addAxis("o_orderdate_moy")
        .addAxis("o_orderdate_quarternum").addAxis("o_orderdate_monthday")
        .addAxis("o_orderdate_doy").addAxis("o_orderdate_isoweeknum")
        .addAxis("o_orderdate_isoyear")
        .addValue("n_orders")
      val sl = Slicer.slice(ord(s, dir), Tpch.ordersCube, q)
      sl.select(
        (Seq("o_orderdate_weekday", "o_orderdate_moy", "o_orderdate_quarternum",
          "o_orderdate_monthday", "o_orderdate_doy", "o_orderdate_isoweeknum",
          "o_orderdate_isoyear").map(c => col(c).cast("long").as(c)) :+ col("n_orders")): _*)
    },

    // §2.29: date-range filters (pushdown-friendly ge/le)
    "q23_date_range" -> oq(
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS o_orderdate_month,
        |count(*) AS n_orders, round(sum(o_totalprice),2) AS sum_total
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1997-03-01'
        |  AND CAST(o_orderdate AS DATE) <= DATE '1998-09-30'
        |GROUP BY 1""") { (s, dir) =>
      val q = CubeQuery().addAxis("o_orderdate_month")
        .addValue("n_orders").addValue("sum_total")
        .addFilter("o_orderdate_day", java.sql.Date.valueOf("1997-03-01"), FilterOp.Ge)
        .addFilter("o_orderdate_day", java.sql.Date.valueOf("1998-09-30"), FilterOp.Le)
      Slicer.slice(ord(s, dir), Tpch.ordersCube, q)
        .select(col("o_orderdate_month"), col("n_orders"), round(col("sum_total"), 2).as("sum_total"))
    },

    // §2.30: star-schema join with broadcast dims, revenue by region/nation
    "q24_star_join" -> oq(
      """SELECT r_name, n_name,
        |round(sum(l_extendedprice*(1-l_discount)),2) AS revenue, count(*) AS n_rows
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""") { (s, dir) =>
      val joined = graft.ops.Relational.starJoin(
        li(s, dir),
        Seq(
          Tpch.table(s, dir, "orders") -> (col("l_orderkey") === col("o_orderkey")),
          Tpch.table(s, dir, "customer") -> (col("o_custkey") === col("c_custkey")),
          Tpch.table(s, dir, "nation") -> (col("c_nationkey") === col("n_nationkey")),
          Tpch.table(s, dir, "region") -> (col("n_regionkey") === col("r_regionkey")),
        ))
      val starCube = CubeDef(
        labels = Seq(Label("r_name"), Label("n_name")),
        measures = Seq(
          Measure("revenue", col("l_extendedprice") * (lit(1) - col("l_discount")), Agg.Sum),
          Measure("n_rows", lit(1), Agg.Count)))
      val q = CubeQuery().addAxis("r_name").addAxis("n_name")
        .addValue("revenue").addValue("n_rows")
      Slicer.slice(joined, starCube, q)
        .select(col("r_name"), col("n_name"), round(col("revenue"), 2).as("revenue"), col("n_rows"))
    },

    // §2.31: top-k per group (window)
    "q25_topk_group" -> oq(
      """SELECT p_brand, p_partkey, round(p_retailprice,2) AS p_retailprice
        |FROM part
        |QUALIFY row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) <= 3""") { (s, dir) =>
      graft.ops.Relational.topKPerGroup(
          part(s, dir), Seq(col("p_brand")),
          Seq(col("p_retailprice").desc, col("p_partkey").asc), 3)
        .select(col("p_brand"), col("p_partkey"), round(col("p_retailprice"), 2).as("p_retailprice"))
    },

    // §2.32: distinct-count measure
    "q26_distinct" -> oq(
      """SELECT o_orderpriority, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust
        |FROM orders GROUP BY o_orderpriority""") { (s, dir) =>
      val q = CubeQuery().addAxis("o_orderpriority").addValue("n_cust")
      Slicer.slice(ord(s, dir), Tpch.ordersCube, q)
    },

    // §2.33: HAVING — filter on the aggregated measure
    "q27_having" -> oq(
      """SELECT o_custkey, round(sum(o_totalprice),2) AS sum_total
        |FROM orders GROUP BY o_custkey
        |HAVING sum(o_totalprice) > 1000000""") { (s, dir) =>
      val q = CubeQuery().addAxis("o_custkey").addValue("sum_total")
      val sl = Slicer.slice(ord(s, dir), Tpch.ordersCube, q)
      graft.ops.Relational.having(sl, col("sum_total") > 1000000)
        .select(col("o_custkey"), round(col("sum_total"), 2).as("sum_total"))
    },

    // §2.35: sessionization (session_window; batch-equivalent oracle)
    "q28_session" -> oq(
      """WITH gaps AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sess AS (
        |  SELECT user_id, ts, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts) AS sid
        |  FROM gaps
        |)
        |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(*) AS n_events, round(sum(value),2) AS sum_value
        |FROM sess GROUP BY user_id, sid""") { (s, dir) =>
      ev(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_events"), round(col("sum_value"), 2).as("sum_value"))
    },

    // §2.33 composed with §2.19f: HAVING over a SERVED slice — the
    // board's sliceHaving applies a post-aggregation measure predicate
    // ON the reuse strategies' output: the fine (band, returnflag) Avg
    // slice caches once, then the coarse per-band HAVING query is
    // answered FROM it through the quotient companions (Σx / __m_n
    // re-summed, never avg-of-avgs) with the predicate on the rebuilt
    // finished value — no second base scan. Threshold 30.0 sits mid-gap
    // between adjacent bands' means (≈ band+4.5, ~10 apart), so FP
    // summation-order noise can never flip a group across it at any sf.
    // The oracle replays group + HAVING directly; Avg is the cube's
    // total-rows form (sum/count(*)), written explicitly in the SQL.
    "q56_having_served" -> oq(
      """SELECT CAST(floor(l_quantity / 10) * 10 AS BIGINT) AS l_quantity_band,
        |round(sum(l_quantity) / count(*), 6) AS avg_qty, count(*) AS n_rows
        |FROM lineitem GROUP BY 1
        |HAVING sum(l_quantity) / count(*) > 30.0""") { (s, dir) =>
      val board = new CuttingBoard(li(s, dir), Tpch.lineitemCube)
      val fine = CubeQuery().addAxis("l_quantity_band").addAxis("l_returnflag")
        .addValue("avg_qty").addValue("n_rows")
      board.slice(fine)
      val coarse = CubeQuery().addAxis("l_quantity_band")
        .addValue("avg_qty").addValue("n_rows")
      board.sliceHaving(coarse, Seq(Filter("avg_qty", FilterOp.Gt, 30.0)))
        .select(col("l_quantity_band"),
          round(col("avg_qty"), 6).as("avg_qty"), col("n_rows"))
    },
  )

  // Two documents readers: [[docs]] is the BARE scan, [[docsWide]]
  // inserts a fill-the-cores exchange above it (Tpch.fillCores — a
  // no-op whenever the scan already yields >= cores partitions, i.e.
  // at any real corpus scale).
  //
  // The round-16 blanket fill of every docs consumer was re-measured
  // per gate with interleaved on/off benches (ambient noise on this
  // box swings whole runs 2-4x, so each side ran twice and the minima
  // were compared): the exchange only pays for itself where the
  // per-row work above the scan is HEAVY — decode (m01-m04, v01/v02,
  // a01/a02), regex batteries (t12, t03, d23, d32), window-hash /
  // shingle spans (d18, d19, d47, d48), entropy/ladder scoring (d29,
  // d36, d43, d44, d46), the Gopher battery (d52s) — winning 0.2-2.5 s
  // per gate at sf0.1. On the ~40 LIGHT tokenize-then-aggregate gates
  // the same exchange LOST 0.2-2.7 s each (sum ~ -12 s per sweep:
  // d45 -2.7, d42 -2.5, d21 -1.5, d17 -1.4, d25 -1.1 ...): their map
  // half is cheaper than one extra stage + 32-task fixed costs
  // (codegen/regex init per task). So the fill is now PER-GATE: the
  // measured winners call docsWide, everything else scans bare.
  //
  // The embeddings reader is deliberately NOT filled: the same wrap
  // amplified the e-tier's task CPU far past the per-task-init model
  // (e03 warm task time 1.9 → 188 s for identical results — every one
  // of the build's ~40 jobs re-executes the scan+exchange and the
  // 32-way stages pay a fixed cost per reference that the 1-partition
  // scan never did), so the exchange cost the sweep more than the map
  // parallelism returned. Parallelizing the sim-tier builds needs a
  // narrower lever (see OPTIMIZATION_r16.md "Not yet optimized").
  //
  // The q-series fact tables (lineitem/orders/events) are NOT wrapped:
  // their gates are sub-second scan+agg shapes where an extra exchange
  // costs more than the parallelism buys.
  private def docs(s: SparkSession, dir: String) =
    Tpch.table(s, dir, "documents")
  private def docsWide(s: SparkSession, dir: String) =
    Tpch.fillCores(docs(s, dir))
  private def emb(s: SparkSession, dir: String) =
    Tpch.table(s, dir, "embeddings")

  /** t01's split weights — shared by the Spark column and the SQL oracle. */
  private val corpusSplits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** t04's per-source keep-rates (sources not listed keep everything);
    * src0 drops out entirely — the rate-0 edge.
    */
  private val mixtureRates = Seq("src0" -> 0.0, "src1" -> 0.5, "src2" -> 0.25)

  /** The t05 composed-pipeline oracle SQL, factored so the sampled
    * bench form t05s can shadow `documents` with a filtered CTE
    * (`baseCte`, e.g. "documents AS (SELECT … WHERE doc_id % 5 = 4),") —
    * DuckDB resolves the inner `FROM documents` references to the CTE,
    * so the whole chained pipeline replays on the identical sample.
    */
  private def t05Sql(baseCte: String): String =
    s"""WITH ${baseCte}dedup AS (
       |  SELECT doc_id, source, text FROM documents
       |  QUALIFY row_number() OVER (
       |    PARTITION BY md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
       |    ORDER BY doc_id) = 1
       |), gk AS (
       |  SELECT doc_id FROM (
       |${gopherSigSql(1)}
       |  ) WHERE keep
       |), scored AS (
       |  SELECT doc_id, source, text,
       |    round((
       |      least(CAST(len(list_filter(string_split_regex(trim(text),'\\s+'), t -> len(t)>0)) AS DOUBLE)/100.0, 1.0)
       |      + (1.0 - least(CAST(len(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
       |                     / greatest(CAST(len(text) AS DOUBLE), 1.0) * 10.0, 1.0))
       |      + least(CAST(len(list_filter(string_split_regex(lower(trim(text)),'\\s+'),
       |          t -> list_contains(['the','a','of','and','to','in','is','it','that','for'], t))) AS DOUBLE)
       |          / greatest(CAST(len(list_filter(string_split_regex(trim(text),'\\s+'), t -> len(t)>0)) AS DOUBLE), 1.0) * 5.0, 1.0)
       |    ) / 3.0, 6) AS quality
       |  FROM dedup
       |), kept AS (
       |  SELECT doc_id, source, text FROM scored
       |  WHERE quality >= 0.5
       |    AND doc_id IN (SELECT doc_id FROM gk)
       |    AND ${graft.text.CorpusOps.mixtureSql("doc_id", "source", mixtureRates)}
       |), tok AS (
       |  SELECT doc_id, source,
       |    CAST(len(list_filter(string_split_regex(trim(text),'\\s+'), t -> len(t)>0)) AS BIGINT) AS tokens
       |  FROM kept
       |), cum AS (
       |  SELECT doc_id, source, tokens,
       |    sum(tokens) OVER (PARTITION BY source ORDER BY doc_id) AS c
       |  FROM tok
       |)
       |SELECT ${graft.text.CorpusOps.splitSql("doc_id", corpusSplits)} AS split,
       |  source, CAST(floor((c - tokens) / 256) AS BIGINT) AS shard,
       |  count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS sum_tokens
       |FROM cum GROUP BY 1, 2, 3"""

  /** The t05 composed pipeline over an arbitrary base-table loader —
    * shared by t05 (full corpus) and t05s (materialized 20% sample).
    */
  private def t05Query(base: Q): Q = (s, dir) => {
    import graft.text.{CorpusOps, TextFunctions}
    val deduped = graft.dedup.Dedup.keepCanonical(base(s, dir), "doc_id", "text")
    val kept = CorpusOps.gopherFilter(
        deduped.where(TextFunctions.qualityScore(col("text")) >= 0.5),
        "doc_id", "text", minStopHits = 1)
      .where(CorpusOps.mixtureFilter(col("doc_id"), col("source"), mixtureRates))
    CorpusOps.shardByTokenBudget(kept, "doc_id", "text", "source", 256)
      .withColumn("split", CorpusOps.splitColumn(col("doc_id"), corpusSplits))
      .groupBy("split", "source", "shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("sum_tokens"))
  }

  /** Exact n-gram-Jaccard pair SQL (word 3-shingles, θ=0.5) — the shared
    * oracle for d02 (exact mode), d02s (the stop-shingle cut is provably
    * inert at gate scale, see that entry) and d03 (LSH recall is 1.0 at
    * gate scale, DedupSpec-asserted).
    */
  private val exactJaccardSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0) AS tk
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(generate_series(1, greatest(len(tk)-2, 1)),
      |      i -> array_to_string(list_slice(tk, i, i+2), ' '))) AS sset
      |  FROM toks
      |), ex AS (
      |  SELECT doc_id, len(sset) AS sz, unnest(sset) AS s FROM sh
      |)
      |SELECT a.doc_id AS id1, b.doc_id AS id2,
      |  round(CAST(count(*) AS DOUBLE)/(a.sz + b.sz - count(*)), 6) AS jaccard
      |FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      |GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
      |HAVING CAST(count(*) AS DOUBLE)/(a.sz + b.sz - count(*)) >= 0.5"""

  /** LLM-pipeline operators (SURVEY.md §2.36-47). */
  val pipeline: Map[String, (Q, Option[String])] = Map(
    // §2.36: exact dedup via content fingerprint
    "d01_exact_dedup" -> oq(
      """SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
        |min(doc_id) AS canonical_id, count(*) AS n_dups
        |FROM documents GROUP BY 1""") { (s, dir) =>
      graft.dedup.Dedup.exact(docs(s, dir), "doc_id", "text")
    },

    // §2.37: n-gram Jaccard near-dup pairs (word 3-shingles, θ=0.5) —
    // declared exact baseline (cut off), the analogue of d06 for ANN
    "d02_ngram_jaccard" -> oq(exactJaccardSql) { (s, dir) =>
      graft.dedup.Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text", k = 3, threshold = 0.5)
    },

    // §2.37 (scale default, the bench headline): the SAME operator with
    // the stop-shingle cut ON — the production path for web-scale corpora,
    // where one hot shingle means quadratic join fanout. The exact-pair
    // SQL stays a valid oracle because at the gate corpus the cut provably
    // removes nothing: max shingle document-frequency at sf0.01 is 7 while
    // the cut threshold is 0.1×nDocs ≈ 50 — a 7× margin that holds for any
    // approxRowCount estimate — so the cut branch (DF count + anti-join +
    // per-doc size recompute) executes end-to-end and the pair set equals
    // the exact answer. The cut's selective behaviour (drops hot shingles,
    // keeps true near-dups) is spec-pinned in DedupSpec on a corpus where
    // it does fire.
    // Reads the per-JVM PAIR store (dedupShinglePairs — the shared
    // join+count pass at the gate parameters, built once per JVM): the
    // scale form of the operator is "pair store + per-row Jaccard
    // projection", with shingling, the df aggregation AND the pair core
    // all paid once per generation. d02 above keeps pricing the
    // end-to-end shingle-from-text inverted-index path.
    "d02s_ngram_jaccard_scale" -> oq(exactJaccardSql) { (s, dir) =>
      graft.dedup.Dedup.ngramJaccardPairsFromArtifacts(
        dedupShinglePairs(s, dir), threshold = 0.5)
    },

    // §2.38: MinHash+LSH near-dup. Oracle-checked: the output is the set
    // of exact-Jaccard-verified pairs ≥ θ among LSH candidates, which at
    // test scale equals the full exact answer (DedupSpec asserts LSH
    // recall = 1.0 on the corpus), so d02's exact-pair SQL is a valid
    // oracle even though DuckDB cannot reproduce the xxhash64 banding.
    // Store-fed (dedupArtifacts): banding + verification read the
    // materialized (id, sz, shs, sig) table; the signature corpus pass
    // is priced once per JVM per sf dir, the production "sign once per
    // generation, mine pairs many times" layout. DedupSpec pins the
    // store-fed pair set == the direct minhashLshPairs call.
    "d03_minhash_lsh" -> oq(exactJaccardSql) { (s, dir) =>
      minhashPairsFromStore(s, dir)
    },

    // §2.39: SimHash near-dup (rows-only)
    "d04_simhash" -> nq { (s, dir) =>
      val d = docs(s, dir)
      // banding width sized from the corpus: past ~2M docs the narrow
      // 16-bit bands' random collisions dominate (see wideHammingBands)
      graft.dedup.Dedup.simhashPairs(d, "doc_id", "text", maxHamming = 3,
        wide = graft.dedup.Dedup.wideHammingBands(graft.dedup.Dedup.approxRowCount(d)),
        verdictKey = s"$dir#docs")
    },

    // §2.54: train/eval DECONTAMINATION — drop training docs sharing ≥4
    // distinct 3-shingles with any eval doc (here eval = doc_id % 50 == 0,
    // a stand-in benchmark set). Oracle replicates the shingle semi-join
    // on shingle STRINGS (hashing only changes key identity, as in d02).
    "d17_decontaminate" -> oq(
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0) AS tk
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, greatest(len(tk)-2, 1)),
        |      i -> array_to_string(list_slice(tk, i, i+2), ' '))) AS sset
        |  FROM toks
        |), ex AS (
        |  SELECT doc_id, unnest(sset) AS s FROM sh
        |), ev AS (
        |  SELECT DISTINCT s FROM ex WHERE doc_id % 50 = 0
        |), hits AS (
        |  SELECT e.doc_id, count(DISTINCT e.s) AS c FROM ex e JOIN ev USING (s)
        |  WHERE e.doc_id % 50 <> 0 GROUP BY e.doc_id
        |)
        |SELECT doc_id, source FROM documents
        |WHERE doc_id % 50 <> 0
        |  AND doc_id NOT IN (SELECT doc_id FROM hits WHERE c >= 4)""") { (s, dir) =>
      val d = docs(s, dir)
      graft.dedup.Dedup.decontaminate(
        d.where(col("doc_id") % 50 =!= 0), d.where(col("doc_id") % 50 === 0),
        "doc_id", "text", k = 3, minShingles = 4)
        .select(col("doc_id"), col("source"))
    },

    // §2.54b: the SAME decontamination through the bloom-pruned shape for
    // non-broadcastable eval sets (Sketch.bloomAgg blob + mightContain
    // map-side pre-filter ahead of the exact shingle join). The oracle is
    // d17's — the bloom is a pure pre-filter, so the result set is
    // bit-identical or the operator is wrong.
    "d21_decontaminate_bloom" -> oq(
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0) AS tk
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, greatest(len(tk)-2, 1)),
        |      i -> array_to_string(list_slice(tk, i, i+2), ' '))) AS sset
        |  FROM toks
        |), ex AS (
        |  SELECT doc_id, unnest(sset) AS s FROM sh
        |), ev AS (
        |  SELECT DISTINCT s FROM ex WHERE doc_id % 50 = 0
        |), hits AS (
        |  SELECT e.doc_id, count(DISTINCT e.s) AS c FROM ex e JOIN ev USING (s)
        |  WHERE e.doc_id % 50 <> 0 GROUP BY e.doc_id
        |)
        |SELECT doc_id, source FROM documents
        |WHERE doc_id % 50 <> 0
        |  AND doc_id NOT IN (SELECT doc_id FROM hits WHERE c >= 4)""") { (s, dir) =>
      val d = docs(s, dir)
      graft.dedup.Dedup.decontaminateAtScale(
        d.where(col("doc_id") % 50 =!= 0), d.where(col("doc_id") % 50 === 0),
        "doc_id", "text", k = 3, minShingles = 4)
        .select(col("doc_id"), col("source"))
    },

    // §2.54d: contamination MATRIX — the audit table behind d17: per
    // (eval set, training source), how many training docs share ≥4
    // distinct 3-shingles with THAT set and what fraction of the source
    // that is. Two stand-in benchmark sets (doc_id % 50 = 0 → benchA,
    // = 1 → benchB); train = everything else. Hits count per set, the
    // same per-set decision decontaminate would make against each set
    // alone. Oracle replays the shingle semi-join + matrix arithmetic.
    "d45_contamination_matrix" -> oq(
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0) AS tk
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, greatest(len(tk)-2, 1)),
        |      i -> array_to_string(list_slice(tk, i, i+2), ' '))) AS sset
        |  FROM toks
        |), ex AS (
        |  SELECT doc_id, unnest(sset) AS s FROM sh
        |), ev AS (
        |  SELECT DISTINCT CASE WHEN doc_id % 50 = 0 THEN 'benchA' ELSE 'benchB' END AS eval_set, s
        |  FROM ex WHERE doc_id % 50 <= 1
        |), hits AS (
        |  SELECT ev.eval_set, e.doc_id
        |  FROM ex e JOIN ev ON e.s = ev.s
        |  WHERE e.doc_id % 50 >= 2
        |  GROUP BY ev.eval_set, e.doc_id
        |  HAVING count(DISTINCT e.s) >= 4
        |), tot AS (
        |  SELECT source, count(*) AS n_docs FROM documents
        |  WHERE doc_id % 50 >= 2 GROUP BY source
        |), m AS (
        |  SELECT h.eval_set, d.source, count(*) AS n_contaminated
        |  FROM hits h JOIN documents d ON h.doc_id = d.doc_id
        |  GROUP BY h.eval_set, d.source
        |)
        |SELECT m.eval_set, m.source, m.n_contaminated, t.n_docs,
        |round(CAST(m.n_contaminated AS DOUBLE) / t.n_docs, 6) AS frac
        |FROM m JOIN tot t ON m.source = t.source""") { (s, dir) =>
      val d = docs(s, dir)
      val eval = d.where(col("doc_id") % 50 <= 1)
        .withColumn("eval_set",
          when(col("doc_id") % 50 === 0, lit("benchA")).otherwise(lit("benchB")))
      val train = d.where(col("doc_id") % 50 >= 2)
      graft.dedup.Dedup.contaminationMatrix(train, eval, "doc_id", "text",
        "eval_set", "source", k = 3, minShingles = 4)
    },

    // §2.40: embedding cosine near-dup pairs. numTables=0 = exact
    // all-pairs mode so the oracle validates values, and θ=0.45 sits
    // inside the synthetic embeddings' cosine range (max ≈ 0.51 at
    // sf0.01) so the check is NON-vacuous — the r2 θ=0.9 returned 0 rows
    // on both sides and validated nothing. d16 is the LSH scale path.
    "d05_embed_dup" -> oq(
      """SELECT a.vec_id AS id1, b.vec_id AS id2,
        |round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])), 6) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.45""") { (s, dir) =>
      graft.sim.Similarity.cosineDupPairs(emb(s, dir), "vec_id", "embedding",
        threshold = 0.45, numTables = 0)
    },

    // §2.40 scale path: the same near-dup operator through hyperplane-LSH
    // buckets + exact rerank (rows-only: candidate recall at θ=0.45 is
    // probabilistic by design; SimilaritySpec measures it and asserts the
    // result is a subset of the exact answer with cos ≥ θ).
    "d16_embed_dup_lsh" -> nq { (s, dir) =>
      // planes sized from the corpus so LSH buckets stay ~64 rows — a
      // fixed plane count makes the candidate join quadratic at scale
      val e = emb(s, dir)
      graft.sim.Similarity.cosineDupPairs(e, "vec_id", "embedding",
        threshold = 0.45,
        numPlanes = graft.sim.Similarity.suggestedPlanes(
          graft.dedup.Dedup.approxRowCount(e)),
        numTables = 16,
        verdictKey = s"$dir#emb")
    },

    // §2.41: brute-force cosine top-k ANN baseline
    "d06_cosine_topk" -> oq(
      """SELECT a.vec_id AS id1, b.vec_id AS id2,
        |round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])), 6) AS cos,
        |CAST(row_number() OVER (PARTITION BY a.vec_id
        |  ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |           CAST(b.embedding AS DOUBLE[])) DESC, b.vec_id) AS BIGINT) AS rk
        |FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |QUALIFY rk <= 5""") { (s, dir) =>
      graft.sim.Similarity.cosineTopK(emb(s, dir), "vec_id", "embedding", k = 5)
    },

    // §2.42: LSH-bucketed ANN — the 100 TB path (rows-only). 10 planes ×
    // 8 tables: recall@5 ≥ 0.95 vs the exact baseline, asserted at these
    // exact parameters in SimilaritySpec's recall harness
    "d07_ann_lsh" -> nq { (s, dir) =>
      // planes sized from the corpus (~64-row buckets) — fixed planes
      // let per-query candidate counts grow linearly with the corpus
      val e = emb(s, dir)
      graft.sim.Similarity.annLshTopK(e, "vec_id", "embedding",
        k = 5,
        numPlanes = graft.sim.Similarity.suggestedPlanes(
          graft.dedup.Dedup.approxRowCount(e)),
        numTables = 8,
        verdictKey = s"$dir#emb")
    },

    // §2.42b: IVF ANN — k-means coarse quantizer + posting-list probe
    // (rows-only: Lloyd refit is FP-order-sensitive in distributed avg;
    // SimilaritySpec asserts exact-equality at full probe width and
    // recall@5 ≥ 0.95 at these parameters). trainCap bounds Lloyd to a
    // seeded sample so training never scans the full corpus per iteration
    "e02_ann_ivf" -> nq { (s, dir) =>
      // ~√n cells: fixed-nProbe search stays O(√n) per query as the
      // corpus grows (16 fixed cells measured 45× slower at 10× data)
      val e = emb(s, dir)
      val cents = graft.sim.Similarity.suggestedCentroids(
        graft.dedup.Dedup.approxRowCount(e))
      graft.sim.Similarity.annIvfTopK(e, "vec_id", "embedding",
        k = 5, numCentroids = cents, nProbe = 4, iters = 2,
        trainCap = math.max(2000, 40 * cents))
    },

    // §2.43: language-ID heuristic
    // §2.44c: Gopher-style repetition signals — duplicate-line fraction,
    // duplicate-paragraph fraction, top-2-gram token share. The corpus
    // has no line structure, so the gate wraps each doc's tokens into
    // 2-token lines / 3-token paragraphs IDENTICALLY on both sides (the
    // t03 construction trick); the operators themselves split on real
    // newlines / blank lines.
    "d18_repetition" -> oq(
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents
        |), w AS (
        |  SELECT doc_id, len(tk) AS n,
        |    list_transform(range(0, greatest(CAST(ceil(len(tk)/2.0) AS INT), 1)),
        |      i -> array_to_string(list_slice(tk, i*2+1, i*2+2), ' ')) AS l2,
        |    list_transform(range(0, greatest(CAST(ceil(len(tk)/3.0) AS INT), 1)),
        |      i -> array_to_string(list_slice(tk, i*3+1, i*3+3), ' ')) AS l3,
        |    list_transform(range(1, greatest(len(tk), 1)),
        |      i -> concat(tk[i], ' ', tk[i+1])) AS g2
        |  FROM t
        |)
        |SELECT doc_id,
        |  round((len(l2) - len(list_distinct(l2))) / CAST(len(l2) AS DOUBLE), 6) AS dup_line_frac,
        |  round((len(l3) - len(list_distinct(l3))) / CAST(len(l3) AS DOUBLE), 6) AS dup_para_frac,
        |  CASE WHEN n < 2 THEN 0.0
        |       ELSE round(least(2.0 * list_max(list_transform(list_distinct(g2),
        |         x -> CAST(len(list_filter(g2, y -> y = x)) AS DOUBLE))) / n, 1.0), 6)
        |  END AS top_2gram_share
        |FROM w""") { (s, dir) =>
      import graft.text.TextFunctions._
      val toks = wsTokens(lower(col("text")))
      // wrap every k tokens: one codegen'd regexp_replace over the
      // space-joined tokens (each match consumes k tokens + the trailing
      // space) — byte-identical to the oracle's list_slice construction
      // and ~4x cheaper than a transform+slice HOF, which evaluates
      // interpreted
      def wrap(k: Int, sep: String) = {
        val grp = Seq.fill(k)("\\S+").mkString("(", " ", ") ")
        regexp_replace(concat_ws(" ", toks), grp, "$1" + sep)
      }
      // the wrapped strings are staged in their own projection: the
      // signal expressions reference them more than once, and HOF trees
      // evaluate interpreted with no subexpression elimination — without
      // the stage the whole tokenize+wrap pipeline re-runs per reference
      // (measured 3x on this query)
      docsWide(s, dir)
        .select(col("doc_id"), col("text"),
          wrap(2, "\n").as("__w2"), wrap(3, "\n\n").as("__w3"))
        .select(col("doc_id"),
          dupLineFraction(col("__w2")).as("dup_line_frac"),
          dupParagraphFraction(col("__w3")).as("dup_para_frac"),
          top2GramShare(col("text")).as("top_2gram_share"))
    },

    // §2.67: edit-distance (typo) pairs over the corpus vocabulary —
    // SymSpell deletion-neighborhood candidates + exact levenshtein
    // verify, never an all-pairs join. The oracle IS the all-pairs
    // levenshtein (fine over a 31-word vocab).
    "d24_typo_pairs" -> oq(
      """WITH v AS (
        |  SELECT DISTINCT unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0)) AS w
        |  FROM documents
        |)
        |SELECT a.w AS w1, b.w AS w2,
        |  CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
        |FROM v a JOIN v b ON a.w < b.w
        |WHERE levenshtein(a.w, b.w) <= 2""") { (s, dir) =>
      import graft.text.TextFunctions.wsTokens
      val vocab = docs(s, dir)
        .select(explode(wsTokens(lower(trim(col("text"))))).as("w"))
      graft.dedup.Dedup.editDistancePairs(vocab, "w", maxDist = 2)
    },

    // §2.44e: unigram token entropy — H = ln n − (Σ c·ln c)/n in one
    // sort + fold; the oracle recomputes the identical identity over
    // DuckDB's distinct-token counts (commutative sum, 6dp-safe).
    "d29_token_entropy" -> oq(
      """WITH t AS (
        |  SELECT doc_id, list_filter(
        |    string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents
        |)
        |SELECT doc_id, CASE WHEN len(tk) <= 0 THEN 0.0
        |  ELSE round(ln(len(tk)) - list_aggregate(
        |    list_transform(list_distinct(tk),
        |      x -> len(list_filter(tk, y -> y = x)) *
        |           ln(len(list_filter(tk, y -> y = x)))), 'sum') / len(tk), 6)
        |END AS entropy
        |FROM t""") { (s, dir) =>
      docsWide(s, dir).select(col("doc_id"),
        graft.text.TextFunctions.tokenEntropy(col("text")).as("entropy"))
    },

    // §2.44d: line-level quality signals (RefinedWeb/FineWeb line
    // filters). The synthetic corpus has no newlines or punctuation, so
    // the gate builds deterministically decorated lines from the tokens
    // on BOTH sides (the t03 convention: every 3rd line gains a
    // terminal '.', every 5th a '- ' bullet), then lineStats parses the
    // real newline-joined text.
    "d23_line_signals" -> oq(
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents
        |), w AS (
        |  SELECT doc_id, list_transform(range(1, len(tk) + 1),
        |    i -> concat(CASE WHEN i % 5 = 0 THEN '- ' ELSE '' END, tk[i],
        |                CASE WHEN i % 3 = 0 THEN '.' ELSE '' END)) AS ls
        |  FROM t WHERE len(tk) > 0
        |), c AS (
        |  SELECT doc_id, ls,
        |    list_transform(ls, l -> len(list_filter(
        |      string_split_regex(trim(l), '\s+'), x -> len(x) > 0))) AS wc
        |  FROM w
        |)
        |SELECT doc_id, len(ls) AS n_lines,
        |  round(len(list_filter(ls, l -> regexp_matches(l, '[.!?"'']$')))
        |    / CAST(len(ls) AS DOUBLE), 6) AS punct_line_frac,
        |  round(len(list_filter(ls, l -> regexp_matches(l, '^([-*•]|[0-9]+[.)])\s')))
        |    / CAST(len(ls) AS DOUBLE), 6) AS bullet_line_frac,
        |  round(len(list_filter(wc, x -> x < 4)) / CAST(len(ls) AS DOUBLE), 6)
        |    AS short_line_frac,
        |  round(list_aggregate(wc, 'sum') / CAST(len(ls) AS DOUBLE), 6)
        |    AS mean_words_per_line
        |FROM c""") { (s, dir) =>
      import graft.text.TextFunctions._
      val toks = wsTokens(lower(trim(col("text"))))
      val lines = transform(toks, (x, i) => concat(
        when((i + 1) % 5 === 0, lit("- ")).otherwise(lit("")), x,
        when((i + 1) % 3 === 0, lit(".")).otherwise(lit(""))))
      docsWide(s, dir)
        .where(size(filter(wsTokens(lower(trim(col("text")))), t => length(t) > 0)) > 0)
        .select(col("doc_id"), lineStats(array_join(lines, "\n")).as("__s"))
        .select(col("doc_id"), col("__s.n_lines").as("n_lines"),
          col("__s.punct_line_frac").as("punct_line_frac"),
          col("__s.bullet_line_frac").as("bullet_line_frac"),
          col("__s.short_line_frac").as("short_line_frac"),
          col("__s.mean_words_per_line").as("mean_words_per_line"))
    },

    // §2.36c: substring-level dedup diagnostics — the token-window pass
    // of published training-data pipelines (any 20-token span occurring
    // more than once corpus-wide is a duplicated span). Spark meets on
    // xxhash64 window keys; the oracle replays the same windows as
    // strings.
    "d19_substring_dedup" -> oq(
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, unnest(range(1, greatest(len(tk) - 19, 0) + 1)) AS pos, tk
        |  FROM t
        |), g2 AS (
        |  SELECT doc_id, array_to_string(list_slice(tk, pos, pos + 19), ' ') AS gram FROM g
        |), d AS (
        |  SELECT gram FROM g2 GROUP BY gram HAVING count(*) > 1
        |), s AS (
        |  SELECT doc_id, count(*) AS n_shingles,
        |    sum(CASE WHEN gram IN (SELECT gram FROM d) THEN 1 ELSE 0 END) AS n_dup
        |  FROM g2 GROUP BY doc_id
        |)
        |SELECT dd.doc_id,
        |  CAST(coalesce(s.n_shingles, 0) AS BIGINT) AS n_shingles,
        |  CAST(coalesce(s.n_dup, 0) AS BIGINT) AS n_dup_shingles
        |FROM documents dd LEFT JOIN s USING (doc_id)""") { (s, dir) =>
      graft.dedup.Dedup.dupSpanStats(docsWide(s, dir), "doc_id", "text", k = 20)
        .withColumnRenamed("id", "doc_id")
    },

    // §2.54c: GPT-3-style contamination EXCISION — any 13-token window
    // of a train doc that also occurs in the eval set (doc_id % 50 = 0,
    // the d17 split) is removed plus a 2-token margin, instead of
    // dropping the whole doc. The oracle replays the same lowercased
    // windows as strings and rebuilds the text with an indexed
    // list_filter; untouched docs must round-trip byte-identical.
    "d33_excise_contamination" -> oq(
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0) AS ltk,
        |    list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents
        |), ev AS (
        |  SELECT DISTINCT array_to_string(list_slice(ltk, pos, pos + 12), ' ') AS gram
        |  FROM (SELECT unnest(range(1, greatest(len(ltk) - 12, 0) + 1)) AS pos, ltk
        |        FROM t WHERE doc_id % 50 = 0)
        |), g2 AS (
        |  SELECT doc_id, pos, array_to_string(list_slice(ltk, pos, pos + 12), ' ') AS gram
        |  FROM (SELECT doc_id, unnest(range(1, greatest(len(ltk) - 12, 0) + 1)) AS pos, ltk
        |        FROM t WHERE doc_id % 50 <> 0)
        |), rm AS (
        |  SELECT DISTINCT doc_id, unnest(range(greatest(pos - 2, 1), pos + 15)) AS tp
        |  FROM g2 JOIN ev USING (gram)
        |), rml AS (
        |  SELECT doc_id, list(tp) AS rl FROM rm GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |  CASE WHEN rml.doc_id IS NULL THEN d.text
        |    -- array_to_string([]) is NULL in DuckDB but '' in Spark: a
        |    -- fully-excised doc is the empty string on both engines
        |    ELSE coalesce(array_to_string(list_filter(t.tk,
        |      (x, i) -> NOT list_contains(rml.rl, i)), ' '), '')
        |  END AS text
        |FROM documents d JOIN t USING (doc_id) LEFT JOIN rml USING (doc_id)
        |WHERE d.doc_id % 50 <> 0""") { (s, dir) =>
      val d = docsWide(s, dir)
      graft.dedup.Dedup.exciseContaminatedSpans(
        d.where(col("doc_id") % 50 =!= 0), d.where(col("doc_id") % 50 === 0),
        "doc_id", "text", k = 13, margin = 2)
        .select(col("doc_id"), col("text"))
    },

    // §2.36d: ExactSubstr dedup (Lee et al. 2021) — every maximal
    // duplicated run of ≥ 30 tokens excised wherever no canonical
    // (min (doc_id, pos)) window occurrence protects it, text rebuilt,
    // per-doc span/token accounting. The oracle replays the whole rule
    // as strings: window grams, min-[id,pos] canonicals, coverage union
    // MINUS canonical coverage (overlapping windows with canonicals in
    // different docs must not excise every copy), gaps-and-islands
    // span merge, indexed list_filter rebuild — untouched docs must
    // round-trip byte-identical (the d33 convention). minTokens = 30:
    // the corpus' planted duplicates are long enough (runs up to ~80
    // tokens at sf0.01) that the longest-match merge is exercised.
    // Gram keys are 64-bit hash(gram) (the d20 xxhash64 convention —
    // DuckDB uses its own hash, an independent replay), and the
    // canonical pick is a row_number window ordered (doc_id, pos)
    // rather than min([doc_id, pos]): this DuckDB's min-over-LIST
    // aggregate is pathological past ~1M groups (measured 93 GB RSS /
    // 143 s at sf1 where the window form takes 0.5 GB / 0.6 s — the
    // scale gate OOM-killed on it twice). The one occurrence pass with
    // an is_can flag keeps the coverage EXCEPT from scanning twice.
    "d47_exact_substr" -> oq(
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0) AS ltk,
        |    list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, pos, hash(array_to_string(list_slice(ltk, pos, pos + 29), ' ')) AS gh
        |  FROM (SELECT doc_id, unnest(range(1, greatest(len(ltk) - 29, 0) + 1)) AS pos, ltk FROM t)
        |), o AS (
        |  SELECT doc_id, pos,
        |    row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) = 1 AS is_can,
        |    count(*) OVER (PARTITION BY gh) AS cnt
        |  FROM g
        |), rm AS (
        |  SELECT DISTINCT doc_id, unnest(range(pos, pos + 30)) AS tp
        |  FROM o WHERE cnt > 1 AND NOT is_can
        |  EXCEPT
        |  SELECT doc_id, unnest(range(pos, pos + 30)) AS tp
        |  FROM o WHERE cnt > 1 AND is_can
        |), isl AS (
        |  SELECT doc_id, tp,
        |    tp - row_number() OVER (PARTITION BY doc_id ORDER BY tp) AS island
        |  FROM rm
        |), agg AS (
        |  SELECT doc_id, list(tp) AS rl, count(DISTINCT island) AS n_spans,
        |         count(*) AS n_removed
        |  FROM isl GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |  CASE WHEN agg.doc_id IS NULL THEN d.text
        |       ELSE coalesce(array_to_string(list_filter(t.tk,
        |         (x, i) -> NOT list_contains(agg.rl, i)), ' '), '') END AS text,
        |  CAST(coalesce(n_spans, 0) AS BIGINT) AS n_spans,
        |  CAST(coalesce(n_removed, 0) AS BIGINT) AS n_removed
        |FROM documents d JOIN t USING (doc_id) LEFT JOIN agg USING (doc_id)""") { (s, dir) =>
      graft.dedup.Dedup.exactSubstrDedup(
          docsWide(s, dir).select(col("doc_id"), col("text")),
          "doc_id", "text", minTokens = 30)
        .select(col("doc_id"), col("text"), col("n_spans"), col("n_removed"))
    },

    // §2.36e: soft dedup (He et al. 2024 SoftDedup) — every doc kept,
    // down-weighted by the geometric-mean corpus frequency of its
    // 13-token windows (weight = exp(−mean ln c), 1.0 for all-unique
    // and under-k docs). The oracle replays windows as strings and the
    // exact closed form; 45 docs down-weight at sf0.01, floor 1/3.
    "d48_soft_dedup" -> oq(
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, array_to_string(list_slice(tk, pos, pos + 12), ' ') AS gram
        |  FROM (SELECT doc_id, unnest(range(1, greatest(len(tk) - 12, 0) + 1)) AS pos, tk FROM t)
        |), c AS (
        |  SELECT gram, count(*) AS c FROM g GROUP BY 1
        |), p AS (
        |  SELECT doc_id, count(*) AS n_windows, avg(ln(c)) AS mlc
        |  FROM g JOIN c USING (gram) GROUP BY 1
        |)
        |SELECT d.doc_id, CAST(coalesce(n_windows, 0) AS BIGINT) AS n_windows,
        |  coalesce(round(exp(-mlc), 6), 1.0) AS weight
        |FROM documents d LEFT JOIN p USING (doc_id)""") { (s, dir) =>
      graft.dedup.Dedup.softDedupWeights(
          docsWide(s, dir).select(col("doc_id"), col("text")), "doc_id", "text", k = 13)
        .withColumnRenamed("id", "doc_id")
    },

    // §2.37e: asymmetric CONTAINMENT pairs (Broder 1997) — C(A→B) =
    // |A∩B|/|A| over word 3-shingles, the quote/wrapper/superset-dup
    // detector Jaccard misses at unequal lengths. The gate runs the
    // PRODUCTION path (stop-shingle cut 0.1, the d02s convention): the
    // cut is provably inert at sf0.01 (max shingle DF 7 « 0.1×nDocs ≈ 50),
    // so the exact-pair SQL below remains a valid oracle while the cut
    // branch executes end-to-end. Both directions of each unordered pair
    // project from ONE aggregated (inter, sz1, sz2) row.
    "d49_containment" -> oq(
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0) AS tk
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, greatest(len(tk)-2, 1)),
        |      i -> array_to_string(list_slice(tk, i, i+2), ' '))) AS sset
        |  FROM toks
        |), ex AS (
        |  SELECT doc_id, len(sset) AS sz, unnest(sset) AS s FROM sh
        |), ag AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.sz AS sz1, b.sz AS sz2,
        |    count(*) AS inter
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4
        |), dir2 AS (
        |  SELECT id1 AS id, id2 AS container_id, CAST(inter AS DOUBLE)/sz1 AS c FROM ag
        |  UNION ALL
        |  SELECT id2, id1, CAST(inter AS DOUBLE)/sz2 FROM ag
        |)
        |SELECT id, container_id, round(c, 6) AS containment
        |FROM dir2 WHERE c >= 0.5""") { (s, dir) =>
      // Store-fed (dedupShinglePairs — the d02s pair store): both
      // containment directions project from the shared unordered-pair
      // rows; the corpus is never re-shingled or re-joined at query
      // time.
      graft.dedup.Dedup.containmentPairsFromArtifacts(
        dedupShinglePairs(s, dir), threshold = 0.5)
    },

    // §2.71b: CCNet head/middle/tail bucketing (Wenzek et al. 2020 §4.3)
    // — every doc scored under its OWN language's unigram LM, then
    // per-language perplexity TERTILES label head (best third) / middle /
    // tail. Cut comparison happens on the 6dp-rounded score scaled to a
    // BIGINT, so quantile interpolation over identical integer multisets
    // replays exactly; both engines compute the same CASE.
    "d50_ccnet_buckets" -> oq(
      """WITH tk AS (
        |  SELECT doc_id, lang, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0)) AS token
        |  FROM documents
        |), lm AS (
        |  SELECT lang, token, count(*) AS c FROM tk GROUP BY 1, 2
        |), tot AS (
        |  SELECT lang, CAST(sum(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v
        |  FROM lm GROUP BY 1
        |), tf AS (
        |  SELECT doc_id, lang, token, count(*) AS tfc FROM tk GROUP BY 1, 2, 3
        |), x AS (
        |  SELECT doc_id, lang,
        |    round(-sum(tfc * ln((c + 1.0) / (n + v))) / sum(tfc), 6) AS xent
        |  FROM tf JOIN lm USING (lang, token) JOIN tot USING (lang)
        |  GROUP BY 1, 2
        |), xi AS (
        |  SELECT doc_id, lang, xent,
        |    CAST(round(xent * 1000000, 0) AS BIGINT) AS pi
        |  FROM x
        |), cuts AS (
        |  SELECT lang, quantile_cont(pi, 1.0/3) AS c1, quantile_cont(pi, 2.0/3) AS c2
        |  FROM xi GROUP BY 1
        |)
        |SELECT doc_id, lang, xent,
        |  CASE WHEN pi <= c1 THEN 'head' WHEN pi <= c2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM xi JOIN cuts USING (lang)""") { (s, dir) =>
      graft.text.CorpusOps.perplexityBuckets(docs(s, dir), "doc_id", "text", "lang")
    },

    // §2.43b: TRAINED char-n-gram NB language ID (Wenzek 2020 §3.1 gate
    // on fastText LID; Joulin 2017's char-n-gram features) — train on a
    // CONSTANT 250-doc labeled slice and score a CONSTANT 4% sample
    // (doc_id % 25 = 1, disjoint from d51b's % 25 = 2) of the rest: the
    // production shape (fastText LID trains on bounded labeled data,
    // never on the crawl), and the gate's cost stays train-flat /
    // score-linear at every scale factor. Both slices read from the
    // per-JVM MATERIALIZED sample tables (see sampleTable): the round-13
    // sweep measured this gate's 182 s sf10 wall as two full-corpus text
    // scans (train-slice + scored-slice discovery — modulo/range
    // predicates cannot row-group-prune), not the train or scoring
    // compute. The oracle replays the ENTIRE loop from the base table:
    // per-(lang, gram) counts → lpc/floor/prior → per-doc posterior →
    // rounded argmax with the lang-asc tie-break.
    "d51_nb_langid" -> oq(
      """WITH base AS (
        |  SELECT doc_id, lang, lower(trim(text)) AS s FROM documents
        |), g AS (
        |  SELECT doc_id, lang,
        |    list_concat(
        |      CASE WHEN len(s) >= 3 THEN list_transform(generate_series(1, len(s)-2),
        |        i -> substr(s, i, 3)) ELSE CAST([] AS VARCHAR[]) END,
        |      CASE WHEN len(s) >= 4 THEN list_transform(generate_series(1, len(s)-3),
        |        i -> substr(s, i, 4)) ELSE CAST([] AS VARCHAR[]) END
        |    ) AS grams
        |  FROM base
        |), gc AS (
        |  SELECT lang, gram, CAST(count(*) AS DOUBLE) AS c
        |  FROM (SELECT lang, unnest(grams) AS gram FROM g WHERE doc_id < 250)
        |  GROUP BY 1, 2
        |), nl AS (
        |  SELECT lang, sum(c) AS n FROM gc GROUP BY 1
        |), vv AS (
        |  SELECT CAST(count(DISTINCT gram) AS DOUBLE) AS v FROM gc
        |), dc AS (
        |  SELECT lang, CAST(count(*) AS DOUBLE) AS d FROM base WHERE doc_id < 250 GROUP BY 1
        |), tot AS (SELECT sum(d) AS td FROM dc),
        |stats AS (
        |  SELECT dc.lang, ln(d / td) AS prior, ln(0.5) - ln(n + 0.5 * v) AS floor,
        |         CAST(row_number() OVER (ORDER BY dc.lang) - 1 AS INT) AS r
        |  FROM dc CROSS JOIN tot JOIN nl ON nl.lang = dc.lang CROSS JOIN vv
        |), w AS (
        |  SELECT gram, lang, ln((c + 0.5) / 0.5) AS lpc FROM gc
        |), test AS (
        |  SELECT doc_id, lang, grams, CAST(len(grams) AS DOUBLE) AS t
        |  FROM g WHERE doc_id >= 250 AND doc_id % 25 = 1
        |), tfc AS (
        |  SELECT doc_id, gram, CAST(count(*) AS DOUBLE) AS tf
        |  FROM (SELECT doc_id, unnest(grams) AS gram FROM test)
        |  GROUP BY 1, 2
        |), prt AS (
        |  SELECT doc_id, lang, sum(tf * lpc) AS p FROM tfc JOIN w USING (gram) GROUP BY 1, 2
        |), sc AS (
        |  SELECT d.doc_id, d.lang AS lang, s.lang AS cand, s.r,
        |    round(s.prior + coalesce(p.p, 0) + d.t * s.floor, 6) AS score
        |  FROM test d CROSS JOIN stats s
        |  LEFT JOIN prt p ON p.doc_id = d.doc_id AND p.lang = s.lang
        |)
        |SELECT doc_id, lang, cand AS lang_pred, score
        |FROM sc
        |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, r ASC) = 1""") { (s, dir) =>
      val model = graft.text.CharLangId.train(
        sampleTable(s, dir, "documents", "lt250")(col("doc_id") < 250),
        "text", "lang")
      val test = sampleTable(s, dir, "documents", "m25r1")(
        col("doc_id") >= 250 && col("doc_id") % 25 === 1)
      graft.text.CharLangId.predict(test, "doc_id", "text", model)
        .join(test.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("lang_pred"), col("score"))
    },

    // §2.43b serve path: LID scoring from a PERSISTED model
    // (CharLangId.write/load — the e11 build/serve split applied to the
    // language-ID tier): the model trains + writes ONCE per JVM per sf
    // dir; every later invocation (bench reps 2..n, whose median is the
    // recorded wall) pays load + one scoring pass only. The oracle
    // replays the persisted table's CONTENT by rerunning the
    // deterministic train (counts → lpc/floor/prior are pure functions
    // of the same 250-doc slice) and then the same scoring join over a
    // DISJOINT test slice from d51's, so both gates stay independent.
    // The scored slice is a CONSTANT 4% (doc_id % 25 = 2), read from the
    // per-JVM MATERIALIZED sample table (see sampleTable): the round-13
    // sweep measured the serve wall as the unpushable full-corpus sample
    // SCAN, not the load or scoring (133.4 s at sf10 even after the 4%
    // cut), so the gate now prices what a serve tier actually pays —
    // model load + one scoring pass over a pre-laid-out slice. The
    // full-loop oracle strength lives in d51.
    "d51b_nb_langid_serve" -> oq(
      """WITH base AS (
        |  SELECT doc_id, lang, lower(trim(text)) AS s FROM documents
        |), g AS (
        |  SELECT doc_id, lang,
        |    list_concat(
        |      CASE WHEN len(s) >= 3 THEN list_transform(generate_series(1, len(s)-2),
        |        i -> substr(s, i, 3)) ELSE CAST([] AS VARCHAR[]) END,
        |      CASE WHEN len(s) >= 4 THEN list_transform(generate_series(1, len(s)-3),
        |        i -> substr(s, i, 4)) ELSE CAST([] AS VARCHAR[]) END
        |    ) AS grams
        |  FROM base
        |), gc AS (
        |  SELECT lang, gram, CAST(count(*) AS DOUBLE) AS c
        |  FROM (SELECT lang, unnest(grams) AS gram FROM g WHERE doc_id < 250)
        |  GROUP BY 1, 2
        |), nl AS (
        |  SELECT lang, sum(c) AS n FROM gc GROUP BY 1
        |), vv AS (
        |  SELECT CAST(count(DISTINCT gram) AS DOUBLE) AS v FROM gc
        |), dc AS (
        |  SELECT lang, CAST(count(*) AS DOUBLE) AS d FROM base WHERE doc_id < 250 GROUP BY 1
        |), tot AS (SELECT sum(d) AS td FROM dc),
        |stats AS (
        |  SELECT dc.lang, ln(d / td) AS prior, ln(0.5) - ln(n + 0.5 * v) AS floor,
        |         CAST(row_number() OVER (ORDER BY dc.lang) - 1 AS INT) AS r
        |  FROM dc CROSS JOIN tot JOIN nl ON nl.lang = dc.lang CROSS JOIN vv
        |), w AS (
        |  SELECT gram, lang, ln((c + 0.5) / 0.5) AS lpc FROM gc
        |), test AS (
        |  SELECT doc_id, lang, grams, CAST(len(grams) AS DOUBLE) AS t
        |  FROM g WHERE doc_id >= 250 AND doc_id % 25 = 2
        |), tfc AS (
        |  SELECT doc_id, gram, CAST(count(*) AS DOUBLE) AS tf
        |  FROM (SELECT doc_id, unnest(grams) AS gram FROM test)
        |  GROUP BY 1, 2
        |), prt AS (
        |  SELECT doc_id, lang, sum(tf * lpc) AS p FROM tfc JOIN w USING (gram) GROUP BY 1, 2
        |), sc AS (
        |  SELECT d.doc_id, d.lang AS lang, s.lang AS cand, s.r,
        |    round(s.prior + coalesce(p.p, 0) + d.t * s.floor, 6) AS score
        |  FROM test d CROSS JOIN stats s
        |  LEFT JOIN prt p ON p.doc_id = d.doc_id AND p.lang = s.lang
        |)
        |SELECT doc_id, lang, cand AS lang_pred, score
        |FROM sc
        |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, r ASC) = 1""") { (s, dir) =>
      val model = graft.text.CharLangId.load(s, langIdServeModelDir(s, dir))
      val test = sampleTable(s, dir, "documents", "m25r2")(
        col("doc_id") >= 250 && col("doc_id") % 25 === 2)
      graft.text.CharLangId.predict(test, "doc_id", "text", model)
        .join(test.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("lang_pred"), col("score"))
    },

    // §2.46b: the FULL Gopher quality-rule battery (Rae 2021 Table A1)
    // — every published signal as one map-only pass (11 sorted folds
    // per doc, no shuffle, no UDF) plus the `keep` verdict at the
    // published thresholds. The oracle replays EVERY signal from
    // (segment → count) tables: token scalars, line/paragraph count-
    // and char-mass duplicate fractions, top-2/3/4-gram char shares
    // and dup-5..10-gram char masses, then the same threshold AND over
    // the same 6dp-rounded values.
    "d52_gopher" -> oq(gopherSigSql(2)) { (s, dir) =>
      graft.text.CorpusOps.gopherSignals(docs(s, dir), "doc_id", "text")
    },

    // §2.46b bench form: the SAME battery over a CONSTANT 20% sample,
    // read from the per-JVM MATERIALIZED sample table (see sampleTable —
    // the modulo predicate cannot row-group-prune, so deriving the slice
    // in-gate paid the full corpus text read every invocation): d52 is
    // an honest linear map pass, so a fifth of the corpus prices the
    // same plan at a fifth of the wall — the full-corpus form stays the
    // correctness gate at every sf (Verify/scalecheck) and is
    // bench-excluded like d02/d06. The oracle is d52's own SQL
    // restricted to the sampled ids over the BASE table — valid because
    // every signal is a per-document pure function of text.
    "d52s_gopher_sample" -> oq(
      s"""SELECT * FROM (
         |${gopherSigSql(2)}
         |) WHERE doc_id % 5 = 3""") { (s, dir) =>
      graft.text.CorpusOps.gopherSignals(
        Tpch.fillCores(
          sampleTable(s, dir, "documents", "m5r3")(col("doc_id") % 5 === 3)),
        "doc_id", "text")
    },

    // §2.75d: intrinsic tokenizer eval — per-source fertility (subword
    // tokens per word), bytes/token compression and word-splitting rate
    // under the t13 BPE table. Rows-only: the min-rank encoder is not
    // SQL-expressible; CorpusOpsSpec pins the arithmetic on a
    // hand-encoded corpus and the d-series BpeSpec pins the encoder.
    "t22_tokenizer_eval" -> nq { (s, dir) =>
      val d = docs(s, dir)
      val merges = graft.text.Bpe.bpeMerges(s, d, "text", numMerges = 40)
        .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
      graft.text.CorpusOps.tokenizerEval(d, "text", "source",
        graft.text.Bpe.encodeUdf(merges))
    },

    // §2.63b: temperature-scaled language mixture (mBERT/XLM-R/mT5
    // balancing, alpha = 0.3) at a 500-doc budget — the head language
    // downsamples (n_copies ∈ {0,1}) while tail languages upsample
    // (n_copies ≥ 1 with a Bernoulli extra epoch); the md5-fraction draw
    // and the IN-ENGINE hex threshold replay exactly (r_i rounded 6dp
    // before floor/frac so both engines branch identically).
    "t23_temperature_mix" -> oq(
      """WITH n AS (
        |  SELECT lang, CAST(count(*) AS DOUBLE) AS ni,
        |         pow(CAST(count(*) AS DOUBLE), 0.3) AS w
        |  FROM documents GROUP BY 1
        |), z AS (SELECT sum(w) AS z FROM n),
        |r AS (SELECT lang, round(500.0 * w / z / ni, 6) AS ri FROM n CROSS JOIN z)
        |SELECT * FROM (
        |  SELECT doc_id, lang,
        |    CAST(floor(ri) AS BIGINT) +
        |    CASE WHEN substr(md5('temp:' || CAST(doc_id AS STRING)), 1, 8)
        |          < lpad(lower(to_hex(CAST(floor((ri - floor(ri)) * 4294967296.0) AS BIGINT))), 8, '0')
        |         THEN 1 ELSE 0 END AS n_copies
        |  FROM documents JOIN r USING (lang)
        |) WHERE n_copies > 0""") { (s, dir) =>
      graft.text.CorpusOps.temperatureMixture(docs(s, dir), "doc_id", "lang",
          alpha = 0.3, budget = 500L)
        .select(col("doc_id"), col("lang"), col("n_copies"))
    },

    // §2.38b: PERSISTENT incremental MinHash index — the even-id half of
    // the corpus is indexed (build + parquet write + load), then the
    // odd-id half arrives as an ingest batch and is LSH-deduped AGAINST
    // THE STORE. Same oracle trick as d03: at these parameters LSH
    // recall is 1.0 on the gate corpus (spec-locked), so the exact
    // cross-half Jaccard pairs ARE the expected result; the index's
    // hashed-shingle Jaccard equals string Jaccard short of an xxhash64
    // collision inside one pair's union.
    "d20_minhash_index" -> oq(
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0) AS tk
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, greatest(len(tk)-2, 1)),
        |      i -> array_to_string(list_slice(tk, i, i+2), ' '))) AS sset
        |  FROM toks
        |), ex AS (
        |  SELECT doc_id, len(sset) AS sz, unnest(sset) AS s FROM sh
        |)
        |SELECT b.doc_id AS id, a.doc_id AS dup_of,
        |  round(CAST(count(*) AS DOUBLE)/(a.sz + b.sz - count(*)), 6) AS jaccard
        |FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
        |GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
        |HAVING CAST(count(*) AS DOUBLE)/(a.sz + b.sz - count(*)) >= 0.5""") { (s, dir) =>
      val d = docs(s, dir)
      val tmp = scratchDir("graft-mhidx-gate")
      val idx = graft.dedup.MinHashIndex.create(s, tmp,
        d.where(col("doc_id") % 2 === 0), "doc_id", "text",
        k = 3, numHashes = 32, bands = 8)
      idx.pairsAgainst(d.where(col("doc_id") % 2 === 1), "doc_id", "text", threshold = 0.5)
    },

    "d08_langid" -> oq(
      """WITH t AS (
        |  SELECT list_distinct(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'), w -> len(w) > 0)) AS toks
        |  FROM documents
        |), sc AS (
        |  SELECT
        |    len(list_intersect(toks, ['the','a','of','and','to','in','is','it','that','for'])) AS en,
        |    len(list_intersect(toks, ['der','die','das','und','ist','nicht','ein','mit','auf','zu'])) AS de,
        |    len(list_intersect(toks, ['le','la','les','et','est','un','une','dans','que','pour'])) AS fr,
        |    len(list_intersect(toks, ['el','la','los','y','es','un','una','en','que','por'])) AS es
        |  FROM t
        |)
        |SELECT CASE WHEN greatest(en,de,fr,es) = 0 THEN 'und'
        |            WHEN en = greatest(en,de,fr,es) THEN 'en'
        |            WHEN de = greatest(en,de,fr,es) THEN 'de'
        |            WHEN fr = greatest(en,de,fr,es) THEN 'fr'
        |            ELSE 'es' END AS lang_pred,
        |  count(*) AS n_docs
        |FROM sc GROUP BY 1""") { (s, dir) =>
      docs(s, dir)
        .select(graft.text.TextFunctions.langId(col("text")).as("lang_pred"))
        .groupBy("lang_pred").agg(count(lit(1)).as("n_docs"))
    },

    // §2.44: quality scoring per source
    "d09_quality" -> oq(
      """WITH q AS (
        |  SELECT source,
        |    round((
        |      least(CAST(len(list_filter(string_split_regex(trim(text),'\s+'), t -> len(t)>0)) AS DOUBLE)/100.0, 1.0)
        |      + (1.0 - least(CAST(len(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
        |                     / greatest(CAST(len(text) AS DOUBLE), 1.0) * 10.0, 1.0))
        |      + least(CAST(len(list_filter(string_split_regex(lower(trim(text)),'\s+'),
        |          t -> list_contains(['the','a','of','and','to','in','is','it','that','for'], t))) AS DOUBLE)
        |          / greatest(CAST(len(list_filter(string_split_regex(trim(text),'\s+'), t -> len(t)>0)) AS DOUBLE), 1.0) * 5.0, 1.0)
        |    ) / 3.0, 6) AS quality
        |  FROM documents
        |)
        |SELECT source, round(avg(quality), 4) AS avg_quality, count(*) AS n_docs
        |FROM q GROUP BY source""") { (s, dir) =>
      docs(s, dir)
        .select(col("source"), graft.text.TextFunctions.qualityScore(col("text")).as("quality"))
        .groupBy("source")
        .agg(round(avg(col("quality")), 4).as("avg_quality"), count(lit(1)).as("n_docs"))
    },

    // §2.45: token counting (whitespace + BPE-ish regex). Outer CASTs:
    // DuckDB sum(BIGINT) is HUGEINT → float64 under the driver's pandas
    // compare; cast back to BIGINT to match Spark's int64.
    "d10_tokens" -> oq(
      """SELECT source,
        |CAST(sum(CAST(len(list_filter(string_split_regex(trim(text),'\s+'), t -> len(t)>0)) AS BIGINT)) AS BIGINT) AS ws_tokens,
        |CAST(sum(CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]', 0)) AS BIGINT)) AS BIGINT) AS bpe_tokens,
        |count(*) AS n_docs
        |FROM documents GROUP BY source""") { (s, dir) =>
      import graft.text.TextFunctions._
      docs(s, dir)
        .groupBy("source")
        .agg(sum(tokenCount(col("text"))).as("ws_tokens"),
          sum(bpeTokenCount(col("text"))).as("bpe_tokens"),
          count(lit(1)).as("n_docs"))
    },

    // §2.46: document fingerprinting (md5 + min-shingle winnowing)
    "d11_fingerprint" -> oq(
      """WITH toks AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(trim(text)),'\s+'), t -> len(t)>0) AS tk
        |  FROM documents
        |)
        |SELECT doc_id,
        |  md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
        |  list_aggregate(list_transform(
        |    list_distinct(list_transform(generate_series(1, greatest(len(tk)-2,1)),
        |      i -> array_to_string(list_slice(tk, i, i+2), ' '))),
        |    s -> md5(s)), 'min') AS min_shingle_fp
        |FROM toks""") { (s, dir) =>
      import graft.text.TextFunctions._
      docs(s, dir).select(col("doc_id"),
        fingerprint(col("text")).as("fp"),
        minShingleFingerprint(col("text"), 3).as("min_shingle_fp"))
    },

    // §2: heavy-hitters sketch (TypedImperativeAggregate, space-saving) —
    // exact here because capacity exceeds the corpus vocabulary
    "d12_heavy_hitters" -> oq(
      """SELECT w AS value, count(*) AS count
        |FROM (SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |             t -> len(t) > 0)) AS w FROM documents)
        |GROUP BY w ORDER BY count DESC, w LIMIT 10""") { (s, dir) =>
      import graft.functions.HeavyHitters.heavyHitters
      docs(s, dir)
        .select(explode(graft.text.TextFunctions.wsTokens(lower(col("text")))).as("w"))
        .agg(heavyHitters(col("w"), 10, capacity = 4096).as("hh"))
        .selectExpr("inline(hh)")
    },

    // §2.33f (grouped): the same space-saving aggregate composed PER
    // GROUP — top tokens per source; exact here because capacity
    // exceeds the vocabulary, so the oracle is the plain grouped top-5.
    "d28_heavy_hitters_grouped" -> oq(
      """SELECT source, w AS value, count(*) AS count
        |FROM (SELECT source, unnest(list_filter(
        |  string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0)) AS w
        |  FROM documents)
        |GROUP BY source, w
        |QUALIFY row_number() OVER (
        |  PARTITION BY source ORDER BY count(*) DESC, w) <= 5""") { (s, dir) =>
      import graft.functions.HeavyHitters.heavyHitters
      docs(s, dir)
        .select(col("source"),
          explode(graft.text.TextFunctions.wsTokens(lower(col("text")))).as("w"))
        .groupBy(col("source"))
        .agg(heavyHitters(col("w"), 5, capacity = 4096).as("hh"))
        .selectExpr("source", "inline(hh)")
    },

    // §2.36b: materialized deduplicated corpus — keep the minimum-id doc
    // per content fingerprint (what a training pipeline actually reads)
    "d13_dedup_corpus" -> oq(
      """SELECT doc_id, source FROM documents
        |QUALIFY row_number() OVER (
        |  PARTITION BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
        |  ORDER BY doc_id) = 1""") { (s, dir) =>
      graft.dedup.Dedup.keepCanonical(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("source"))
    },

    // §2.44b: quality-threshold corpus filter (keep docs scoring ≥ 0.5)
    "d14_quality_filter" -> oq(
      """WITH q AS (
        |  SELECT source,
        |    round((
        |      least(CAST(len(list_filter(string_split_regex(trim(text),'\s+'), t -> len(t)>0)) AS DOUBLE)/100.0, 1.0)
        |      + (1.0 - least(CAST(len(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
        |                     / greatest(CAST(len(text) AS DOUBLE), 1.0) * 10.0, 1.0))
        |      + least(CAST(len(list_filter(string_split_regex(lower(trim(text)),'\s+'),
        |          t -> list_contains(['the','a','of','and','to','in','is','it','that','for'], t))) AS DOUBLE)
        |          / greatest(CAST(len(list_filter(string_split_regex(trim(text),'\s+'), t -> len(t)>0)) AS DOUBLE), 1.0) * 5.0, 1.0)
        |    ) / 3.0, 6) AS quality
        |  FROM documents
        |)
        |SELECT source, count(*) AS n_kept
        |FROM q WHERE quality >= 0.5 GROUP BY source""") { (s, dir) =>
      docs(s, dir)
        .select(col("source"), graft.text.TextFunctions.qualityScore(col("text")).as("quality"))
        .where(col("quality") >= 0.5)
        .groupBy("source").agg(count(lit(1)).as("n_kept"))
    },

    // §2.37b: duplicate clusters — connected components over the near-dup
    // pair graph (min-label propagation; oracle = recursive closure)
    "d15_dup_clusters" -> oq(
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0) AS tk
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, greatest(len(tk)-2, 1)),
        |      i -> array_to_string(list_slice(tk, i, i+2), ' '))) AS sset
        |  FROM toks
        |), ex AS (
        |  SELECT doc_id, len(sset) AS sz, unnest(sset) AS s FROM sh
        |), pairs AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
        |  HAVING CAST(count(*) AS DOUBLE)/(a.sz + b.sz - count(*)) >= 0.5
        |), edges AS (
        |  SELECT id1 AS src, id2 AS dst FROM pairs
        |  UNION SELECT id2, id1 FROM pairs
        |), closure AS (
        |  SELECT src AS id, dst AS r FROM edges
        |  UNION
        |  SELECT c.id, e.dst FROM closure c JOIN edges e ON c.r = e.src
        |)
        |SELECT id, least(id, min(r)) AS cluster_id
        |FROM closure GROUP BY id""") { (s, dir) =>
      // Pairs come from the MinHash-LSH path — the one you would run at
      // 100 TB — whose exact-Jaccard-verified output equals the exact
      // all-pairs answer here (recall 1.0 measured at sf0.01 AND sf0.1;
      // DedupSpec asserts it at these parameters), so the recursive-CTE
      // oracle over exact pairs still validates the cluster labels.
      // Store-fed (dedupArtifacts): the signature pass is shared with
      // every other LSH consumer, spec-pinned == the direct call.
      graft.dedup.Dedup.duplicateClusters(minhashPairsFromStore(s, dir))
    },

    // §2.37c: the same cluster labels via star contraction
    // (large-star/small-star, Kiveris et al. SoCC 2014) — the
    // chain-graph-safe CC variant, validated against the identical
    // recursive-CTE oracle as d15 so both distributed algorithms are
    // oracle-checked, not just spec-equivalent to each other.
    "d30_dup_clusters_star" -> oq(
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0) AS tk
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, greatest(len(tk)-2, 1)),
        |      i -> array_to_string(list_slice(tk, i, i+2), ' '))) AS sset
        |  FROM toks
        |), ex AS (
        |  SELECT doc_id, len(sset) AS sz, unnest(sset) AS s FROM sh
        |), pairs AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
        |  HAVING CAST(count(*) AS DOUBLE)/(a.sz + b.sz - count(*)) >= 0.5
        |), edges AS (
        |  SELECT id1 AS src, id2 AS dst FROM pairs
        |  UNION SELECT id2, id1 FROM pairs
        |), closure AS (
        |  SELECT src AS id, dst AS r FROM edges
        |  UNION
        |  SELECT c.id, e.dst FROM closure c JOIN edges e ON c.r = e.src
        |)
        |SELECT id, least(id, min(r)) AS cluster_id
        |FROM closure GROUP BY id""") { (s, dir) =>
      graft.dedup.Dedup.duplicateClustersStar(minhashPairsFromStore(s, dir))
    },

    // §2.37d: connected components on a PLANTED GIANT COMPONENT with
    // power-law-style hub skew — the web-corpus dup-graph shape the
    // synthetic near-dup graphs (tiny clusters) never exercise. The
    // graph is pure doc_id arithmetic, so the oracle is CLOSED FORM
    // (no recursive CTE — a transitive closure over a giant component
    // would be O(n·diameter) rows and die at scale):
    //  - giant (~33% of docs, >80% of graph nodes): every doc_id % 3 == 0,
    //    chained (g, g+3) for DEPTH (forces O(log diameter) contraction
    //    rounds) plus a block-hub edge (g, g - g % 300) for SKEW (hub
    //    degree ~100x the mean — the shape AQE's skew-join handling and
    //    the contraction's re-point joins must survive); labels collapse
    //    to the global min multiple of 3.
    //  - background: (i, i+3) two-node pairs at i % 30 == 1, so the gate
    //    also proves small components stay separate next to the giant.
    // duplicateClustersStar's maxIter throw IS the round-count gate: a
    // contraction that stops halving distances fails the query, at any
    // sf. DedupSpec additionally pins the round bound explicitly.
    "d42_cc_giant" -> oq(
      """WITH ids AS (SELECT doc_id FROM documents),
        |mm AS (SELECT min(CASE WHEN doc_id % 3 = 0 THEN doc_id END) AS m0,
        |              max(doc_id) AS mx FROM ids)
        |SELECT doc_id AS id,
        |  CASE WHEN doc_id % 3 = 0 THEN (SELECT m0 FROM mm)
        |       WHEN doc_id % 30 = 1 THEN doc_id
        |       ELSE doc_id - 3 END AS cluster_id
        |FROM ids
        |WHERE doc_id % 3 = 0
        |   OR (doc_id % 30 = 1 AND doc_id + 3 <= (SELECT mx FROM mm))
        |   OR (doc_id % 30 = 4 AND doc_id - 3 >= 0)""") { (s, dir) =>
      val ids = docs(s, dir).select(col("doc_id"))
      val mx = ids.agg(max(col("doc_id"))).head().getLong(0)
      val g = ids.where(col("doc_id") % 3 === 0)
      val chain = g.where(col("doc_id") + 3 <= mx)
        .select(col("doc_id").as("id1"), (col("doc_id") + 3).as("id2"))
      val hubs = g.select(col("doc_id").as("id1"),
        (col("doc_id") - col("doc_id") % 300).as("id2"))
      val background = ids
        .where(col("doc_id") % 30 === 1 && col("doc_id") + 3 <= mx)
        .select(col("doc_id").as("id1"), (col("doc_id") + 3).as("id2"))
      val pairs = chain.unionByName(hubs).unionByName(background)
        .where(col("id1") =!= col("id2"))
      graft.dedup.Dedup.duplicateClustersStar(pairs)
    },

    // §2.40b: per-label embedding centroids (element-wise mean), emitted
    // as (label, dim, value) scalars for the oracle compare
    // `+ 0.0` on both sides normalizes IEEE negative zero: Spark's round
    // (BigDecimal) yields +0.0 for tiny negatives while DuckDB's keeps
    // -0.0, and the hash compare is string-based (shows up at sf0.1)
    "e01_centroid" -> oq(
      """SELECT label, CAST(i AS BIGINT) AS dim,
        |round(avg(CAST(e AS DOUBLE)), 4) + 0.0 AS c
        |FROM (SELECT label, unnest(embedding) AS e,
        |             generate_subscripts(embedding, 1) AS i
        |      FROM embeddings)
        |GROUP BY 1, 2""") { (s, dir) =>
      graft.sim.Similarity.centroids(emb(s, dir), "label", "embedding")
        .select(col("grp").as("label"), posexplode(col("centroid")).as(Seq("pos", "c")))
        .select(col("label"), (col("pos") + 1).cast("long").as("dim"),
          (round(col("c"), 4) + lit(0.0)).as("c"))
    },

    // §2.42c: PERSISTENT IVF index — the FAISS-style train/add/search
    // split: build + parquet write once, load a fresh handle, search
    // from the stored tables alone (rows-only; spec proves full-probe
    // equality with brute force through the parquet round-trip)
    "e03_ann_index" -> nq { (s, dir) =>
      val tmp = scratchDir("graft-ivf")
      val e = emb(s, dir)
      // same √n cell sizing as e02 — the persistent index carries the
      // cell count in its meta, so the search side needs no knob
      val cents = graft.sim.Similarity.suggestedCentroids(
        graft.dedup.Dedup.approxRowCount(e))
      graft.sim.IvfIndex.build(e, "vec_id", "embedding",
        numCentroids = cents, iters = 2,
        trainCap = math.max(2000, 40 * cents)).write(tmp)
      graft.sim.IvfIndex.load(s, tmp).search(e, "vec_id", "embedding",
        k = 5, nProbe = 4, excludeSelf = true)
    },

    // §2.42c serve path: search against a PREBUILT persistent IVF index
    // — the e10/e11 build/serve split applied to the IVF tier (round-14
    // verdict, Next #2). The index (e03's exact sizing) builds + writes
    // ONCE per JVM per sf dir; every later invocation — bench reps
    // 2..n, whose median is the recorded wall — prices load + probe
    // only: one query vector per label (the e12 batch shape) probed
    // through the cid-bucketed postings, whose loaded scan reports
    // HashPartitioning so repeat searches skip the postings-side
    // exchange. e03 keeps pricing the one-time build and stays the
    // correctness gate. Rows-only: IvfIndexSpec pins loaded-search ==
    // brute force at full probe through the parquet round-trip.
    "e03b_ann_index_serve" -> nq { (s, dir) =>
      val e = emb(s, dir)
      val queries = e.groupBy(col("label"))
        .agg(min(col("vec_id")).as("vec_id"))
        .join(e, Seq("vec_id", "label"))
        .select(col("vec_id"), col("embedding"))
      graft.sim.IvfIndex.load(s, ivfServeIndexDir(s, dir))
        .search(queries, "vec_id", "embedding", k = 10, nProbe = 4,
          excludeSelf = true)
    },

    // §2.42e: product quantization + ADC (Jégou et al. 2011 — FAISS
    // IVF-PQ's codebook half): 64 float dims compress to 8 codes, the
    // query scores every row through a driver-built m×k lookup table
    // (pure codegen array-aggregate, no join, no vector column in the
    // scan). Rows-only: per-subspace Lloyd training is iterative;
    // PqSpec pins codebook shape, cluster purity and the k-dial.
    "e07_pq_adc" -> nq { (s, dir) =>
      val e = emb(s, dir)
      val books = graft.sim.Pq.train(e, "vec_id", "embedding", m = 8, k = 16,
        iters = 3)
      val codes = graft.sim.Pq.encode(e, "vec_id", "embedding", books)
      val q = e.where(col("vec_id") === 0L)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      graft.sim.Pq.adcTopK(codes.where(col("vec_id") =!= 0L), "vec_id",
        q, books, k = 10)
    },

    // §2.42f: the FULL FAISS-IVFADC composition — IVF cells prune which
    // rows are touched, PQ codes shrink what is scored, exact rerank
    // restores the fine ranking (PqSpec: == brute force at full probe,
    // recall@5 1.0 at nProbe 3/8). Rows-only: two iterative Lloyd
    // trainings inside.
    "e08_ivfadc" -> nq { (s, dir) =>
      val e = emb(s, dir)
      val q = e.where(col("vec_id") === 0L)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      graft.sim.Pq.ivfAdcTopK(e.where(col("vec_id") =!= 0L), "vec_id",
        "embedding", q, k = 10, m = 8, codesPerSub = 16,
        numCentroids = 16, nProbe = 4, candidates = 50, iters = 2)
    },

    // §2.42g: IVFADC with RESIDUAL encoding (faiss.IndexIVFPQ's actual
    // storage): PQ codebooks quantize v − centroid(cell(v)), ADC scores
    // through per-probed-cell LUTs (nProbe·m·k floats, driver-built);
    // pruning is a FILTER on the codes table's own cid — no join.
    // Rows-only: two iterative Lloyd trainings; PqSpec pins == brute
    // force at full probe and the ADC-error drop vs the non-residual
    // form on clustered data.
    "e09_ivfadc_residual" -> nq { (s, dir) =>
      val e = emb(s, dir)
      val q = e.where(col("vec_id") === 0L)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      graft.sim.Pq.ivfAdcResidualTopK(e.where(col("vec_id") =!= 0L), "vec_id",
        "embedding", q, k = 10, m = 8, codesPerSub = 16,
        numCentroids = 16, nProbe = 4, candidates = 50, iters = 2)
    },

    // §2.42h: PERSISTENT IVFADC index (faiss.IndexIVFPQ on disk) — the
    // e03 train/add/search split applied to the PQ tier: build + write
    // once (coarse centroids, residual codebooks, cid-bucketed codes),
    // load a fresh handle, search from the stored bytes with NO
    // retraining — ADC over per-probed-cell LUTs, exact rerank against
    // the caller's vector table. Rows-only: two iterative Lloyd
    // trainings inside build; PqSpec pins loaded-search == in-memory
    // search id-for-id through the parquet round-trip.
    "e10_pq_index" -> nq { (s, dir) =>
      val tmp = scratchDir("graft-pq")
      val e = emb(s, dir)
      val q = e.where(col("vec_id") === 0L)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      // same ~sqrt(n) cell sizing as e02/e03: fixed nProbe over sqrt(n)
      // cells keeps per-query scored codes ~nProbe*sqrt(n), where a
      // fixed cell count degrades to nProbe*n/16 (measured: e12 ran
      // 12.4x on 10x data before this)
      graft.sim.PqIndex.build(e.where(col("vec_id") =!= 0L), "vec_id",
          "embedding", m = 8, codesPerSub = 16,
          numCentroids = graft.sim.Similarity.suggestedCentroids(
            graft.dedup.Dedup.approxRowCount(e)), iters = 2)
        .write(tmp)
      graft.sim.PqIndex.load(s, tmp)
        .search(e.where(col("vec_id") =!= 0L), "vec_id", "embedding",
          q, k = 10, nProbe = 4, candidates = 50)
    },

    // §2.42h batch path: a QUERY FRAME against the prebuilt PQ index —
    // one vector per label (10 queries) ADC-searched in a single plan:
    // per-query LUT literals replaced by ONE codebook literal, ADC
    // computed inline at the cid equi-join (no per-query driver work).
    // Rows-only: PqSpec pins batch == per-query-LUT parity id-for-id.
    "e12_pq_batch_search" -> nq { (s, dir) =>
      val idxDir = pqServeIndexDir(s, dir)
      val e = emb(s, dir)
      val queries = e.groupBy(col("label"))
        .agg(min(col("vec_id")).as("vec_id"))
        .join(e, Seq("vec_id", "label"))
        .select(col("vec_id"), col("embedding"))
      graft.sim.PqIndex.load(s, idxDir)
        .searchBatch(queries, "vec_id", "embedding", k = 10, nProbe = 4,
          excludeSelf = true)
    },

    // §2.42i: Johnson–Lindenstrauss random projection (Achlioptas 2003
    // ±1 matrix) 64 → 16 dims as a native codegen'd expression — the
    // map-only width reduction rows pass through BEFORE the
    // shuffle-heavy ANN tiers. The Rademacher sign is a seeded integer
    // congruence (with the rank-saving j·k cross term), so DuckDB
    // replays the projection digit-for-digit — a fully oracle-checked
    // "random" matrix.
    "e13_random_projection" -> oq(
      """WITH e AS (
        |  SELECT vec_id, unnest(embedding) AS x,
        |         unnest(generate_series(0, len(embedding) - 1)) AS j
        |  FROM embeddings
        |)
        |SELECT vec_id, k,
        |  round(sum(x * (CASE WHEN ((j * 2654435761 + k * 40503
        |                             + j * k * 2246822519 + 7) % 1000003) % 2 = 0
        |                 THEN 1.0 ELSE -1.0 END)) / sqrt(16.0), 6) + 0.0 AS comp
        |FROM e CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS k)
        |GROUP BY 1, 2""") { (s, dir) =>
      emb(s, dir).select(col("vec_id"),
          posexplode(graft.functions.VectorFunctions.randomProjection(
            col("embedding"), dOut = 16, seed = 7L)).as(Seq("k", "comp")))
        .select(col("vec_id"), col("k").cast("long").as("k"),
          (round(col("comp"), 6) + lit(0.0)).as("comp"))
    },

    // §2.64b: prototype-distance pruning (Sorscher 2022's SSL-prototypes
    // metric; D4's pruning half) — per cluster, keep the half FARTHEST
    // from the centroid prototype. The oracle replays centroid
    // (6dp-rounded per dim) → cosine (6dp) → rank-with-id-tiebreak →
    // ceil(n/2) cut, hash-exact.
    "e14_prototype_prune" -> oq(
      """WITH d AS (
        |  SELECT label, i, round(avg(CAST(e AS DOUBLE)), 6) AS c
        |  FROM (SELECT label, unnest(embedding) AS e,
        |               generate_subscripts(embedding, 1) AS i FROM embeddings)
        |  GROUP BY 1, 2
        |), c AS (
        |  SELECT label, array_agg(c ORDER BY i) AS cv FROM d GROUP BY 1
        |), s AS (
        |  SELECT e.vec_id AS id, e.label,
        |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv), 6) AS cos
        |  FROM embeddings e JOIN c USING (label)
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY label ORDER BY cos ASC, id ASC) AS rnk,
        |    count(*) OVER (PARTITION BY label) AS n
        |  FROM s
        |)
        |SELECT id, CAST(label AS BIGINT) AS cid, cos FROM r
        |WHERE rnk <= ceil(n * 0.5)""") { (s, dir) =>
      graft.sim.Similarity.prototypePrune(emb(s, dir), "vec_id", "embedding",
          keepFrac = 0.5, clusterCol = Some("label"))
        .select(col("id"), col("cid").cast("long").as("cid"), col("cos"))
    },

    // §2.64c: KNN label propagation from a labeled seed set (the
    // FineWeb-Edu labeling shape: grade a bounded seed set, classify
    // the corpus by embedding neighborhood). Seeds = the first 128
    // vectors (CONSTANT across scale factors — the gate's cost grows
    // linearly, never quadratically); map-only scoring against a
    // driver literal, no join. Oracle replays cosine (6dp) → top-5 by
    // (cos DESC, sid ASC) → majority vote with smaller-label tie-break.
    "e15_knn_label" -> oq(
      """WITH s AS (SELECT vec_id AS sid, CAST(label AS VARCHAR) AS sl,
        |             CAST(embedding AS DOUBLE[]) AS sv
        |           FROM embeddings WHERE vec_id < 128),
        |c AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS cv
        |      FROM embeddings WHERE vec_id >= 128),
        |sc AS (
        |  SELECT c.id, s.sid, s.sl,
        |    round(list_cosine_similarity(c.cv, s.sv), 6) AS cos
        |  FROM c CROSS JOIN s
        |), top AS (
        |  SELECT id, sl FROM (
        |    SELECT id, sl,
        |      row_number() OVER (PARTITION BY id ORDER BY cos DESC, sid ASC) AS rnk
        |    FROM sc) t WHERE rnk <= 5
        |), votes AS (
        |  SELECT id, sl, count(*) AS v FROM top GROUP BY 1, 2
        |)
        |SELECT id, sl AS label_pred, v AS votes FROM votes
        |QUALIFY row_number() OVER (PARTITION BY id ORDER BY v DESC, sl ASC) = 1""") { (s, dir) =>
      val e = emb(s, dir)
      graft.sim.Similarity.knnLabel(e.where(col("vec_id") >= 128),
        "vec_id", "embedding",
        e.where(col("vec_id") < 128), "vec_id", "embedding", "label", k = 5)
    },

    // §2.64c bench form: e15's scoring pass over a CONSTANT 20% corpus
    // sample, both sides read from per-JVM MATERIALIZED sample tables
    // (see sampleTable — the modulo/range predicates cannot
    // row-group-prune, so both the sampled corpus AND the 128-seed
    // slice paid full embedding-table scans per invocation) — the
    // map-only n·|seeds| dot-product pass prices identically per row,
    // so the sample prices the same plan at a fifth of the wall; the
    // full-corpus e15 stays the correctness gate at every sf and is
    // bench-excluded. Oracle = e15's SQL with the corpus CTE sampled
    // over the BASE table (per-row independence makes the restriction
    // exact).
    "e15s_knn_label_sample" -> oq(
      """WITH s AS (SELECT vec_id AS sid, CAST(label AS VARCHAR) AS sl,
        |             CAST(embedding AS DOUBLE[]) AS sv
        |           FROM embeddings WHERE vec_id < 128),
        |c AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS cv
        |      FROM embeddings WHERE vec_id >= 128 AND vec_id % 5 = 1),
        |sc AS (
        |  SELECT c.id, s.sid, s.sl,
        |    round(list_cosine_similarity(c.cv, s.sv), 6) AS cos
        |  FROM c CROSS JOIN s
        |), top AS (
        |  SELECT id, sl FROM (
        |    SELECT id, sl,
        |      row_number() OVER (PARTITION BY id ORDER BY cos DESC, sid ASC) AS rnk
        |    FROM sc) t WHERE rnk <= 5
        |), votes AS (
        |  SELECT id, sl, count(*) AS v FROM top GROUP BY 1, 2
        |)
        |SELECT id, sl AS label_pred, v AS votes FROM votes
        |QUALIFY row_number() OVER (PARTITION BY id ORDER BY v DESC, sl ASC) = 1""") { (s, dir) =>
      graft.sim.Similarity.knnLabel(
        sampleTable(s, dir, "embeddings", "ge128m5r1")(
          col("vec_id") >= 128 && col("vec_id") % 5 === 1),
        "vec_id", "embedding",
        sampleTable(s, dir, "embeddings", "lt128")(col("vec_id") < 128),
        "vec_id", "embedding", "label", k = 5)
    },

    // §2.64c big-seed path: KNN label propagation THROUGH the served PQ
    // index (knnLabelIndexed — the composition knnLabel's 2048-literal
    // refusal points at): seeds = HALF the embedding table (scales with
    // sf, past any literal cap at sf ≥ 1), indexed ONCE per JVM per sf
    // dir (e16SeedIndexDir — the e10/e11 build/serve split: round 13
    // priced two Lloyd trainings per invocation, 92.8 s at sf10, none
    // of which a production labeling batch pays). The gate prices the
    // SERVE path: index load + ADC prefilter to 64 candidate seeds +
    // exact-cosine rerank against the seed vector table + e15's vote,
    // over a constant 10% corpus sample (materialized — disjoint from
    // the seeds). Rows-only: SimilaritySpec pins indexed == brute at
    // full probe and the ≥0.95 label-agreement sweep at these settings.
    "e16_knn_label_indexed" -> nq { (s, dir) =>
      val idx = graft.sim.PqIndex.load(s, e16SeedIndexDir(s, dir))
      val seeds = sampleTable(s, dir, "embeddings", "m2r0")(
        col("vec_id") % 2 === 0)
      val corpus = sampleTable(s, dir, "embeddings", "m10r1")(
        col("vec_id") % 10 === 1)
      graft.sim.Similarity.knnLabelIndexed(corpus, "vec_id", "embedding",
        idx, seeds, "vec_id", "embedding", "label", k = 5,
        nProbe = 4, candidates = 64)
    },

    // §2.42h serve path: IVFADC search against a PREBUILT index — the
    // production shape (codebooks + codes built once, searched many
    // times), and the wall the headline bench reports for the PQ tier.
    // The index is built lazily ONCE per JVM per sf dir; every later
    // invocation — bench reps 2..n, whose median is the recorded wall —
    // pays only load + ADC + rerank. e07–e09 keep the train-included
    // forms as correctness gates (bench-excluded, the d02/d02s
    // precedent); e10 prices the one-time build.
    "e11_pq_search" -> nq { (s, dir) =>
      val idxDir = pqServeIndexDir(s, dir)
      val e = emb(s, dir)
      val q = e.where(col("vec_id") === 0L)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      graft.sim.PqIndex.load(s, idxDir)
        .search(e.where(col("vec_id") =!= 0L), "vec_id", "embedding",
          q, k = 10, nProbe = 4, candidates = 50)
    },

    // §2.47c: cross-format image dedup — the same scene re-encoded under
    // different formats (byte-wise unrelated PNG/GIF/BMP/JPEG payloads)
    // is found by 64-bit perceptual dHash + the banding hamming join
    // shared with simhash (rows-only: the decode pipeline is engine-side;
    // MultimodalSpec pins the hash/pair semantics)
    "m03_image_dedup" -> nq { (s, dir) =>
      import graft.multimodal.Multimodal._
      // scene pool sized from the corpus (~50 copies/scene) — a fixed
      // pool makes the hamming pair join quadratic in the corpus
      // (measured 10.6× wall on 3× rows at the 30× scale point)
      val d = docsWide(s, dir)
      val n = graft.dedup.Dedup.approxRowCount(d)
      val media = withSharedScenes(d, "doc_id", nScenes = suggestedScenes(n))
      // decode parallelism comes from docsWide's slim exchange UNDER the
      // render; the media-tier gates used to ALSO repartition the rendered
      // frame by media_id, which re-shuffled the payload bytes themselves
      // (a02 measured 113 MB of WAV through that exchange) for identical
      // row-wise results — removed round 17 from all eight m/a/v gates
      graft.dedup.Dedup.hammingPairs64(
        imageDHash(media), "media_id", "dhash",
        maxHamming = 3, wide = graft.dedup.Dedup.wideHammingBands(n),
        verdictKey = s"$dir#dhash")
        .groupBy("hamming").agg(count(lit(1)).as("n_pairs"))
    },

    // §2.47f: cross-modal decontamination — which eval sets' IMAGES
    // leak into which train sources, per (eval_set, source) with
    // fractions: dHash both sides, banded cross-frame hamming join
    // (eval side benchmark-sized → broadcast), d45's matrix shape.
    // Probes 0..9 render scenes present in the train pool (planted
    // contamination, caught across formats); probes at nScenes+j render
    // novel scenes (clean — absent from the matrix). Rows-only:
    // engine-side decode; MultimodalSpec pins brute-force parity.
    "m04_image_decontam" -> nq { (s, dir) =>
      import graft.multimodal.Multimodal._
      val d = docsWide(s, dir)
      val n = graft.dedup.Dedup.approxRowCount(d)
      val nScenes = suggestedScenes(n)
      val train = withSharedScenes(d, "doc_id", nScenes)
        .join(d.select(col("doc_id").as("media_id"), col("source")), Seq("media_id"))
      val probes = s.range(0, 20).select(
        when(col("id") < 10, col("id")).otherwise(col("id") - 10 + nScenes)
          .as("media_id"),
        when(col("id") % 2 === 0, "evalA").otherwise("evalB").as("eval_set"))
      val evalMedia = withSharedScenes(probes, "media_id", nScenes + 10)
        .join(probes, Seq("media_id"))
      imageContaminationMatrix(
        train, "media_id", "source",
        evalMedia, "media_id", "eval_set",
        maxHamming = 3, wide = graft.dedup.Dedup.wideHammingBands(n))
    },

    // §2.47d: cross-encoding audio dedup — the same recording (one
    // amplitude envelope) rendered at different sample rates / channel
    // counts is found by the 64-bit energy-envelope fingerprint through
    // the same banding hamming join as text simhash and image dHash
    // (rows-only; MultimodalSpec pins the fingerprint/pair semantics)
    "a02_audio_dedup" -> nq { (s, dir) =>
      import graft.multimodal.Multimodal._
      // same corpus-sized scene pool as m03 (see the comment there)
      val d = docsWide(s, dir)
      val n = graft.dedup.Dedup.approxRowCount(d)
      val media = withSharedAudioScenes(d, "doc_id", nScenes = suggestedScenes(n))
      graft.dedup.Dedup.hammingPairs64(
        audioFingerprint(media), "media_id", "afp",
        maxHamming = 3, wide = graft.dedup.Dedup.wideHammingBands(n),
        verdictKey = s"$dir#afp")
        .groupBy("hamming").agg(count(lit(1)).as("n_pairs"))
    },

    // §2.64: SemDedup pairs with caller-supplied clusters (the labeled
    // corpus) — cluster-scoped comparisons are an equi-join on label,
    // exactly replayable in DuckDB. The learned-clustering path is
    // covered by SimilaritySpec (k=1 ≡ exact; recall on tight pairs).
    "e05_semdedup" -> oq(
      """SELECT a.vec_id AS id1, b.vec_id AS id2,
        |round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])), 6) AS cos
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.2""") { (s, dir) =>
      graft.sim.Similarity.semDedupPairs(emb(s, dir), "vec_id", "embedding",
        threshold = 0.2, clusterCol = Some("label"))
    },

    // §2.64 keep side: greedy keep-smallest-id over the semantic pairs —
    // one anti-join; the oracle replays the identical rule.
    "e06_semdedup_keep" -> oq(
      """SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings
        |WHERE vec_id NOT IN (
        |  SELECT b.vec_id FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])) >= 0.2)""") { (s, dir) =>
      graft.sim.Similarity.semDedupKeep(emb(s, dir), "vec_id", "embedding",
          threshold = 0.2, clusterCol = Some("label"))
        .select(col("vec_id"), col("label").cast("long").as("label"))
    },

    // §2.42d: int8 embedding quantization — the 4× storage path for the
    // ANN stack. Double-precision IEEE affine math with half-away-from-
    // zero rounding replays exactly in DuckDB: the oracle compares every
    // code of every vector (canonical space-joined string, the q06
    // array-cell convention).
    "e04_quantize" -> oq(
      """WITH b AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |    CAST(list_aggregate(CAST(embedding AS DOUBLE[]), 'min') AS DOUBLE) AS vmin,
        |    CAST(list_aggregate(CAST(embedding AS DOUBLE[]), 'max') AS DOUBLE) AS vmax
        |  FROM embeddings
        |), s AS (
        |  SELECT vec_id, e, vmin, vmax,
        |    CASE WHEN vmax > vmin THEN (vmax - vmin) / 255.0 ELSE 1.0 END AS scale
        |  FROM b
        |)
        |SELECT vec_id, round(vmin, 6) AS vmin, round(vmax, 6) AS vmax,
        |  array_to_string(list_transform(e,
        |    x -> CAST(CAST(round((x - vmin) / scale) AS BIGINT) - 128 AS VARCHAR)), ' ') AS codes
        |FROM s""") { (s, dir) =>
      graft.sim.Similarity.quantizeInt8(emb(s, dir), "vec_id", "embedding")
        .select(col("id").as("vec_id"),
          round(col("vmin"), 6).as("vmin"), round(col("vmax"), 6).as("vmax"),
          concat_ws(" ", transform(col("codes"),
            c => c.cast("int").cast("string"))).as("codes"))
    },

    // §2.25b: SQL-text compilation for an external store (bacon/sql.py
    // renders cube queries as Postgres SQL). The SAME generated string
    // runs on Spark here AND on DuckDB as the oracle — hash-identical
    // results prove the emitted text is genuinely portable SQL.
    "s01_sql_pushdown" -> oq(s01Sql) { (s, dir) =>
      ord(s, dir).createOrReplaceTempView("orders")
      s.sql(s01Sql)
    },

    // §2.25b (cont): regex filters through the SQL backend. No shared
    // Spark/DuckDB regex spelling exists, so the SAME CubeQuery is
    // compiled twice — the Spark-dialect string runs here, the
    // DuckDB-dialect string is the oracle; hash-identical results prove
    // the per-dialect renderings (the reference's per-dialect `to_sql`)
    // agree, match/nmatch null semantics included.
    "s02_sql_regex" -> oq(s02Sql(SqlCompiler.Dialect.DuckDb)) { (s, dir) =>
      ord(s, dir).createOrReplaceTempView("orders")
      s.sql(s02Sql(SqlCompiler.Dialect.SparkSql))
    },

    // §2.25b (cont): backslash-class regex (`\d`) — proves the dialect
    // string-literal escaping: the SparkSql rendering doubles the
    // backslash so Spark's parser hands regexp_like the same pattern
    // DuckDB's regexp_matches receives verbatim.
    "s05_sql_regex_esc" -> oq(s05Sql(SqlCompiler.Dialect.DuckDb)) { (s, dir) =>
      ord(s, dir).createOrReplaceTempView("orders")
      s.sql(s05Sql(SqlCompiler.Dialect.SparkSql))
    },

    // §2.49: reproducible train/val/test split — the assignment is a pure
    // function of the id (md5-fraction vs cumulative weight thresholds),
    // so rows never migrate between splits across re-runs, partitionings
    // or engines. The oracle runs the SAME rule (CorpusOps.splitSql) in
    // DuckDB.
    "t01_split" -> oq(
      s"""SELECT ${graft.text.CorpusOps.splitSql("doc_id", corpusSplits)} AS split,
         |count(*) AS n_docs,
         |CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM documents GROUP BY 1""") { (s, dir) =>
      docs(s, dir)
        .withColumn("split", graft.text.CorpusOps.splitColumn(col("doc_id"), corpusSplits))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    },

    // §2.49b: LEAKAGE-SAFE split — near-dup clusters co-travel to one
    // split (the split key is the doc's connected-component label;
    // pairs from the MinHash-LSH path, recall 1.0 at these parameters —
    // the d15 argument), unclustered docs split by their own id, which
    // IS their singleton component label. The oracle replays CC via the
    // d15 recursive CTE + the exact splitSql rule over the same key.
    "t17_leakage_split" -> oq(
      s"""WITH RECURSIVE toks AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS tk
         |  FROM documents
         |), sh AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(generate_series(1, greatest(len(tk)-2, 1)),
         |      i -> array_to_string(list_slice(tk, i, i+2), ' '))) AS sset
         |  FROM toks
         |), ex AS (
         |  SELECT doc_id, len(sset) AS sz, unnest(sset) AS s FROM sh
         |), pairs AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2
         |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
         |  HAVING CAST(count(*) AS DOUBLE)/(a.sz + b.sz - count(*)) >= 0.5
         |), edges AS (
         |  SELECT id1 AS src, id2 AS dst FROM pairs
         |  UNION SELECT id2, id1 FROM pairs
         |), closure AS (
         |  SELECT src AS id, dst AS r FROM edges
         |  UNION
         |  SELECT c.id, e.dst FROM closure c JOIN edges e ON c.r = e.src
         |), cc AS (
         |  SELECT id, least(id, min(r)) AS cluster_id FROM closure GROUP BY id
         |)
         |SELECT d.doc_id,
         |${graft.text.CorpusOps.splitSql("coalesce(cc.cluster_id, d.doc_id)", corpusSplits)} AS split
         |FROM documents d LEFT JOIN cc ON d.doc_id = cc.id""") { (s, dir) =>
      val d = docs(s, dir)
      graft.text.CorpusOps.leakageSafeSplit(d, minhashPairsFromStore(s, dir),
          "doc_id", corpusSplits)
        .select(col("doc_id"), col("split"))
    },

    // §2.50: token-budget shard assignment — per-source deterministic-order
    // cumulative token count, shard = floor(tokens-before / budget); the
    // layout a sequence-packing loader consumes. Oracle replicates the
    // window math (and d10's token-count SQL) in DuckDB.
    "t02_shard" -> oq(
      """WITH tok AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(string_split_regex(trim(text),'\s+'), t -> len(t)>0)) AS BIGINT) AS tokens
        |  FROM documents
        |), cum AS (
        |  SELECT source, tokens,
        |    sum(tokens) OVER (PARTITION BY source ORDER BY doc_id) AS c
        |  FROM tok
        |)
        |SELECT source, CAST(floor((c - tokens) / 256) AS BIGINT) AS shard,
        |count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS sum_tokens
        |FROM cum GROUP BY 1, 2""") { (s, dir) =>
      graft.text.CorpusOps.shardByTokenBudget(docs(s, dir), "doc_id", "text", "source", 256)
        .groupBy("source", "shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("sum_tokens"))
    },

    // §2.52: deterministic mixture sampling — per-source keep-rates
    // decided by an id-hash fraction (seeded independently of t01's
    // split), so the mixed corpus is reproducible row-for-row. Oracle
    // runs the SAME predicate (CorpusOps.mixtureSql) in DuckDB.
    "t04_mixture" -> oq(
      s"""SELECT source, count(*) AS n_docs,
         |CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM documents
         |WHERE ${graft.text.CorpusOps.mixtureSql("doc_id", "source", mixtureRates)}
         |GROUP BY source""") { (s, dir) =>
      docs(s, dir)
        .where(graft.text.CorpusOps.mixtureFilter(col("doc_id"), col("source"), mixtureRates))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    },

    // §2.53: the corpus pipeline END-TO-END — dedup → quality filter →
    // FULL Gopher battery → mixture → split → shard composed into ONE
    // lazy plan (each stage is a DataFrame transform, so Catalyst fuses
    // the filters into a single pass; exchanges are the dedup window's,
    // the gopher semi-join's and the shard window's). The oracle chains
    // the per-stage SQL already proven by d13, d14, d52, t04, t01 and
    // t02. The battery runs at minStopHits=1: the Table-A1 stop list is
    // English-specific and zeroes this synthetic corpus at the published
    // 2 (d52 proves that form standalone); every other threshold is the
    // published value, so the composition stays non-vacuous.
    "t05_corpus_pipeline" -> oq(t05Sql(""))(t05Query(docs)),

    // §2.53 bench form: the IDENTICAL composed pipeline over the
    // CONSTANT 20% materialized sample (doc_id % 5 = 4 — disjoint from
    // d52s's slice; the d52 → d52s precedent applied to the composed
    // gate, round-14 verdict Next #6). Every stage is either per-doc
    // pure (quality, Gopher, mixture, split) or a pure function of the
    // sampled SET (keepCanonical's min-id canonical, the shard window's
    // cumulative sum), and BOTH sides run the pipeline on the same
    // sample — the oracle shadows `documents` with the same modulo CTE,
    // so the checked rows are identical by construction. The full-corpus
    // t05 stays the correctness gate at every sf and is bench-excluded.
    // (main.documents: DuckDB needs the schema qualifier to reference
    // the shadowed base table from inside the same-named CTE)
    "t05s_corpus_pipeline_sample" -> oq(t05Sql(
      "documents AS (SELECT * FROM main.documents WHERE doc_id % 5 = 4),\n"))(
      t05Query((s, dir) =>
        sampleTable(s, dir, "documents", "m5r4")(col("doc_id") % 5 === 4))),

    // §2.60: deterministic per-stratum cap — at most 10 docs per source,
    // selected by the engine-replayable md5-of-id order.
    "t07_stratified_cap" -> oq(
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents
        |) WHERE rk <= 10""") { (s, dir) =>
      graft.text.CorpusOps.stratifiedCap(docs(s, dir), "doc_id", "source", cap = 10)
        .select(col("doc_id"), col("source"))
    },

    // §2.63: deterministic epoch shuffle — the seeded global training
    // order. The permutation is a pure function of (seed, id), so the
    // oracle replays the identical rule as one window; the engine never
    // single-partitions (range exchange + two-pass zip enumeration).
    "t08_epoch_shuffle" -> oq(
      """SELECT doc_id,
        |  row_number() OVER (
        |    ORDER BY md5(concat('7:', CAST(doc_id AS VARCHAR))), doc_id
        |  ) - 1 AS epoch_pos
        |FROM documents""") { (s, dir) =>
      graft.text.CorpusOps.epochShuffle(docs(s, dir).select("doc_id"), "doc_id", seed = 7L)
    },

    // §2.68c: BM25 relevance scoring for a fixed query — Robertson idf
    // with k1/b saturation, identical evaluation order on both engines.
    "d27_bm25" -> oq(
      """WITH t0 AS (
        |  SELECT doc_id, list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents
        |), dl AS (SELECT doc_id, len(tk) AS dl FROM t0),
        |a AS (SELECT avg(dl) AS avgdl FROM dl),
        |n AS (SELECT count(*) AS n FROM t0),
        |t AS (
        |  SELECT doc_id, unnest(tk) AS term FROM t0
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM t
        |  WHERE term IN ('spark', 'window', 'join') GROUP BY 1, 2
        |), dfq AS (
        |  SELECT term, count(DISTINCT doc_id) AS dfr FROM t
        |  WHERE term IN ('spark', 'window', 'join') GROUP BY 1
        |)
        |SELECT tf.doc_id, round(sum(
        |  ln(1.0 + (n.n - dfq.dfr + 0.5) / (dfq.dfr + 0.5)) *
        |  tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / a.avgdl))
        |), 6) AS bm25
        |FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id), a, n
        |GROUP BY 1""") { (s, dir) =>
      graft.text.CorpusOps.bm25Scores(docs(s, dir), "doc_id", "text",
        Seq("spark", "window", "join"))
    },

    // §2.68b: PMI term co-occurrence — presence-based collocation over
    // documents; the oracle replays the identical count chain.
    "d26_pmi" -> oq(
      """WITH t AS (
        |  SELECT DISTINCT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0)) AS term
        |  FROM documents
        |), dfreq AS (
        |  SELECT term, count(*) AS dfr FROM t GROUP BY 1
        |), n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        |p AS (
        |  SELECT a.term AS t1, b.term AS t2, count(*) AS n_ab
        |  FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.term < b.term
        |  GROUP BY 1, 2 HAVING count(*) >= 5
        |)
        |SELECT p.t1, p.t2, p.n_ab,
        |  round(ln(n.n * p.n_ab / (fa.dfr * fb.dfr)), 6) AS pmi
        |FROM p JOIN dfreq fa ON p.t1 = fa.term
        |       JOIN dfreq fb ON p.t2 = fb.term, n""") { (s, dir) =>
      graft.text.CorpusOps.pmiPairs(docs(s, dir), "doc_id", "text", minCount = 5)
    },

    // §2.68: TF-IDF top terms per document — tf × ln(N/df), 6dp-rounded
    // BEFORE the rank so equal scores tie-break on term text
    // identically in both engines.
    "d25_tfidf" -> oq(
      """WITH t AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0)) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2
        |), df AS (
        |  SELECT term, count(DISTINCT doc_id) AS dfreq FROM t GROUP BY 1
        |), n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        |s AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |    round(tf.tf * ln(n.n / df.dfreq), 6) AS tfidf
        |  FROM tf JOIN df USING (term), n
        |), r AS (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS BIGINT) AS rk
        |  FROM s
        |)
        |SELECT doc_id, term, tf, tfidf, rk FROM r WHERE rk <= 3""") { (s, dir) =>
      graft.text.CorpusOps.tfidfTopTerms(docs(s, dir), "doc_id", "text", k = 3)
    },

    // §2.66: deterministic weighted sample — exactly 100 documents,
    // inclusion ∝ length (n_chars), reproducible across engines: the
    // oracle replays key = ln(u)/w with the identical md5-fraction u.
    "t09_weighted_sample" -> oq(
      """SELECT doc_id, n_chars FROM documents
        |WHERE n_chars IS NOT NULL AND n_chars > 0
        |ORDER BY ln((CAST(concat('0x',
        |    substring(md5(concat('7:', CAST(doc_id AS VARCHAR))), 1, 8))
        |  AS BIGINT) + 1) / 4294967296.0) / CAST(n_chars AS DOUBLE) DESC,
        |  doc_id ASC
        |LIMIT 100""") { (s, dir) =>
      graft.text.CorpusOps.weightedSample(
        docs(s, dir).select("doc_id", "n_chars"), "doc_id", col("n_chars"),
        n = 100, seed = 7L)
    },

    // §2.69: sequence packing — greedy fixed-token training examples
    // assembled within t02's token-budget shards (no document splits;
    // an oversized one packs alone). The oracle replays the serial
    // greedy rule per (source, shard) with a recursive CTE — recursion
    // depth is the deepest shard's document count, bounded by the shard
    // budget itself.
    "t10_pack" -> oq(
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(string_split_regex(trim(text),'\s+'), t -> len(t)>0)) AS BIGINT) AS tokens
        |  FROM documents
        |), cum AS (
        |  SELECT doc_id, source, tokens,
        |    sum(tokens) OVER (PARTITION BY source ORDER BY doc_id) AS c
        |  FROM tok
        |), sharded AS (
        |  SELECT doc_id, source, tokens,
        |    CAST(floor((c - tokens) / 256) AS BIGINT) AS shard,
        |    CAST(row_number() OVER (
        |      PARTITION BY source, CAST(floor((c - tokens) / 256) AS BIGINT)
        |      ORDER BY doc_id) AS BIGINT) AS rn
        |  FROM cum
        |), packs AS (
        |  SELECT doc_id, source, tokens, shard, rn,
        |    CAST(0 AS BIGINT) AS pack, tokens AS fill
        |  FROM sharded WHERE rn = 1
        |  UNION ALL
        |  SELECT s.doc_id, s.source, s.tokens, s.shard, s.rn,
        |    CASE WHEN p.fill + s.tokens > 128 THEN p.pack + 1 ELSE p.pack END,
        |    CASE WHEN p.fill + s.tokens > 128 THEN s.tokens ELSE p.fill + s.tokens END
        |  FROM sharded s JOIN packs p
        |    ON s.source = p.source AND s.shard = p.shard AND s.rn = p.rn + 1
        |)
        |SELECT doc_id, source, tokens, shard, pack FROM packs""") { (s, dir) =>
      graft.text.CorpusOps.packSequences(docs(s, dir), "doc_id", "text", "source",
          shardTokens = 256, seqTokens = 128)
        .select(col("doc_id"), col("source"), col("tokens"), col("shard"), col("pack"))
    },

    // §2.69b: best-fit-decreasing packing — t10's shards, but each doc
    // goes to the open pack with the least remaining room that fits
    // ((tokens DESC, id ASC) order, lowest-index tie-break). The oracle
    // replays the EXACT recursion: the open-pack fill vector rides the
    // recursive CTE as a LIST column, best-fit chosen by an encoded
    // (residual, index) min key.
    "t25_pack_bfd" -> oq(
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(string_split_regex(trim(text),'\s+'), t -> len(t)>0)) AS BIGINT) AS tokens
        |  FROM documents
        |), cum AS (
        |  SELECT doc_id, source, tokens,
        |    sum(tokens) OVER (PARTITION BY source ORDER BY doc_id) AS c
        |  FROM tok
        |), sharded AS (
        |  SELECT doc_id, source, tokens,
        |    CAST(floor((c - tokens) / 256) AS BIGINT) AS shard,
        |    CAST(row_number() OVER (
        |      PARTITION BY source, CAST(floor((c - tokens) / 256) AS BIGINT)
        |      ORDER BY tokens DESC, doc_id ASC) AS BIGINT) AS rn
        |  FROM cum
        |), bfd AS (
        |  SELECT doc_id, source, tokens, shard, rn,
        |    CAST(0 AS BIGINT) AS pack, [tokens] AS fills
        |  FROM sharded WHERE rn = 1
        |  UNION ALL
        |  SELECT s.doc_id, s.source, s.tokens, s.shard, s.rn,
        |    CASE WHEN k.best IS NULL THEN CAST(len(p.fills) AS BIGINT)
        |         ELSE CAST(k.best % 100000 - 1 AS BIGINT) END AS pack,
        |    CASE WHEN k.best IS NULL THEN list_append(p.fills, s.tokens)
        |         ELSE list_transform(p.fills, (f, i) ->
        |           CASE WHEN i = k.best % 100000 THEN f + s.tokens ELSE f END) END AS fills
        |  FROM sharded s
        |  JOIN bfd p ON s.source = p.source AND s.shard = p.shard AND s.rn = p.rn + 1
        |  CROSS JOIN LATERAL (
        |    SELECT list_min(list_filter(
        |      list_transform(p.fills, (f, i) ->
        |        CASE WHEN 128 - f - s.tokens >= 0
        |             THEN (128 - f - s.tokens) * 100000 + i END),
        |      x -> x IS NOT NULL)) AS best) k
        |)
        |SELECT doc_id, source, tokens, shard, pack FROM bfd""") { (s, dir) =>
      graft.text.CorpusOps.packSequencesBfd(docs(s, dir), "doc_id", "text", "source",
          shardTokens = 256, seqTokens = 128)
        .select(col("doc_id"), col("source"), col("tokens"), col("shard"), col("pack"))
    },

    // §2.70: CCNet-style perplexity scoring — unigram LM trained on the
    // trusted slice (lang='en'), every document scored against it with
    // add-1 smoothing; non-English docs land on the OOV floor and score
    // visibly higher. Both sides replay the identical closed-form
    // arithmetic, so the score (6dp) hash-matches.
    "d31_perplexity" -> oq(
      """WITH tk AS (
        |  SELECT doc_id, lang, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0)) AS token
        |  FROM documents
        |), lm AS (
        |  SELECT token, count(*) AS c FROM tk WHERE lang = 'en' GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM lm
        |), tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM tk GROUP BY 1, 2
        |)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  round(-sum(tf * ln((coalesce(c, 0) + 1.0) / (n + v))) / sum(tf), 6) AS xent
        |FROM tf LEFT JOIN lm USING (token) CROSS JOIN tot
        |GROUP BY doc_id""") { (s, dir) =>
      val d = docs(s, dir)
      graft.text.CorpusOps.crossEntropyScore(d, "doc_id", "text", lmUnigram(s, dir))
        .select(col("doc_id"), col("n_tokens"),
          round(col("cross_entropy"), 6).as("xent"))
    },

    // §2.72: corpus-level boilerplate line removal (RefinedWeb line
    // dedup). The synthetic corpus has no newlines, so the gate builds
    // lines on BOTH sides (the d23/t03 convention): a universal nav
    // line, a per-source copyright line (25 docs each — over the
    // minDocs=10 bar), and 8-token body lines (unique). The rule must
    // strip exactly the first two from every document.
    "d32_line_boilerplate" -> oq(
      """WITH tk AS (
        |  SELECT doc_id, source, list_filter(
        |    string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents
        |), built AS (
        |  SELECT doc_id, concat_ws(chr(10),
        |    'nav menu home about contact',
        |    concat('copyright ', source),
        |    array_to_string(list_transform(range(0, (len(tk) + 7) // 8),
        |      g -> array_to_string(list_slice(tk, g * 8 + 1, least(g * 8 + 8, len(tk))), ' ')),
        |      chr(10))) AS text
        |  FROM tk
        |), ls AS (
        |  SELECT doc_id, string_split(text, chr(10)) AS ls FROM built
        |), keys AS (
        |  SELECT DISTINCT doc_id, trim(l) AS k
        |  FROM (SELECT doc_id, unnest(ls) AS l FROM ls)
        |  WHERE len(trim(l)) >= 1
        |), bp AS (
        |  SELECT k FROM keys GROUP BY k HAVING count(*) >= 10
        |), bpl AS (
        |  SELECT coalesce(list(k), []) AS bp FROM bp
        |)
        |SELECT doc_id,
        |  array_to_string(list_filter(ls, l -> len(trim(l)) < 1
        |    OR NOT list_contains(bp, trim(l))), chr(10)) AS clean_text,
        |  CAST(len(list_filter(ls, l -> len(trim(l)) < 1
        |    OR NOT list_contains(bp, trim(l)))) AS BIGINT) AS n_kept,
        |  CAST(len(ls) - len(list_filter(ls, l -> len(trim(l)) < 1
        |    OR NOT list_contains(bp, trim(l)))) AS BIGINT) AS n_removed
        |FROM ls CROSS JOIN bpl""") { (s, dir) =>
      import graft.text.TextFunctions
      val tk = TextFunctions.wsTokens(trim(col("text")))
      val n = size(tk)
      val nb = floor((n + lit(7)) / lit(8)).cast("int")
      val body = transform(sequence(lit(0), nb - 1),
        g => array_join(slice(tk, g * 8 + 1, lit(8)), " "))
      val built = docsWide(s, dir).select(col("doc_id"),
        concat_ws("\n",
          lit("nav menu home about contact"),
          concat(lit("copyright "), col("source")),
          array_join(body, "\n")).as("text"))
      graft.text.CorpusOps.removeBoilerplateLines(built, "doc_id", "text",
        minDocs = 10)
    },

    // §2.72b: CCNet paragraph dedup (Wenzek et al. 2019 §3.2 — the
    // highest-yield crawl filter): every duplicated normalized line
    // keeps only its (doc, pos)-first occurrence corpus-wide. Same
    // synthetic lined corpus as d32 (guaranteed cross-doc duplicate
    // lines), different semantics: keep-first-drop-rest of EVERY dup,
    // vs d32's drop-all-of-frequent.
    "d44_paragraph_dedup" -> oq(
      """WITH tk AS (
        |  SELECT doc_id, source, list_filter(
        |    string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents
        |), built AS (
        |  SELECT doc_id, concat_ws(chr(10),
        |    'nav menu home about contact',
        |    concat('copyright ', source),
        |    array_to_string(list_transform(range(0, (len(tk) + 7) // 8),
        |      g -> array_to_string(list_slice(tk, g * 8 + 1, least(g * 8 + 8, len(tk))), ' ')),
        |      chr(10))) AS text
        |  FROM tk
        |), lines AS (
        |  SELECT doc_id, pos, l,
        |    CASE WHEN len(trim(l)) >= 5 THEN lower(trim(l)) END AS k
        |  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l,
        |               generate_subscripts(string_split(text, chr(10)), 1) AS pos
        |        FROM built)
        |), ranked AS (
        |  SELECT doc_id, pos, l, k,
        |    row_number() OVER (PARTITION BY k ORDER BY doc_id, pos) AS rn
        |  FROM lines
        |)
        |SELECT doc_id,
        |  coalesce(string_agg(CASE WHEN k IS NULL OR rn = 1 THEN l END,
        |    chr(10) ORDER BY pos), '') AS clean_text,
        |  CAST(sum(CASE WHEN k IS NULL OR rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN k IS NULL OR rn = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
        |FROM ranked GROUP BY doc_id""") { (s, dir) =>
      import graft.text.TextFunctions
      val tk = TextFunctions.wsTokens(trim(col("text")))
      val n = size(tk)
      val nb = floor((n + lit(7)) / lit(8)).cast("int")
      val body = transform(sequence(lit(0), nb - 1),
        g => array_join(slice(tk, g * 8 + 1, lit(8)), " "))
      val built = docsWide(s, dir).select(col("doc_id"),
        concat_ws("\n",
          lit("nav menu home about contact"),
          concat(lit("copyright "), col("source")),
          array_join(body, "\n")).as("text"))
      graft.text.CorpusOps.dedupParagraphs(built, "doc_id", "text", minChars = 5)
    },

    // §2.71: fixed-token chunking with overlap (chunk=32, overlap=8 →
    // stride=24). Chunk boundaries are pure integer arithmetic and the
    // chunk text is an exact token slice, so the oracle hash-compares
    // strings — no FP anywhere.
    "t11_chunk" -> oq(
      """WITH tk AS (
        |  SELECT doc_id, list_filter(
        |    string_split_regex(text, '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents
        |), n AS (
        |  SELECT doc_id, tk, len(tk) AS n FROM tk WHERE len(tk) > 0
        |), c AS (
        |  SELECT doc_id, tk, n,
        |    unnest(range(0, (greatest(n - 32, 0) + 23) // 24 + 1)) AS k
        |  FROM n
        |)
        |SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
        |  CAST(k * 24 + 1 AS BIGINT) AS start_token,
        |  CAST(least(32, n - k * 24) AS BIGINT) AS chunk_tokens,
        |  array_to_string(list_slice(tk, k * 24 + 1, least(k * 24 + 32, n)), ' ')
        |    AS chunk_text
        |FROM c""") { (s, dir) =>
      graft.text.CorpusOps.chunkDocs(docs(s, dir), "doc_id", "text",
        chunkTokens = 32, overlapTokens = 8)
    },

    // §2.61: keep-rate-calibrated quality filter — the threshold is the
    // exact 25th percentile of the 6dp-rounded score (Spark `percentile`
    // and DuckDB `quantile_cont` share the interpolated definition over
    // identical rounded inputs), so "keep the best 75%" needs no magic
    // constant.
    "d22_quality_calibrated" -> oq(
      """WITH q AS (
        |  SELECT doc_id,
        |    round((
        |      least(CAST(len(list_filter(string_split_regex(trim(text),'\s+'), t -> len(t)>0)) AS DOUBLE)/100.0, 1.0)
        |      + (1.0 - least(CAST(len(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
        |                     / greatest(CAST(len(text) AS DOUBLE), 1.0) * 10.0, 1.0))
        |      + least(CAST(len(list_filter(string_split_regex(lower(trim(text)),'\s+'),
        |          t -> list_contains(['the','a','of','and','to','in','is','it','that','for'], t))) AS DOUBLE)
        |          / greatest(CAST(len(list_filter(string_split_regex(trim(text),'\s+'), t -> len(t)>0)) AS DOUBLE), 1.0) * 5.0, 1.0)
        |    ) / 3.0, 6) AS q
        |  FROM documents
        |), t AS (SELECT quantile_cont(q, 0.25) AS thr FROM q)
        |SELECT doc_id FROM q, t WHERE q >= thr""") { (s, dir) =>
      graft.text.CorpusOps.calibratedQualityFilter(docs(s, dir),
        graft.text.TextFunctions.qualityScore(col("text")), keepRate = 0.75)
        .select(col("doc_id"))
    },

    // §2.57: C4-style URL/domain blocklist filter. URLs are synthesized
    // deterministically from (source, doc_id) — half the docs behind a
    // cdn. subdomain — so the gate exercises BOTH exact-host and
    // suffix-chain blocking (a list entry blocks its subdomains); the
    // oracle replays the same host-extraction regex in DuckDB (RE2 ∩
    // Java dialect) and spells the suffix rule as LIKE patterns.
    "t06_url_filter" -> oq(
      """WITH u AS (
        |  SELECT doc_id, source,
        |    'https://' || CASE WHEN doc_id % 2 = 0 THEN 'cdn.' ELSE '' END
        |      || source || '.example.com/docs/' || doc_id AS url
        |  FROM documents
        |), h AS (
        |  SELECT doc_id, source,
        |    lower(regexp_extract(
        |      regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
        |      '^(?:[^/@?#]*@)?([^/:?#]+)', 1)) AS domain
        |  FROM u
        |)
        |SELECT doc_id, source, domain FROM h
        |WHERE NOT (domain = 'src3.example.com' OR domain LIKE '%.src3.example.com'
        |        OR domain = 'src7.example.com' OR domain LIKE '%.src7.example.com')""") { (s, dir) =>
      import s.implicits._
      val d = docs(s, dir).withColumn("url",
        concat(lit("https://"),
          when(col("doc_id") % 2 === 0, lit("cdn.")).otherwise(lit("")),
          col("source"), lit(".example.com/docs/"), col("doc_id").cast("string")))
      val bl = Seq("src3.example.com", "src7.example.com").toDF("domain")
      graft.text.CorpusOps.filterByDomainBlocklist(d, "doc_id", "url", bl)
        .select(col("doc_id"), col("source"),
          graft.text.CorpusOps.urlHost(col("url")).as("domain"))
    },

    // §2.57b: URL canonicalization + canonical-URL dedup — both sides
    // synthesize the same deterministic messy URLs (the t06/t03
    // convention): mixed case, default ports, userinfo, tracker params,
    // unsorted query params, fragments, duplicate + trailing slashes,
    // scheme-less forms. Groups 0↔1 and 3↔4 canonicalize identically
    // (min doc_id survives, n_dups = 2); groups 2 and 5 stay unique.
    // The oracle replays the EXACT normalization rule in DuckDB, so the
    // canonical key is proven engine-portable.
    "t18_url_canonical" -> oq(
      s"""WITH u AS (
         |  SELECT doc_id,
         |    CASE CAST(doc_id % 6 AS INT)
         |      WHEN 0 THEN 'HTTPS://WWW.Example.COM:443//docs//' || (doc_id // 6) || '/?utm_source=rss&b=2&a=1#sec2'
         |      WHEN 1 THEN 'https://www.example.com/docs/' || (doc_id // 6) || '?a=1&b=2'
         |      WHEN 2 THEN 'http://user:pw@' || source || '.example.com:8080/p/' || doc_id || '?fbclid=abc'
         |      WHEN 3 THEN 'example.com/p/' || (doc_id // 6)
         |      WHEN 4 THEN 'http://example.com:80/p/' || (doc_id // 6) || '/'
         |      ELSE 'https://' || source || '.example.com/q?id=' || doc_id || '&utm_medium=em&igshid=9'
         |    END AS url
         |  FROM documents
         |), c AS (
         |  SELECT doc_id,
         |    CASE WHEN regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) = '' THEN 'http'
         |         ELSE lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) END AS scheme,
         |    regexp_replace(regexp_replace(url, '^(?:[A-Za-z][A-Za-z0-9+.-]*:)?//', ''), '#.*$$', '') AS nofrag
         |  FROM u
         |), p AS (
         |  SELECT doc_id, scheme,
         |    regexp_extract(nofrag, '^(?:[^/@?#]*@)?([^/?#]*)', 1) AS hostport,
         |    regexp_extract(nofrag, '^(?:[^/@?#]*@)?[^/?#]*([^#]*)', 1) AS pathq
         |  FROM c
         |), n AS (
         |  SELECT doc_id, scheme, hostport,
         |    lower(regexp_extract(hostport, '^([^:]*)', 1)) AS host,
         |    CASE WHEN regexp_extract(hostport, ':([0-9]+)$$', 1) = ''
         |           OR (scheme = 'http' AND regexp_extract(hostport, ':([0-9]+)$$', 1) = '80')
         |           OR (scheme = 'https' AND regexp_extract(hostport, ':([0-9]+)$$', 1) = '443')
         |         THEN '' ELSE ':' || regexp_extract(hostport, ':([0-9]+)$$', 1) END AS portpart,
         |    CASE WHEN regexp_replace(regexp_replace(regexp_extract(pathq, '^([^?]*)', 1), '/{2,}', '/', 'g'), '/+$$', '') = ''
         |         THEN '/'
         |         ELSE regexp_replace(regexp_replace(regexp_extract(pathq, '^([^?]*)', 1), '/{2,}', '/', 'g'), '/+$$', '') END AS path,
         |    coalesce(array_to_string(list_sort(list_filter(string_split(regexp_extract(pathq, '\\?(.*)$$', 1), '&'),
         |      x -> x <> ''
         |        AND NOT list_contains(['fbclid','gclid','msclkid','mc_eid','igshid'], regexp_extract(x, '^([^=]*)', 1))
         |        AND NOT starts_with(regexp_extract(x, '^([^=]*)', 1), 'utm_'))), '&'), '') AS q
         |  FROM p
         |), canon AS (
         |  SELECT doc_id,
         |    CASE WHEN host = '' OR contains(hostport, '[') THEN NULL
         |         ELSE scheme || '://' || host || portpart || path ||
         |              CASE WHEN q = '' THEN '' ELSE '?' || q END END AS canonical_url
         |  FROM n
         |)
         |SELECT min(doc_id) AS doc_id, canonical_url, count(*) AS n_dups
         |FROM canon GROUP BY canonical_url""") { (s, dir) =>
      val n6 = floor(col("doc_id") / 6).cast("long").cast("string")
      val url = when(col("doc_id") % 6 === 0,
          concat(lit("HTTPS://WWW.Example.COM:443//docs//"), n6,
            lit("/?utm_source=rss&b=2&a=1#sec2")))
        .when(col("doc_id") % 6 === 1,
          concat(lit("https://www.example.com/docs/"), n6, lit("?a=1&b=2")))
        .when(col("doc_id") % 6 === 2,
          concat(lit("http://user:pw@"), col("source"), lit(".example.com:8080/p/"),
            col("doc_id").cast("string"), lit("?fbclid=abc")))
        .when(col("doc_id") % 6 === 3,
          concat(lit("example.com/p/"), n6))
        .when(col("doc_id") % 6 === 4,
          concat(lit("http://example.com:80/p/"), n6, lit("/")))
        .otherwise(
          concat(lit("https://"), col("source"), lit(".example.com/q?id="),
            col("doc_id").cast("string"), lit("&utm_medium=em&igshid=9")))
      graft.text.CorpusOps.dedupByCanonicalUrl(
          docs(s, dir).withColumn("url", url), "doc_id", "url")
        .select(col("doc_id"), col("canonical_url"), col("n_dups"))
    },

    // §2.51: PII redaction — emails/IPv4/long digit runs replaced as a
    // pure column expression over the RE2∩Java regex intersection. The
    // corpus itself has no digits, so BOTH sides append deterministic
    // id-derived fake PII first; the per-document md5 of the redacted
    // text then proves the exact replacement behaviour matches DuckDB's.
    "t03_redact" -> oq({
      val in = "text || ' contact: user' || CAST(doc_id AS VARCHAR) ||" +
        " '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||" +
        " '.1 acct ' || CAST(doc_id % 1000 + 123456789 AS VARCHAR)"
      val c = graft.text.CorpusOps
      s"""SELECT doc_id,
         |md5(regexp_replace(regexp_replace(regexp_replace($in,
         |  '${c.EmailRe}', '[EMAIL]', 'g'),
         |  '${c.Ipv4Re}', '[IP]', 'g'),
         |  '${c.LongNumRe}', '[NUM]', 'g')) AS red_fp
         |FROM documents"""
    }) { (s, dir) =>
      val in = concat(
        col("text"), lit(" contact: user"), col("doc_id").cast("string"),
        lit("@example.com from 10.0."), (col("doc_id") % 256).cast("string"),
        lit(".1 acct "), (col("doc_id") % 1000 + 123456789L).cast("string"))
      docsWide(s, dir).select(col("doc_id"),
        md5(graft.text.CorpusOps.redactPii(in)).as("red_fp"))
    },

    // §2.25b (cont): the set-label filter algebra through the SQL backend
    // (bacon's SetLabel to_sql). s03 = membership ops (hasany + hasnone),
    // s04 = the universally-quantified subsetof; both compiled per-dialect
    // because the set-label constructor (split) has no shared spelling.
    "s03_sql_setops" -> oq(s03Sql(SqlCompiler.Dialect.DuckDb)) { (s, dir) =>
      part(s, dir).createOrReplaceTempView("part")
      s.sql(s03Sql(SqlCompiler.Dialect.SparkSql))
    },
    "s04_sql_forall" -> oq(s04Sql(SqlCompiler.Dialect.DuckDb)) { (s, dir) =>
      part(s, dir).createOrReplaceTempView("part")
      s.sql(s04Sql(SqlCompiler.Dialect.SparkSql))
    },

    // §2.25b (cont): the two formerly-declared-non-compilable shapes.
    // s06 = pivot via FILTER-ed aggregates (fixed pivotValues — never a
    // distinct-values job); s07 = set axis via a row-multiplying unnest
    // subquery. Hash-identical Spark/DuckDB results from the per-dialect
    // renderings prove both carry Slicer semantics (SqlCompilerSpec
    // additionally proves parity against Slicer itself).
    "s06_sql_pivot" -> oq(s06Sql(SqlCompiler.Dialect.DuckDb)) { (s, dir) =>
      ord(s, dir).createOrReplaceTempView("orders")
      s.sql(s06Sql(SqlCompiler.Dialect.SparkSql))
    },
    "s07_sql_set_axis" -> oq(s07Sql(SqlCompiler.Dialect.DuckDb)) { (s, dir) =>
      part(s, dir).createOrReplaceTempView("part")
      s.sql(s07Sql(SqlCompiler.Dialect.SparkSql))
    },

    // §2.47: multimodal image pipeline, REAL pixel path — complete encoded
    // PNG/GIF/BMP/JPEG payloads, full javax.imageio decode in mapPartitions
    // batches. `dims_agree` counts rows whose raster dims independently
    // confirm the byte-parsed header dims; luma stats come from the actual
    // pixels (rows-only: payload synthesis is engine-side)
    "m01_multimodal" -> nq { (s, dir) =>
      import graft.multimodal.Multimodal._
      val media = withFakeMediaPixels(docsWide(s, dir), "doc_id", "image")
      decodeImage(media)
        .groupBy("format")
        .agg(count(lit(1)).as("n"), avg(col("width")).as("avg_w"),
          sum(when(col("px_width") === col("width") &&
            col("px_height") === col("height"), 1L).otherwise(0L)).as("dims_agree"),
          round(avg(col("mean_luma")), 2).as("avg_luma"))
    },

    // §2.47 (cont): REAL thumbnail generation — decode → bilinear
    // aspect-preserving downscale → PNG re-encode, then a second decode of
    // the thumbnails proves the output bytes are genuine images
    "m02_resize" -> nq { (s, dir) =>
      import graft.multimodal.Multimodal._
      val media = withFakeMediaPixels(docsWide(s, dir), "doc_id", "image")
      decodeImage(resize(media, 16))
        .groupBy("format")
        .agg(count(lit(1)).as("n"), max(col("px_width")).as("max_w"),
          max(col("px_height")).as("max_h"),
          sum(when(col("px_width") === col("width") &&
            col("px_height") === col("height"), 1L).otherwise(0L)).as("dims_agree"))
    },

    // §2.47 (cont): REAL video frame extraction — multi-frame animated-GIF
    // payloads, JDK GIF reader pulls evenly-spaced frames, each re-encoded
    // as a standalone PNG (a training pipeline's frame-sampling stage)
    "v01_frames" -> nq { (s, dir) =>
      import graft.multimodal.Multimodal._
      val media = withFakeMediaPixels(docsWide(s, dir), "doc_id", "video")
      sampleFrames(media, 3)
        .groupBy("frame_idx")
        .agg(count(lit(1)).as("n"), avg(col("frame_width")).as("avg_w"),
          avg(col("n_frames")).as("avg_total_frames"))
    },

    // §2.47e: scene-change detection — consecutive sampled frames'
    // perceptual-hash distance per video, cuts above the threshold
    // (rows-only: MultimodalSpec pins exact boundaries on a
    // constructed multi-scene clip); all work stays in-partition.
    "v02_scene_changes" -> nq { (s, dir) =>
      import graft.multimodal.Multimodal._
      val media = withFakeMediaPixels(docsWide(s, dir), "doc_id", "video")
      sceneChanges(media, n = 4)
        .groupBy("is_cut")
        .agg(count(lit(1)).as("n_pairs"), avg(col("hamming")).as("avg_hamming"))
    },

    // §2.47b: audio modality end-to-end, REAL PCM — WAV payloads carry
    // actual sine samples; header parse gives rate/channels/duration and
    // `rms` is computed from the sample bytes (≈ amplitude/√2)
    "a01_audio_meta" -> nq { (s, dir) =>
      import graft.multimodal.Multimodal._
      val media = withFakeMediaPixels(docsWide(s, dir), "doc_id", "audio")
      decodeAudioMeta(media)
        .groupBy("sample_rate")
        .agg(count(lit(1)).as("n"), round(avg(col("seconds")), 4).as("avg_secs"),
          max(col("channels")).as("max_channels"), round(avg(col("rms")), 4).as("avg_rms"))
    },

    // §2: LabeledAcc — aggregate only when a second label is consistent
    // across the group (bacon/accumulators.py:299)
    "q30_labeled_acc" -> oq(
      """SELECT o_custkey,
        |CASE WHEN count(DISTINCT o_orderstatus) = 1
        |      AND count(o_orderstatus) = count(*)
        |     THEN round(sum(o_totalprice),2) END AS labeled_total,
        |count(*) AS n_orders
        |FROM orders GROUP BY o_custkey""") { (s, dir) =>
      val q = CubeQuery().addAxis("o_custkey").addValue("labeled_total").addValue("n_orders")
      Slicer.slice(ord(s, dir), Tpch.ordersCube, q)
        .select(col("o_custkey"), round(col("labeled_total"), 2).as("labeled_total"), col("n_orders"))
    },

    // §2: HyperLogLog++ distinct estimate — the 100 TB-friendly distinct
    // (rows-only: HLL estimates differ across engines by design)
    "q31_approx_distinct" -> nq { (s, dir) =>
      val q = CubeQuery().addAxis("o_orderpriority").addValue("approx_cust")
      Slicer.slice(ord(s, dir), Tpch.ordersCube, q)
    },

    // §2: salted two-phase aggregation for skewed keys — must equal the
    // plain aggregation (oracle = direct GROUP BY)
    "q32_salted_agg" -> oq(
      """SELECT l_returnflag, round(sum(l_quantity),2) AS sum_qty, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""") { (s, dir) =>
      graft.ops.Skew.saltedAgg(li(s, dir), Seq("l_returnflag"), salts = 16,
          Seq(("sum_qty", col("l_quantity"), Agg.Sum), ("n_rows", lit(1), Agg.Count)))
        .select(col("l_returnflag"), round(col("sum_qty"), 2).as("sum_qty"), col("n_rows"))
    },

    // §2: exact interpolated percentiles (distribution measures)
    "q33_percentile" -> oq(
      """SELECT event_type,
        |round(quantile_cont(value, 0.5), 4) AS p50,
        |round(quantile_cont(value, 0.95), 4) AS p95
        |FROM events GROUP BY event_type""") { (s, dir) =>
      ev(s, dir).groupBy("event_type")
        .agg(round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.95)"), 4).as("p95"))
    },

    // §2: semi-structured props column (JSON extraction in the scan).
    // Outer CAST: DuckDB sum(BIGINT) yields HUGEINT, which the driver's
    // pandas compare renders as float64 and hash-mismatches Spark's int64.
    "q34_json_props" -> oq(
      """SELECT event_type,
        |CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |count(*) AS n
        |FROM events GROUP BY event_type""") { (s, dir) =>
      ev(s, dir).groupBy("event_type")
        .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
          count(lit(1)).as("n"))
    },

    // §2: approx_percentile — the 100 TB path for q33's exact percentiles
    // (mergeable sketch, partial-aggregatable; rows-only: DuckDB's
    // approx_quantile uses a different sketch so values differ by design).
    // The spec asserts approx ≈ exact within the accuracy bound.
    "q36_approx_percentile" -> nq { (s, dir) =>
      ev(s, dir).groupBy("event_type")
        .agg(expr("approx_percentile(value, 0.5, 10000)").as("p50_approx"),
          expr("approx_percentile(value, 0.95, 10000)").as("p95_approx"),
          count(lit(1)).as("n"))
    },

    // §2.55: fixed-width histogram (width_bucket semantics: bucket 0
    // underflow, 1..n interior over [lo, hi), n+1 overflow; empty buckets
    // present with 0). One scan + ≤ n+2 groups; the bucket spine is a
    // broadcast-sized range.
    "q37_histogram" -> oq(
      """WITH b AS (
        |  SELECT CASE WHEN o_totalprice < 0 THEN 0
        |              WHEN o_totalprice >= 400000 THEN 11
        |              ELSE CAST(floor(o_totalprice / 40000e0) AS BIGINT) + 1 END AS bucket
        |  FROM orders WHERE o_totalprice IS NOT NULL
        |), c AS (SELECT bucket, count(*) AS n_rows FROM b GROUP BY bucket)
        |SELECT r.bucket,
        |  CASE WHEN r.bucket BETWEEN 1 AND 10 THEN round((r.bucket-1)*40000e0, 6) END AS lo_edge,
        |  CASE WHEN r.bucket BETWEEN 1 AND 10 THEN round(r.bucket*40000e0, 6) END AS hi_edge,
        |  coalesce(c.n_rows, 0) AS n_rows
        |FROM (SELECT unnest(range(0, 12)) AS bucket) r LEFT JOIN c USING (bucket)""") { (s, dir) =>
      graft.ops.Profile.histogram(ord(s, dir), "o_totalprice", lo = 0.0, hi = 400000.0, n = 10)
    },

    // §2.58: backward as-of join — each click matched to the user's
    // latest purchase at-or-before it. Oracle is DuckDB's NATIVE ASOF
    // LEFT JOIN; the Spark side is the union-window form (one shuffle on
    // the key, no join node, nothing quadratic). The right side is
    // pre-deduped per (user, ts) so equal-ts ties cannot differ between
    // engines.
    "q39_asof_join" -> oq(
      """WITH r AS (
        |  SELECT user_id, ts, max(value) AS pvalue
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        |), l AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        |)
        |SELECT l.event_id, l.user_id, l.ts,
        |  r.ts AS asof_ts, round(r.pvalue, 2) AS asof_pvalue
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""") { (s, dir) =>
      val e = ev(s, dir)
      val l = e.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val r = e.where(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max(col("value")).as("pvalue"))
        .select(col("user_id"), col("ts").as("pts"), col("pvalue"))
      graft.ops.Relational.asOfJoin(l, r, Seq("user_id"), "ts", "pts", Seq("pvalue"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_pts").as("asof_ts"), round(col("asof_pvalue"), 2).as("asof_pvalue"))
    },

    // §2.34b: hopping (sliding) window aggregation — each event lands in
    // width/slide = 2 overlapping epoch-aligned windows; the oracle
    // replays the window multiplication with time_bucket + an explicit
    // 2-element hop unnest.
    "q50_hopping_window" -> oq(
      """SELECT CAST(time_bucket(INTERVAL '1 hour', ts) - to_hours(i) AS TIMESTAMP)
        |    AS wstart,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sv
        |FROM events, (SELECT unnest([0, 1]) AS i)
        |GROUP BY 1, 2""") { (s, dir) =>
      ev(s, dir)
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
        .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("sv"))
    },

    // §2.65: ordered-step funnel — earliest view → click → purchase
    // chain per user in ONE shuffle + per-key fold (no join chain, no
    // window). The oracle is the per-step conditional-min join chain.
    "q44_funnel" -> oq(
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY 1
        |), s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY 1
        |)
        |SELECT s1.user_id, s1.t1 AS view_ts, s2.t2 AS click_ts, s3.t3 AS purchase_ts
        |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        |        LEFT JOIN s3 ON s1.user_id = s3.user_id""") { (s, dir) =>
      graft.ops.Events.funnel(ev(s, dir), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"))
        .where(col("t0").isNotNull) // oracle's chain starts at users who viewed
        .select(col("user_id"), col("t0").as("view_ts"),
          col("t1").as("click_ts"), col("t2").as("purchase_ts"))
    },

    // §2.65b: cohort retention — users bucketed by first-seen week,
    // counted per week offset. Two aggregations, no join (the per-key
    // agg carries min + distinct periods); the oracle is the textbook
    // join-back formulation.
    "q45_retention" -> oq(
      """WITH c AS (
        |  SELECT user_id, CAST(min(date_trunc('week', ts)) AS TIMESTAMP) AS cohort
        |  FROM events GROUP BY 1
        |), a AS (
        |  SELECT DISTINCT c.user_id, c.cohort,
        |    (CAST(date_trunc('week', e.ts) AS DATE) - CAST(c.cohort AS DATE)) // 7
        |      AS "offset"
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |)
        |SELECT cohort, "offset", count(*) AS n_active
        |FROM a GROUP BY 1, 2""") { (s, dir) =>
      graft.ops.Events.retention(ev(s, dir), "user_id", "ts", "week")
    },

    // §2.65c: time-decayed EWMA per user (τ = 1 h) — the sequential
    // num/den recursion folded in ts order on both engines (Spark
    // aggregate HOF ⟷ DuckDB list_reduce), timestamps truncated to µs
    // on BOTH sides so every Δt is the identical double.
    "q47_ewma" -> oq(
      """WITH z AS (
        |  SELECT user_id,
        |    list_transform(
        |      list(struct_pack(t := epoch_us(ts), v := value) ORDER BY ts, value),
        |      e -> struct_pack(t := e.t, n := e.v, d := 1e0)) AS l
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1
        |), r AS (
        |  SELECT user_id, list_reduce(l, (a, b) -> struct_pack(
        |    t := b.t,
        |    n := a.n * exp((a.t - b.t) / 3.6e9) + b.n,
        |    d := a.d * exp((a.t - b.t) / 3.6e9) + b.d)) AS s
        |  FROM z
        |)
        |SELECT user_id, round(s.n / s.d, 6) AS ewma FROM r""") { (s, dir) =>
      graft.ops.Events.timeDecayedMean(
        ev(s, dir).where(col("event_type") === "purchase"),
        "user_id", "ts", "value", tauSeconds = 3600.0)
    },

    // §2.62b: interval-overlap join — view-windows overlapping promo-
    // windows per user, both sides exploded to shared bins, each pair
    // emitted once via the first-shared-bin rule. Oracle: DuckDB's
    // native inequality join.
    "q43_interval_join" -> oq(
      """WITH l AS (
        |  SELECT event_id AS view_id, user_id, ts AS vstart,
        |    ts + to_minutes(CAST(floor(value) AS BIGINT) % 60) AS vend
        |  FROM events WHERE event_type = 'view'
        |), r AS (
        |  SELECT event_id AS promo_id, user_id, ts AS pstart,
        |    ts + to_minutes(CAST(floor(value) AS BIGINT) % 120) AS pend
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT l.view_id, r.promo_id
        |FROM l JOIN r ON l.user_id = r.user_id
        |  AND l.vstart <= r.pend AND r.pstart <= l.vend""") { (s, dir) =>
      val e = ev(s, dir)
      def win(kind: String, idAs: String, modMin: Int) =
        e.where(col("event_type") === kind)
          .select(col("event_id").as(idAs), col("user_id"),
            unix_micros(col("ts")).as("s0"),
            (unix_micros(col("ts")) +
              (floor(col("value")).cast("long") % modMin) * 60000000L).as("e0"))
      val l = win("view", "view_id", 60)
        .withColumnRenamed("s0", "vs").withColumnRenamed("e0", "ve")
      val r = win("purchase", "promo_id", 120)
        .withColumnRenamed("s0", "ps").withColumnRenamed("e0", "pe")
      graft.ops.Relational.intervalJoin(l, r, Seq("user_id"), "vs", "ve", "ps", "pe",
          binWidth = 3600000000L)
        .select(col("view_id"), col("r_promo_id").as("promo_id"))
    },

    // §2.58 (forward direction): next-purchase-after-click lookup —
    // the same union-window plan scanned in descending ts. Oracle:
    // DuckDB's native ASOF with the inequality flipped.
    "q42_asof_forward" -> oq(
      """WITH r AS (
        |  SELECT user_id, ts, max(value) AS pvalue
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        |), l AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        |)
        |SELECT l.event_id, l.user_id, l.ts,
        |  r.ts AS asof_ts, round(r.pvalue, 2) AS asof_pvalue
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts""") { (s, dir) =>
      val e = ev(s, dir)
      val l = e.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val r = e.where(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max(col("value")).as("pvalue"))
        .select(col("user_id"), col("ts").as("pts"), col("pvalue"))
      graft.ops.Relational.asOfJoin(l, r, Seq("user_id"), "ts", "pts", Seq("pvalue"),
          direction = "forward")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_pts").as("asof_ts"), round(col("asof_pvalue"), 2).as("asof_pvalue"))
    },

    // §2.58 (nearest direction): closest purchase to each click in
    // either time direction, equal distance resolving backward — both
    // running windows over ONE shuffle. The oracle ranks every
    // (click, purchase) pair by |Δts| with a backward-preferring tie.
    "q46_asof_nearest" -> oq(
      """WITH r AS (
        |  SELECT user_id, ts, max(value) AS pvalue
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        |), l AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT l.event_id, r.ts AS rts, r.pvalue,
        |    row_number() OVER (PARTITION BY l.event_id
        |      ORDER BY abs(epoch_ns(l.ts) - epoch_ns(r.ts)),
        |               CASE WHEN r.ts <= l.ts THEN 0 ELSE 1 END) AS rk
        |  FROM l JOIN r ON l.user_id = r.user_id
        |)
        |SELECT l.event_id, l.user_id, l.ts,
        |  p.rts AS asof_ts, round(p.pvalue, 2) AS asof_pvalue
        |FROM l LEFT JOIN (SELECT * FROM p WHERE rk = 1) p
        |  ON l.event_id = p.event_id""") { (s, dir) =>
      val e = ev(s, dir)
      val l = e.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val r = e.where(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max(col("value")).as("pvalue"))
        .select(col("user_id"), col("ts").as("pts"), col("pvalue"))
      graft.ops.Relational.asOfJoin(l, r, Seq("user_id"), "ts", "pts", Seq("pvalue"),
          direction = "nearest")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_pts").as("asof_ts"), round(col("asof_pvalue"), 2).as("asof_pvalue"))
    },

    // §2.59: Z-order (Morton) clustering value — the multi-dim layout
    // key behind writeZOrdered. Pure 64-bit bit arithmetic; the oracle
    // replays the IDENTICAL expression text (Layout.zvalueSql) in DuckDB.
    "q40_zorder" -> oq(
      s"""SELECT l_orderkey, l_linenumber,
         |  ${graft.ops.Layout.zvalueSql(12, Seq("l_partkey % 4096", "l_suppkey % 4096"))} AS z
         |FROM lineitem""") { (s, dir) =>
      li(s, dir).select(col("l_orderkey"), col("l_linenumber"),
        graft.ops.Layout.zvalue(12,
          col("l_partkey") % 4096, col("l_suppkey") % 4096).as("z"))
    },

    // §2.62: range (interval) join — clicks falling inside purchase-
    // derived promo windows per user. Bin-bucketed so it plans as an
    // equi-join on (user_id, hour-bin) — never a BNLJ/cartesian. The
    // oracle is the plain inequality join DuckDB runs natively (IEJoin).
    "q41_range_join" -> oq(
      """WITH l AS (
        |  SELECT event_id AS click_id, user_id, ts
        |  FROM events WHERE event_type = 'click'
        |), r AS (
        |  SELECT event_id AS promo_id, user_id, ts AS pstart,
        |    ts + to_minutes(CAST(floor(value) AS BIGINT) % 120) AS pend
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT l.click_id, r.promo_id
        |FROM l JOIN r ON l.user_id = r.user_id
        |  AND l.ts >= r.pstart AND l.ts <= r.pend""") { (s, dir) =>
      val e = ev(s, dir)
      val l = e.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          unix_micros(col("ts")).as("p"))
      val r = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("promo_id"), col("user_id"),
          unix_micros(col("ts")).as("ps"),
          (unix_micros(col("ts")) +
            (floor(col("value")).cast("long") % 120L) * 60000000L).as("pe"))
      graft.ops.Relational.rangeJoin(l, r, Seq("user_id"), "p", "ps", "pe",
          binWidth = 3600000000L) // 1-hour bins ≈ the max window width
        .select(col("click_id"), col("r_promo_id").as("promo_id"))
    },

    // §2.56b: robust per-group outliers — modified z-score via
    // median/MAD (exact interpolated percentiles, the d22 convention).
    // The synthetic totalprice has no heavy tail, so the gate cuts at
    // 1.2 instead of the Iglewicz–Hoaglin 3.5 default to be
    // non-vacuous; both sides compare the 6dp-ROUNDED score.
    "q48_outliers" -> oq(
      """WITH m AS (
        |  SELECT o_orderpriority AS g, quantile_cont(o_totalprice, 0.5) AS med
        |  FROM orders GROUP BY 1
        |), d AS (
        |  SELECT o.o_orderkey, o.o_orderpriority AS g, o.o_totalprice, m.med
        |  FROM orders o JOIN m ON o.o_orderpriority = m.g
        |), s AS (
        |  SELECT g, quantile_cont(abs(o_totalprice - med), 0.5) AS mad
        |  FROM d GROUP BY 1
        |)
        |SELECT d.o_orderkey,
        |  round(0.6745 * abs(d.o_totalprice - d.med) / s.mad, 6) AS mz
        |FROM d JOIN s ON d.g = s.g
        |WHERE s.mad > 0
        |  AND round(0.6745 * abs(d.o_totalprice - d.med) / s.mad, 6) > 1.2""") { (s, dir) =>
      graft.ops.Profile.madOutliers(
        ord(s, dir).select("o_orderkey", "o_orderpriority", "o_totalprice"),
        "o_orderpriority", "o_totalprice", threshold = 1.2)
        .select(col("o_orderkey"), col("mz"))
    },

    // §2.56d: pairwise correlation matrix in one pass — explicit moment
    // arithmetic (not corr()), so the oracle replays the identical
    // formula; summation-order FP noise sits far below the 6dp round.
    "q52_corr_matrix" -> oq(
      Seq(("o_totalprice", "o_custkey"), ("o_totalprice", "o_orderkey"),
        ("o_custkey", "o_orderkey")).map { case (a, b) =>
        s"""SELECT '$a' AS c1, '$b' AS c2, CASE
           |  WHEN count(*) * sum($a * $a) - sum($a) * sum($a) > 0
           |   AND count(*) * sum($b * $b) - sum($b) * sum($b) > 0
           |  THEN round((count(*) * sum($a * $b) - sum($a) * sum($b)) /
           |    sqrt((count(*) * sum($a * $a) - sum($a) * sum($a)) *
           |         (count(*) * sum($b * $b) - sum($b) * sum($b))), 6)
           |END AS corr
           |FROM (SELECT CAST($a AS DOUBLE) AS $a, CAST($b AS DOUBLE) AS $b
           |      FROM orders WHERE $a IS NOT NULL AND $b IS NOT NULL)""".stripMargin
      }.mkString("\n UNION ALL \n")) { (s, dir) =>
      graft.ops.Profile.corrMatrix(ord(s, dir),
        Seq("o_totalprice", "o_custkey", "o_orderkey"))
    },

    // §2.56e: mutual information between two categoricals — one pass
    // builds the joint table, marginals re-aggregate the joint; the
    // oracle replays the identical double arithmetic.
    "q53_mutual_info" -> oq(
      """WITH j AS (
        |  SELECT o_orderstatus AS a, o_orderpriority AS b,
        |    CAST(count(*) AS DOUBLE) AS c
        |  FROM orders
        |  WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
        |  GROUP BY 1, 2
        |), ma AS (SELECT a, sum(c) AS ca FROM j GROUP BY 1),
        |mb AS (SELECT b, sum(c) AS cb FROM j GROUP BY 1),
        |n AS (SELECT sum(c) AS n FROM j)
        |SELECT round(sum((c / n.n) * ln((c * n.n) / (ca * cb))), 6) AS mi
        |FROM j JOIN ma USING (a) JOIN mb USING (b), n""") { (s, dir) =>
      graft.ops.Profile.mutualInformation(ord(s, dir), "o_orderstatus", "o_orderpriority")
    },

    // §2.55b: equi-depth histogram — quartile buckets over totalprice;
    // the oracle replays the boundary percentiles and the same
    // 1 + #{interior boundaries ≤ x} counting rule.
    "q51_equidepth" -> oq(
      """WITH b AS (
        |  SELECT quantile_cont(o_totalprice, [0.0, 0.25, 0.5, 0.75, 1.0]) AS q
        |  FROM orders
        |), a AS (
        |  SELECT CAST(1 + len(list_filter(b.q[2:4], x -> o.o_totalprice >= x))
        |    AS BIGINT) AS bucket
        |  FROM orders o, b WHERE o.o_totalprice IS NOT NULL
        |)
        |SELECT a.bucket, round(b.q[CAST(a.bucket AS INT)], 6) AS lo,
        |  round(b.q[CAST(a.bucket AS INT) + 1], 6) AS hi,
        |  count(*) AS n_rows
        |FROM a, b GROUP BY 1, 2, 3""") { (s, dir) =>
      graft.ops.Profile.equiDepthHistogram(ord(s, dir), "o_totalprice", n = 4)
    },

    // §2.56c: winsorization — clamp into the per-group exact [5%, 95%]
    // percentile band; oracle replays the identical quantile_cont band.
    "q49_winsorize" -> oq(
      """WITH b AS (
        |  SELECT o_orderpriority AS g,
        |    quantile_cont(o_totalprice, 0.05) AS lo,
        |    quantile_cont(o_totalprice, 0.95) AS hi
        |  FROM orders GROUP BY 1
        |)
        |SELECT o.o_orderkey,
        |  round(least(greatest(o.o_totalprice, b.lo), b.hi), 6) AS o_totalprice_w
        |FROM orders o JOIN b ON o.o_orderpriority = b.g""") { (s, dir) =>
      graft.ops.Profile.winsorize(
        ord(s, dir).select("o_orderkey", "o_orderpriority", "o_totalprice"),
        "o_orderpriority", "o_totalprice", pLo = 0.05, pHi = 0.95)
        .select(col("o_orderkey"), col("o_totalprice_w"))
    },

    // §2.56: per-column numeric profile — one aggregation pass for every
    // column, stack-unpivoted over the single aggregate row.
    "q38_profile" -> oq(
      Seq("o_totalprice", "o_custkey", "o_orderkey").map { c =>
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |count(*) - count($c) AS n_null,
           |count(DISTINCT CAST($c AS DOUBLE)) AS n_distinct,
           |min(CAST($c AS DOUBLE)) AS min, max(CAST($c AS DOUBLE)) AS max,
           |round(avg(CAST($c AS DOUBLE)), 6) AS mean,
           |round(stddev_samp(CAST($c AS DOUBLE)), 6) AS std
           |FROM orders""".stripMargin
      }.mkString("\n", "\nUNION ALL\n", "")) { (s, dir) =>
      graft.ops.Profile.summary(ord(s, dir),
        Seq("o_totalprice", "o_custkey", "o_orderkey"))
    },

    // §2: running totals over the month series (window over ordered axis)
    "q35_running_total" -> oq(
      """SELECT m AS o_orderdate_month, n_orders,
        |CAST(sum(n_orders) OVER (ORDER BY m) AS BIGINT) AS cum_orders
        |FROM (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
        |             count(*) AS n_orders
        |      FROM orders GROUP BY 1)""") { (s, dir) =>
      val q = CubeQuery().addAxis("o_orderdate_month").addValue("n_orders")
      val monthly = Slicer.slice(ord(s, dir), Tpch.ordersCube, q)
      // two-phase prefix sum bucketed by year: parallel per-year windows
      // + a tiny totals join, never an unpartitioned global window
      graft.ops.Events.runningTotal(monthly, "o_orderdate_month", "n_orders",
        bucket = year(col("o_orderdate_month")), outCol = "cum_orders")
        .select(col("o_orderdate_month"), col("n_orders"), col("cum_orders"))
    },

    // §2.73: C4-style heuristic cleaning (Raffel et al. 2020 §2.2). The
    // synthetic corpus has no newlines or punctuation, so the gate
    // builds line structure on BOTH sides (the d32 convention):
    // a universal "javascript…" line (must be line-dropped everywhere),
    // 4-token body lines with a terminal "." except every 5th line
    // (bare lines must fail the punctuation rule), and deterministic
    // doc-level "lorem ipsum" / "{" injections (those docs must fail
    // wholesale). Every rule fires on known rows; text round-trips
    // byte-identically through both engines.
    "t12_c4_filters" -> oq(
      """WITH tk AS (
        |  SELECT doc_id, list_filter(
        |    string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents
        |), built AS (
        |  SELECT doc_id, concat_ws(chr(10),
        |    'javascript required for this site.',
        |    array_to_string(list_transform(range(0, (len(tk) + 3) // 4),
        |      g -> array_to_string(list_slice(tk, g * 4 + 1, least(g * 4 + 4, len(tk))), ' ')
        |           || (CASE WHEN g % 5 = 4 THEN '' ELSE '.' END)), chr(10)),
        |    CASE WHEN doc_id % 41 = 0 THEN 'this page contains lorem ipsum text.' END,
        |    CASE WHEN doc_id % 43 = 0 THEN 'embedded code sample { }.' END) AS text
        |  FROM tk
        |), k AS (
        |  SELECT doc_id, text, list_filter(string_split(text, chr(10)), x ->
        |    regexp_matches(trim(x), '[.!?"]$')
        |    AND len(list_filter(string_split_regex(trim(x), '\s+'), w -> len(w) > 0)) >= 3
        |    AND NOT contains(lower(x), 'javascript')) AS kept
        |  FROM built
        |), c AS (
        |  SELECT doc_id, text, kept,
        |    coalesce(array_to_string(kept, chr(10)), '') AS ct
        |  FROM k
        |)
        |SELECT doc_id, ct AS clean_text,
        |  CAST(len(kept) AS BIGINT) AS n_lines_kept,
        |  CAST(len(regexp_replace(ct, '[^.!?]', '', 'g')) AS BIGINT) AS n_sentences,
        |  (len(regexp_replace(ct, '[^.!?]', '', 'g')) >= 5
        |   AND NOT contains(lower(text), 'lorem ipsum')
        |   AND NOT contains(lower(text), '{')) AS keep
        |FROM c""") { (s, dir) =>
      import graft.text.TextFunctions
      val tk = TextFunctions.wsTokens(trim(col("text")))
      val n = size(tk)
      val nb = floor((n + lit(3)) / lit(4)).cast("int")
      val body = transform(sequence(lit(0), nb - 1),
        g => concat(array_join(slice(tk, g * 4 + 1, lit(4)), " "),
          when(g % 5 === 4, lit("")).otherwise(lit("."))))
      val built = docsWide(s, dir).select(col("doc_id"),
        concat_ws("\n",
          lit("javascript required for this site."),
          array_join(body, "\n"),
          when(col("doc_id") % 41 === 0, lit("this page contains lorem ipsum text.")),
          when(col("doc_id") % 43 === 0, lit("embedded code sample { }."))).as("text"))
      graft.text.CorpusOps.c4Filters(built, "doc_id", "text")
    },

    // §2.74: quality-ranked canonical dedup — near-dup clusters (the
    // d15 recursive-CTE oracle) keep their HIGHEST-quality member (the
    // d09 score, 6dp-rounded so the ranking replays engine-exactly;
    // ties to min id), everything unclustered survives untouched.
    "d34_dedup_best_quality" -> oq(
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0) AS tk
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, greatest(len(tk)-2, 1)),
        |      i -> array_to_string(list_slice(tk, i, i+2), ' '))) AS sset
        |  FROM toks
        |), ex AS (
        |  SELECT doc_id, len(sset) AS sz, unnest(sset) AS s FROM sh
        |), pairs AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
        |  HAVING CAST(count(*) AS DOUBLE)/(a.sz + b.sz - count(*)) >= 0.5
        |), edges AS (
        |  SELECT id1 AS src, id2 AS dst FROM pairs
        |  UNION SELECT id2, id1 FROM pairs
        |), closure AS (
        |  SELECT src AS id, dst AS r FROM edges
        |  UNION
        |  SELECT c.id, e.dst FROM closure c JOIN edges e ON c.r = e.src
        |), cl AS (
        |  SELECT id, least(id, min(r)) AS cluster_id FROM closure GROUP BY id
        |), q AS (
        |  SELECT doc_id,
        |    round((
        |      least(CAST(len(list_filter(string_split_regex(trim(text),'\s+'), t -> len(t)>0)) AS DOUBLE)/100.0, 1.0)
        |      + (1.0 - least(CAST(len(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
        |                     / greatest(CAST(len(text) AS DOUBLE), 1.0) * 10.0, 1.0))
        |      + least(CAST(len(list_filter(string_split_regex(lower(trim(text)),'\s+'),
        |          t -> list_contains(['the','a','of','and','to','in','is','it','that','for'], t))) AS DOUBLE)
        |          / greatest(CAST(len(list_filter(string_split_regex(trim(text),'\s+'), t -> len(t)>0)) AS DOUBLE), 1.0) * 5.0, 1.0)
        |    ) / 3.0, 6) AS q
        |  FROM documents
        |), win AS (
        |  SELECT cluster_id, id AS keep_id FROM (
        |    SELECT cl.cluster_id, cl.id,
        |      row_number() OVER (PARTITION BY cl.cluster_id
        |                         ORDER BY q.q DESC, cl.id ASC) AS rn
        |    FROM cl JOIN q ON q.doc_id = cl.id)
        |  WHERE rn = 1
        |), lose AS (
        |  SELECT id FROM cl JOIN win USING (cluster_id) WHERE id <> keep_id
        |)
        |SELECT d.doc_id, d.lang, d.source FROM documents d
        |WHERE d.doc_id NOT IN (SELECT id FROM lose)""") { (s, dir) =>
      val d = docs(s, dir)
      graft.dedup.Dedup.keepBestInCluster(d, "doc_id",
          minhashPairsFromStore(s, dir),
          round(graft.text.TextFunctions.qualityScore(col("text")), 6))
        .select(col("doc_id"), col("lang"), col("source"))
    },

    // §2.70b: bigram-LM cross-entropy (the conditional step from d31's
    // unigram toward CCNet's KenLM — order-sensitive). Train on the
    // 'en' slice, score everything; closed-form add-1 arithmetic the
    // oracle replays exactly.
    "d36_bigram_ppl" -> oq(
      """WITH tk AS (
        |  SELECT doc_id, lang, list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents
        |), bg AS (
        |  SELECT doc_id, lang, tk[pos] AS a, tk[pos+1] AS b
        |  FROM (SELECT doc_id, lang, unnest(range(1, len(tk))) AS pos, tk
        |        FROM tk WHERE len(tk) >= 2)
        |), lm AS (
        |  SELECT a, b, count(*) AS c FROM bg WHERE lang = 'en' GROUP BY 1, 2
        |), ctx AS (
        |  SELECT a, CAST(sum(c) AS DOUBLE) AS ca FROM lm GROUP BY 1
        |), vv AS (
        |  SELECT CAST(count(DISTINCT b) AS DOUBLE) AS v FROM lm
        |), tf AS (
        |  SELECT doc_id, a, b, count(*) AS tf FROM bg GROUP BY 1, 2, 3
        |)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
        |  round(-sum(tf * ln((coalesce(c, 0) + 1.0) / (coalesce(ca, 0) + v)))
        |        / sum(tf), 6) AS xent
        |FROM tf LEFT JOIN lm USING (a, b) LEFT JOIN ctx USING (a) CROSS JOIN vv
        |GROUP BY doc_id""") { (s, dir) =>
      val d = docsWide(s, dir)
      graft.text.CorpusOps.bigramCrossEntropy(d, "doc_id", "text", lmBigram(s, dir))
        .select(col("doc_id"), col("n_bigrams"),
          round(col("cross_entropy"), 6).as("xent"))
    },

    // §2.70c: trigram perplexity — one context order closer to CCNet's
    // 5-gram KenLM, engine-exact closed form DuckDB replays. The Spark
    // side runs the HASHED-context form (the 100 TB shape: 8-byte
    // context keys through the joins); scores are identical to the
    // string-keyed form the oracle computes (collision-free at any
    // realistic vocab — CorpusOpsSpec pins parity).
    "d41_trigram_ppl" -> oq(
      """WITH tk AS (
        |  SELECT doc_id, lang, list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents
        |), tg AS (
        |  SELECT doc_id, lang, tk[pos] AS a, tk[pos+1] AS b, tk[pos+2] AS c
        |  FROM (SELECT doc_id, lang, unnest(range(1, len(tk) - 1)) AS pos, tk
        |        FROM tk WHERE len(tk) >= 3)
        |), lm AS (
        |  SELECT a, b, c, count(*) AS n FROM tg WHERE lang = 'en' GROUP BY 1, 2, 3
        |), ctx AS (
        |  SELECT a, b, CAST(sum(n) AS DOUBLE) AS cab FROM lm GROUP BY 1, 2
        |), vv AS (
        |  SELECT CAST(count(DISTINCT c) AS DOUBLE) AS v FROM lm
        |), tf AS (
        |  SELECT doc_id, a, b, c, count(*) AS tf FROM tg GROUP BY 1, 2, 3, 4
        |)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_trigrams,
        |  round(-sum(tf * ln((coalesce(n, 0) + 1.0) / (coalesce(cab, 0) + v)))
        |        / sum(tf), 6) AS xent
        |FROM tf LEFT JOIN lm USING (a, b, c) LEFT JOIN ctx USING (a, b) CROSS JOIN vv
        |GROUP BY doc_id""") { (s, dir) =>
      val d = docs(s, dir)
      graft.text.CorpusOps.trigramCrossEntropy(d, "doc_id", "text",
          lmTrigram(s, dir), hashContext = true)
        .select(col("doc_id"), col("n_trigrams"),
          round(col("cross_entropy"), 6).as("xent"))
    },

    // §2.70d: Stupid Backoff (Brants et al. 2007) — the distributed-LM
    // scoring ladder (trigram ratio, else 0.4x bigram ratio, else
    // 0.4^2 smoothed unigram), raw counts with no normalization pass;
    // the closest closed-form stand-in for CCNet's KenLM filter that
    // DuckDB can replay exactly.
    "d43_stupid_backoff" -> oq(
      """WITH tk AS (
        |  SELECT doc_id, lang, list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents
        |), tg AS (
        |  SELECT doc_id, lang, tk[pos] AS a, tk[pos+1] AS b, tk[pos+2] AS c
        |  FROM (SELECT doc_id, lang, unnest(range(1, len(tk) - 1)) AS pos, tk
        |        FROM tk WHERE len(tk) >= 3)
        |), uni AS (
        |  SELECT c, count(*) AS c1
        |  FROM (SELECT unnest(tk) AS c FROM tk WHERE lang = 'en') GROUP BY 1
        |), nv AS (
        |  SELECT CAST(sum(c1) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM uni
        |), bi AS (
        |  SELECT tk[pos] AS b, tk[pos+1] AS c, count(*) AS c2
        |  FROM (SELECT unnest(range(1, len(tk))) AS pos, tk
        |        FROM tk WHERE lang = 'en' AND len(tk) >= 2)
        |  GROUP BY 1, 2
        |), ctx1 AS (
        |  SELECT b, CAST(sum(c2) AS DOUBLE) AS cb FROM bi GROUP BY 1
        |), tri AS (
        |  SELECT a, b, c, count(*) AS c3 FROM tg WHERE lang = 'en' GROUP BY 1, 2, 3
        |), ctx2 AS (
        |  SELECT a, b, CAST(sum(c3) AS DOUBLE) AS cab FROM tri GROUP BY 1, 2
        |), tf AS (
        |  SELECT doc_id, a, b, c, count(*) AS tf FROM tg GROUP BY 1, 2, 3, 4
        |)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_scored,
        |  round(-sum(tf * ln(
        |    CASE WHEN coalesce(c3, 0) > 0 THEN c3 / cab
        |         WHEN coalesce(c2, 0) > 0 THEN 0.4 * c2 / cb
        |         ELSE 0.16 * (coalesce(c1, 0) + 0.5) / (n + 0.5 * v) END))
        |        / sum(tf), 6) AS score
        |FROM tf LEFT JOIN tri USING (a, b, c) LEFT JOIN ctx2 USING (a, b)
        |        LEFT JOIN bi USING (b, c) LEFT JOIN ctx1 USING (b)
        |        LEFT JOIN uni USING (c) CROSS JOIN nv
        |GROUP BY doc_id""") { (s, dir) =>
      val d = docsWide(s, dir)
      // the fixed trigram form, NOT the order-3 scoreN: measured at sf10
      // the generic grain (per-position ctx-key arrays) costs more than
      // its hashed joins save at this order (14.3 s vs 16.0 s) — the
      // hash win only dominates from order 5 (see d46)
      val sb = graft.text.CorpusOps.stupidBackoffScore(d, "doc_id", "text",
        lmUnigram(s, dir), lmBigram(s, dir), lmTrigram(s, dir))
      sb.select(col("doc_id"), col("n_scored"), round(col("score"), 6).as("score"))
    },

    // §2.70e: 5-GRAM Stupid Backoff — the full CCNet/KenLM context
    // order (d43 stops at trigrams), ladder c5→c4→c3→c2→smoothed
    // unigram with the paper's 0.4 rung per backoff. The oracle replays
    // the entire five-tier ladder in DuckDB on token-tuple keys (equal
    // iff graft's space-joined ctx strings are equal — whitespace
    // tokenization makes the join bijective), so the closed form is
    // proven engine-portable at every tier.
    "d46_stupid_backoff_5gram" -> oq(
      """WITH tk AS (
        |  SELECT doc_id, lang, list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents
        |), g5 AS (
        |  SELECT doc_id, lang, tk[pos] AS a, tk[pos+1] AS b, tk[pos+2] AS c,
        |         tk[pos+3] AS d, tk[pos+4] AS e
        |  FROM (SELECT doc_id, lang, unnest(range(1, len(tk) - 3)) AS pos, tk
        |        FROM tk WHERE len(tk) >= 5)
        |), uni AS (
        |  SELECT e, count(*) AS c1
        |  FROM (SELECT unnest(tk) AS e FROM tk WHERE lang = 'en') GROUP BY 1
        |), nv AS (
        |  SELECT CAST(sum(c1) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM uni
        |), bi AS (
        |  SELECT tk[pos] AS d, tk[pos+1] AS e, count(*) AS c2
        |  FROM (SELECT unnest(range(1, len(tk))) AS pos, tk
        |        FROM tk WHERE lang = 'en' AND len(tk) >= 2)
        |  GROUP BY 1, 2
        |), ctx1 AS (
        |  SELECT d, CAST(sum(c2) AS DOUBLE) AS t1 FROM bi GROUP BY 1
        |), tri AS (
        |  SELECT tk[pos] AS c, tk[pos+1] AS d, tk[pos+2] AS e, count(*) AS c3
        |  FROM (SELECT unnest(range(1, len(tk) - 1)) AS pos, tk
        |        FROM tk WHERE lang = 'en' AND len(tk) >= 3)
        |  GROUP BY 1, 2, 3
        |), ctx2 AS (
        |  SELECT c, d, CAST(sum(c3) AS DOUBLE) AS t2 FROM tri GROUP BY 1, 2
        |), quad AS (
        |  SELECT tk[pos] AS b, tk[pos+1] AS c, tk[pos+2] AS d, tk[pos+3] AS e,
        |         count(*) AS c4
        |  FROM (SELECT unnest(range(1, len(tk) - 2)) AS pos, tk
        |        FROM tk WHERE lang = 'en' AND len(tk) >= 4)
        |  GROUP BY 1, 2, 3, 4
        |), ctx3 AS (
        |  SELECT b, c, d, CAST(sum(c4) AS DOUBLE) AS t3 FROM quad GROUP BY 1, 2, 3
        |), penta AS (
        |  SELECT a, b, c, d, e, count(*) AS c5 FROM g5 WHERE lang = 'en'
        |  GROUP BY 1, 2, 3, 4, 5
        |), ctx4 AS (
        |  SELECT a, b, c, d, CAST(sum(c5) AS DOUBLE) AS t4 FROM penta GROUP BY 1, 2, 3, 4
        |), tf AS (
        |  SELECT doc_id, a, b, c, d, e, count(*) AS tf FROM g5 GROUP BY 1, 2, 3, 4, 5, 6
        |)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_scored,
        |  round(-sum(tf * ln(
        |    CASE WHEN coalesce(c5, 0) > 0 THEN c5 / t4
        |         WHEN coalesce(c4, 0) > 0 THEN 0.4 * c4 / t3
        |         WHEN coalesce(c3, 0) > 0 THEN 0.16 * c3 / t2
        |         WHEN coalesce(c2, 0) > 0 THEN 0.064 * c2 / t1
        |         ELSE 0.0256 * (coalesce(c1, 0) + 0.5) / (n + 0.5 * v) END))
        |        / sum(tf), 6) + 0.0 AS score
        |FROM tf LEFT JOIN penta USING (a, b, c, d, e) LEFT JOIN ctx4 USING (a, b, c, d)
        |        LEFT JOIN quad USING (b, c, d, e) LEFT JOIN ctx3 USING (b, c, d)
        |        LEFT JOIN tri USING (c, d, e) LEFT JOIN ctx2 USING (c, d)
        |        LEFT JOIN bi USING (d, e) LEFT JOIN ctx1 USING (d)
        |        LEFT JOIN uni USING (e) CROSS JOIN nv
        |GROUP BY doc_id""") { (s, dir) =>
      val d = docsWide(s, dir)
      // the whole 1..5 ladder from the per-JVM materialized store
      // (lmTier) — the tier reads are partition-pruned parquet scans,
      // never a per-invocation retrain; hashContext packs every tier's
      // ctx (up to 4 space-joined tokens) to an 8-byte xxhash key on
      // both sides of all 9 joins (spec-pinned hashed == unhashed)
      val sb = graft.text.CorpusOps.stupidBackoffScoreN(d, "doc_id", "text",
        lmUnigram(s, dir), (2 to 5).map(n => lmTier(s, dir, n)),
        hashContext = true)
      // + 0.0: a perfectly-predicted doc scores −0.0/n — normalize the
      // IEEE sign on both sides (the e01 convention)
      sb.select(col("doc_id"), col("n_scored"),
        (round(col("score"), 6) + lit(0.0)).as("score"))
    },

    // §2.77: token-distribution drift between two snapshots (even vs
    // odd doc ids) — per-source smoothed KL + Jensen-Shannon over the
    // union vocabulary; closed-form arithmetic both engines replay.
    "d37_token_drift" -> oq(
      """WITH tk AS (
        |  SELECT source, CAST(doc_id % 2 AS INT) AS b,
        |    unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> len(x) > 0)) AS token
        |  FROM documents
        |), c AS (
        |  SELECT source, token,
        |    CAST(sum(1 - b) AS DOUBLE) AS ca, CAST(sum(b) AS DOUBLE) AS cb
        |  FROM tk GROUP BY 1, 2
        |), t AS (
        |  SELECT source, sum(ca) AS na, sum(cb) AS nb,
        |    CAST(count(*) AS DOUBLE) AS v
        |  FROM c GROUP BY 1
        |), p AS (
        |  SELECT c.source, na, nb, v,
        |    (ca + 0.5) / (na + 0.5 * v) AS pa,
        |    (cb + 0.5) / (nb + 0.5 * v) AS pb
        |  FROM c JOIN t USING (source)
        |)
        |SELECT source,
        |  CAST(na AS BIGINT) AS n_tokens_a, CAST(nb AS BIGINT) AS n_tokens_b,
        |  CAST(v AS BIGINT) AS vocab,
        |  round(sum(pb * ln(pb / pa)), 6) AS kl_b_vs_a,
        |  round(sum(pa * ln(pa / ((pa + pb) / 2))) / 2
        |      + sum(pb * ln(pb / ((pa + pb) / 2))) / 2, 6) AS js
        |FROM p GROUP BY source, na, nb, v""") { (s, dir) =>
      val d = docs(s, dir)
      graft.text.CorpusOps.tokenDrift(
        d.where(col("doc_id") % 2 === 0), d.where(col("doc_id") % 2 === 1),
        "source", "text")
    },

    // §2.79: DSIR importance weights (Xie et al. 2023) — every document
    // weighted by target-likeness (target LM = src0, raw LM = the whole
    // corpus) under add-0.5-smoothed unigram LMs on the union
    // vocabulary. Closed-form arithmetic both engines replay.
    "d38_dsir_weights" -> oq(
      """WITH tk AS (
        |  SELECT doc_id, source, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0)) AS token
        |  FROM documents
        |), tgt AS (
        |  SELECT token, CAST(count(*) AS DOUBLE) AS ct
        |  FROM tk WHERE source = 'src0' GROUP BY 1
        |), raw AS (
        |  SELECT token, CAST(count(*) AS DOUBLE) AS cr FROM tk GROUP BY 1
        |), j AS (
        |  SELECT token, coalesce(ct, 0) AS ct, cr
        |  FROM raw LEFT JOIN tgt USING (token)
        |), t AS (
        |  SELECT sum(ct) AS nt, sum(cr) AS nr, CAST(count(*) AS DOUBLE) AS v
        |  FROM j
        |), w AS (
        |  SELECT token, ln((ct + 0.5) / (nt + 0.5 * v))
        |              - ln((cr + 0.5) / (nr + 0.5 * v)) AS w
        |  FROM j CROSS JOIN t
        |), tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM tk GROUP BY 1, 2
        |)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  round(sum(tf * w), 6) AS log_weight
        |FROM tf JOIN w USING (token)
        |GROUP BY doc_id""") { (s, dir) =>
      val d = docs(s, dir)
      graft.text.CorpusOps.importanceWeights(d, "doc_id", "text",
        graft.text.CorpusOps.unigramLm(d.where(col("source") === "src0"), "text"),
        graft.text.CorpusOps.unigramLm(d, "text"))
        .select(col("doc_id"), col("n_tokens"), round(col("log_weight"), 6).as("log_weight"))
    },

    // §2.80: Naive-Bayes quality classifier (the GPT-3 curated-vs-crawl
    // filter, Brown et al. 2020 appendix A) — train on src0 (positive)
    // vs the rest (negative), score EVERY document with its posterior
    // log-odds. Training is two count aggregations, so the whole
    // train+score loop replays closed-form in the oracle.
    "t15_nb_quality" -> oq(
      """WITH tk AS (
        |  SELECT doc_id, source, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0)) AS token
        |  FROM documents
        |), pos AS (
        |  SELECT token, CAST(count(*) AS DOUBLE) AS cp
        |  FROM tk WHERE source = 'src0' GROUP BY 1
        |), neg AS (
        |  SELECT token, CAST(count(*) AS DOUBLE) AS cn
        |  FROM tk WHERE source <> 'src0' GROUP BY 1
        |), j AS (
        |  SELECT token, coalesce(cp, 0) AS cp, coalesce(cn, 0) AS cn
        |  FROM pos FULL OUTER JOIN neg USING (token)
        |), t AS (
        |  SELECT sum(cp) AS np, sum(cn) AS nn, CAST(count(*) AS DOUBLE) AS v
        |  FROM j
        |), dc AS (
        |  SELECT CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS DOUBLE) AS dp,
        |         CAST(sum(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS DOUBLE) AS dn
        |  FROM documents
        |), w AS (
        |  SELECT token, ln((cp + 0.5) / (np + 0.5 * v))
        |              - ln((cn + 0.5) / (nn + 0.5 * v)) AS w
        |  FROM j CROSS JOIN t
        |), tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM tk GROUP BY 1, 2
        |)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  round(ln(dp / dn) + sum(tf * w), 6) AS score
        |FROM tf JOIN w USING (token) CROSS JOIN dc
        |GROUP BY doc_id, dp, dn""") { (s, dir) =>
      val d = docs(s, dir)
      val model = graft.text.CorpusOps.NbClassifier.train(
        d.where(col("source") === "src0"), d.where(col("source") =!= "src0"), "text")
      graft.text.CorpusOps.NbClassifier.score(d, "doc_id", "text", model)
        .select(col("doc_id"), col("n_tokens"), round(col("score"), 6).as("score"))
    },

    // §2.81: corpus datasheet card — the per-source release-table
    // numbers (docs, tokens, token quantiles, language share, exact-dup
    // ratio), one row per source, exact by design.
    "t16_corpus_card" -> oq(
      """WITH d AS (
        |  SELECT source,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> len(t) > 0)) AS BIGINT) AS toks,
        |    CAST(len(text) AS DOUBLE) AS chars,
        |    md5(text) AS digest,
        |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS inlang
        |  FROM documents
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(toks) AS BIGINT) AS n_tokens,
        |  round(avg(toks), 2) AS mean_tokens,
        |  round(quantile_cont(toks, 0.5), 2) AS p50_tokens,
        |  round(avg(chars), 2) AS mean_chars,
        |  round(avg(inlang), 6) AS lang_share,
        |  round(1.0 - CAST(count(DISTINCT digest) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE), 6) AS exact_dup_ratio
        |FROM d GROUP BY source""") { (s, dir) =>
      graft.text.CorpusOps.corpusCard(docs(s, dir), "source", "text", "lang")
    },

    // §2.76: composition targeting — per-source sampling rates that hit
    // a 50/30/20 token-share target over three sources, scarcest source
    // binding at rate 1.0. Closed-form arithmetic both engines replay.
    "t14_target_mixture" -> oq(
      """WITH tok AS (
        |  SELECT source, CAST(sum(CAST(len(list_filter(
        |    string_split_regex(trim(text), '\s+'), t -> len(t) > 0)) AS BIGINT)) AS BIGINT) AS tokens
        |  FROM documents GROUP BY source
        |), tgt AS (
        |  SELECT * FROM (VALUES ('src0', CAST(0.5 AS DOUBLE)),
        |                        ('src1', CAST(0.3 AS DOUBLE)),
        |                        ('src2', CAST(0.2 AS DOUBLE))) AS t(source, target_share)
        |), j AS (
        |  SELECT source, tokens, target_share FROM tok JOIN tgt USING (source)
        |), m AS (
        |  SELECT min(CAST(tokens AS DOUBLE) / target_share) AS tp FROM j
        |)
        |SELECT source, tokens, target_share,
        |  round(least(1.0, target_share * tp / CAST(tokens AS DOUBLE)), 6) AS rate
        |FROM j CROSS JOIN m""") { (s, dir) =>
      graft.text.CorpusOps.targetMixtureRates(docs(s, dir), "source", "text",
        Seq("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
    },

    // §2.75: distributed BPE vocabulary induction (Sennrich 2016) —
    // 40 merges learned from the corpus word-frequency table. Iterative
    // argmax has no SQL-expressible oracle (rows-only); BpeSpec pins the
    // full merge sequence + counts against a serial reference
    // implementation.
    "t13_bpe_vocab" -> nq { (s, dir) =>
      graft.text.Bpe.bpeMerges(s, docs(s, dir), "text", numMerges = 40)
    },

    // §2.75e: byte-level BPE with byte fallback (Radford 2019 — the
    // GPT-2/tiktoken family): 256-byte initial alphabet via the
    // bytes_to_unicode bijection, lossless whitespace-run pre-tokens,
    // no lowercasing, no OOV ever. Rows-only: iterative training;
    // ByteBpeSpec pins serial↔distributed parity and the byte-identical
    // round-trip property over fuzzed unicode.
    "t24_byte_bpe_vocab" -> nq { (s, dir) =>
      graft.text.ByteBpe.byteBpeMerges(s, docs(s, dir), "text", numMerges = 40)
    },

    // §2.75c: WordPiece (Schuster & Nakajima 2012 / the BERT trainer) —
    // the likelihood-gain merge criterion (count(ab)/(count(a)·count(b)))
    // next to t13's raw-frequency BPE, ##-prefixed continuations, and
    // the greedy longest-match-first encoder over a 1% sample.
    // Rows-only: iterative training; WordPieceSpec pins the criterion
    // divergence from BPE, serial↔distributed parity, and the encode
    // rules (longest-first, UNK collapse).
    "t21_wordpiece_vocab" -> nq { (s, dir) =>
      val d = docs(s, dir)
      // ONE word-frequency aggregation (checkpointed) feeds both the
      // trainer and the encoder vocabulary — train() over the raw docs
      // would recompute the identical table
      val counts = graft.text.WordPiece.wordCounts(d, "text").localCheckpoint(true)
      val merges = graft.text.WordPiece.trainCounts(s, counts, numMerges = 40)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2)))
      val words = counts.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      val enc = graft.text.WordPiece.encodeUdf(
        graft.text.WordPiece.vocabulary(words, merges))
      counts.unpersist()
      d.where(col("doc_id") % 100 === 0)
        .select(col("doc_id"), size(enc(col("text"))).as("n_pieces"))
    },

    // §2.75b: unigram-LM (SentencePiece) vocabulary induction — the
    // top-down EM+prune counterpart to t13's bottom-up BPE, plus the
    // Viterbi apply path over a deterministic 1% document sample.
    // Rows-only: iterative EM has no SQL oracle; UnigramSpec pins
    // serial↔distributed parity and the lattice arithmetic by hand.
    "t19_unigram_vocab" -> nq { (s, dir) =>
      val d = docs(s, dir)
      val vocab = graft.text.Unigram.train(s, d, "text", vocabSize = 150,
        maxPieceLen = 6, seedSize = 1200, emIters = 2)
      val pieces = vocab.collect().map(r => r.getString(0) -> r.getDouble(1)).toSeq
      val enc = graft.text.Unigram.encodeUdf(pieces)
      d.where(col("doc_id") % 100 === 0)
        .select(col("doc_id"), size(enc(col("text"))).as("n_pieces"))
    },

    // §2.72c: HTML main-text extraction — both engines wrap the corpus
    // in identical deterministic markup (script/style payloads,
    // comments, entities, nav div — the t03/d40 injection convention)
    // and must recover the identical extracted text: the md5 proves
    // the whole rule chain (element removal, block→newline, tag strip,
    // entity decode order, whitespace normalization) matches char for
    // char.
    "t20_html_extract" -> oq(
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc</title><style type="text/css">p { color: red; }</style>'
        |    || '<script>var x = 1 < 2; // ' || doc_id || '</script></head><body>'
        |    || '<h1>Doc ' || doc_id || '</h1><p class="main">' || text || '</p>'
        |    || '<!-- crawl ' || doc_id || ' --><div id="nav">Home &amp; &lt;About&gt;&nbsp;' || source || '</div>'
        |    || '</body></html>' AS html
        |  FROM documents
        |), e AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      regexp_replace(regexp_replace(regexp_replace(
        |        regexp_replace(regexp_replace(regexp_replace(
        |        regexp_replace(regexp_replace(regexp_replace(
        |        regexp_replace(regexp_replace(regexp_replace(
        |        regexp_replace(regexp_replace(
        |          html,
        |          '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |          '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |          '(?s)<!--.*?-->', ' ', 'g'),
        |          '(?i)<(?:br\s*/?|/p|/div|/h[1-6]|/li|/tr)>', chr(10), 'g'),
        |          '<[^>]+>', ' ', 'g'),
        |          '&lt;', '<', 'g'),
        |          '&gt;', '>', 'g'),
        |          '&quot;', '"', 'g'),
        |          '&#39;', CHR(39), 'g'),
        |          '&nbsp;', ' ', 'g'),
        |          '&amp;', '&', 'g'),
        |          '[ \t]+', ' ', 'g'),
        |          ' ?\n ?', chr(10), 'g'),
        |          '\n{3,}', chr(10) || chr(10), 'g'),
        |      '^\s+|\s+$', '', 'g'
        |    ) AS extracted
        |  FROM h
        |)
        |SELECT doc_id, md5(extracted) AS text_md5,
        |CAST(length(extracted) AS BIGINT) AS n_chars
        |FROM e""") { (s, dir) =>
      val html = concat(
        lit("<html><head><title>Doc</title><style type=\"text/css\">p { color: red; }</style>"),
        lit("<script>var x = 1 < 2; // "), col("doc_id").cast("string"),
        lit("</script></head><body>"),
        lit("<h1>Doc "), col("doc_id").cast("string"),
        lit("</h1><p class=\"main\">"), col("text"), lit("</p>"),
        lit("<!-- crawl "), col("doc_id").cast("string"),
        lit(" --><div id=\"nav\">Home &amp; &lt;About&gt;&nbsp;"), col("source"),
        lit("</div></body></html>"))
      docs(s, dir)
        .select(col("doc_id"),
          graft.text.CorpusOps.extractHtmlText(html).as("x"))
        .select(col("doc_id"), md5(col("x")).as("text_md5"),
          length(col("x")).cast("long").as("n_chars"))
    },

    // §2.83: encoding-corruption signals (ftfy-class diagnostics) —
    // replacement-char / control-char / mojibake-lead fractions per
    // document. The corpus is clean, so both engines deterministically
    // inject the same corruption (the d32/t12 convention) and must
    // report the identical fractions.
    "d40_encoding" -> oq(
      """WITH c AS (
        |  SELECT doc_id,
        |    text || CASE
        |      WHEN doc_id % 3 = 0 THEN chr(65533) || chr(195) || chr(169)
        |      WHEN doc_id % 5 = 0 THEN chr(7) || chr(31)
        |      ELSE '' END AS t
        |  FROM documents
        |)
        |SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars,
        |  round((length(t) - length(regexp_replace(t, '\x{FFFD}', '', 'g')))
        |    / CAST(length(t) AS DOUBLE), 6) AS replacement_frac,
        |  round((length(t) - length(regexp_replace(t,
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]', '', 'g')))
        |    / CAST(length(t) AS DOUBLE), 6) AS control_frac,
        |  round((length(t) - length(regexp_replace(t, '[\x{00C2}\x{00C3}]', '', 'g')))
        |    / CAST(length(t) AS DOUBLE), 6) AS mojibake_frac
        |FROM c""") { (s, dir) =>
      val corrupt = concat(col("text"),
        when(col("doc_id") % 3 === 0, lit("\uFFFD\u00C3\u00A9"))
          .when(col("doc_id") % 5 === 0, lit("\u0007\u001F"))
          .otherwise(lit("")))
      docs(s, dir).select(col("doc_id"),
          graft.text.TextFunctions.encodingSignals(corrupt).as("e"))
        .select(col("doc_id"), col("e.n_chars").as("n_chars"),
          col("e.replacement_frac").as("replacement_frac"),
          col("e.control_frac").as("control_frac"),
          col("e.mojibake_frac").as("mojibake_frac"))
    },

    // §2.82: rolling z-score anomaly detection per user — each event
    // scored against its own 20-event preceding window, |z| >= 3 (or a
    // zero-variance break) flagged with evidence. Deterministic frame
    // order (ts, event_id) makes every score engine-replayable.
    "q54_anomaly" -> oq(
      """SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
        |  round(prior_mean, 6) AS prior_mean,
        |  round(prior_std, 6) AS prior_std,
        |  prior_n, round(z, 6) AS z
        |FROM (
        |  SELECT user_id, ts, event_id, value,
        |    avg(value) OVER w AS prior_mean,
        |    stddev_samp(value) OVER w AS prior_std,
        |    count(value) OVER w AS prior_n,
        |    CASE WHEN stddev_samp(value) OVER w > 0
        |      THEN (value - avg(value) OVER w) / stddev_samp(value) OVER w
        |    END AS z
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
        |)
        |WHERE prior_n >= 5
        |  AND ((z IS NULL AND value <> prior_mean) OR abs(z) >= 3)""") { (s, dir) =>
      graft.ops.Events.rollingAnomalies(ev(s, dir), "user_id", "ts", "event_id",
        "value", lookback = 20, zThreshold = 3.0, minPrior = 5)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
          col("value"), col("prior_mean"), col("prior_std"), col("prior_n"), col("z"))
    },

    // §2.62c: fuzzy (set-similarity) string join — AllPairs prefix
    // filter (Bayardo 2007) joining two DISJOINT catalogs (even/odd
    // part keys) on approximate name equality. The oracle replays the
    // RESULT by brute force over the distinct name sets (the prefix
    // filter is an algorithmic pruning, not a semantic — RelationalSpec
    // pins its losslessness against brute force); the distinct() keeps
    // the gate's pair count bounded by the name vocabulary at every sf.
    "q55_fuzzy_join" -> oq(
      """WITH l AS (SELECT DISTINCT p_name AS lname FROM part WHERE p_partkey % 2 = 0),
        |r AS (SELECT DISTINCT p_name AS rname FROM part WHERE p_partkey % 2 = 1),
        |lg AS (SELECT lname, list_distinct(list_transform(
        |  range(greatest(len(lname) - 3, 0) + 1),
        |  i -> substr(lower(lname), i + 1, 3))) AS g FROM l),
        |rg AS (SELECT rname, list_distinct(list_transform(
        |  range(greatest(len(rname) - 3, 0) + 1),
        |  i -> substr(lower(rname), i + 1, 3))) AS g FROM r),
        |p AS (
        |  SELECT lname, rname,
        |    CAST(len(list_intersect(lg.g, rg.g)) AS DOUBLE) AS inter,
        |    len(lg.g) + len(rg.g) AS tot
        |  FROM lg CROSS JOIN rg
        |)
        |SELECT lname, rname, round(inter / (tot - inter), 6) AS jaccard
        |FROM p WHERE inter / (tot - inter) >= 0.55""") { (s, dir) =>
      val p = part(s, dir)
      val l = p.where(col("p_partkey") % 2 === 0)
        .select(col("p_name").as("lname")).distinct()
      val r = p.where(col("p_partkey") % 2 === 1)
        .select(col("p_name").as("rname")).distinct()
      graft.ops.Relational.fuzzyJoin(l, r, "lname", "lname", "rname", "rname",
        threshold = 0.55)
    },

    // §2.34: tumbling-window agg (streaming code path run on batch; oracle)
    "q29_window_tumbling" -> oq(
      """SELECT strftime(to_timestamp(floor(epoch(ts)/900)*900), '%Y-%m-%d %H:%M') AS window_start,
        |event_type, count(*) AS n_events, round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1, 2""") { (s, dir) =>
      graft.streaming.Streams.tumblingAgg(ev(s, dir), "ts", "15 minutes")
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm").as("window_start"),
          col("event_type"), col("n_events"), round(col("sum_value"), 2).as("sum_value"))
    },
  )

  def all: Map[String, Q] = (cube ++ pipeline).map { case (k, (f, _)) => k -> f }
  def oracles: Map[String, String] =
    (cube ++ pipeline).collect { case (k, (_, Some(sql))) => k -> sql }
}
