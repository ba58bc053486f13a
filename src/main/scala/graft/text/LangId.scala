package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained character-n-gram naive-Bayes language identification — the
  * LID gate every crawl document passes FIRST in the CCNet/fastText
  * lineage (Wenzek et al. 2020 §3.1 gate on fastText LID, Joulin et al.
  * 2017 build it from char-n-gram features). The reference ships only a
  * stopword-hit heuristic (bacon has no LID at all; graft's
  * [[TextFunctions.langId]] covers that cheap prefilter), which cannot
  * tell unlisted languages apart; this is the trained replacement.
  *
  * Multinomial NB over pooled char 3- and 4-grams keeps the whole loop
  * closed-form — the model IS a per-(gram, language) count table, so
  * training is deterministic, incremental (counts add: retraining on
  * grown corpora is a count merge, the [[CorpusOps.NbClassifier]]
  * convention), and replayable by any SQL engine. Per-language
  * add-α log-likelihood over the union vocabulary V:
  *
  *   score(d, ℓ) = ln(n_ℓ/D)  +  Σ_{g∈d} tf_g · ln((c_{g,ℓ} + α)/(N_ℓ + αV))
  *
  * decomposed for scoring as
  *
  *   score(d, ℓ) = prior_ℓ + Σ_{(g,ℓ) seen} tf_g · lpc_{g,ℓ} + T_d · floor_ℓ
  *
  * with lpc = ln((c + α)/α) (the N_ℓ + αV denominators cancel against
  * the floor), floor_ℓ = ln α − ln(N_ℓ + αV), and T_d the doc's total
  * gram count — so grams a language never saw (and grams outside V
  * entirely) cost exactly the floor without materializing the dense
  * (gram × language) matrix. Prediction is the argmax over languages of
  * the 6-dp-ROUNDED score (ties break on language ascending), so the
  * winner is a pure function of values both engines agree on.
  *
  * Scale shape (100 TB): training is ONE corpus pass producing a
  * vocab-sized (gram, lang) count table (map-side combinable) plus two
  * aggregates of that table (N_ℓ, V) and a K-row class-prior count;
  * scoring is ONE corpus pass (per-doc gram tf), a vocab-sized
  * equi-join (AQE broadcasts when it fits), one per-(doc, lang) sum,
  * and a K-wide literal explode — no window over the corpus, no
  * cross join, no driver data beyond the K-row language table.
  */
object CharLangId {

  /** Per-language driver-side scoring constants (K rows, collected like
    * the codebook/centroid literals elsewhere): class-prior log-prob,
    * OOV floor, and the lexicographic rank used for deterministic
    * tie-breaking.
    */
  final case class LangStat(lang: String, prior: Double, floor: Double, rank: Int)

  /** The trained model: vocab-sized (gram, lang, lpc) table + K language
    * stats. `gramLogCounts` is lazy/unmaterialized — persist it when
    * scoring many batches against one model.
    */
  final case class Model(gramLogCounts: DataFrame, stats: Seq[LangStat], ns: Seq[Int])

  /** All character n-grams of each length in `ns` over the lowercased,
    * trimmed text, pooled into one array (the fastText convention of
    * pooling an n-gram range into one feature space). Guarded so a
    * string shorter than n yields no n-grams instead of a descending
    * `sequence` range.
    */
  def charGrams(text: Column, ns: Seq[Int]): Column = {
    val s = lower(trim(text))
    // native codegen'd kernel (graft.functions.CharGrams) — value-equal
    // to the previous HOF form
    //   concat(per n: when(length(s) >= n,
    //     transform(sequence(1, length(s)-(n-1)), i => substr(s, i, n)))
    //     .otherwise(array())),
    // which re-entered the interpreter per gram and paid substr's
    // from-the-start char scan per gram. The coalesce keeps the HOF
    // form's null contract: NULL text featurizes to NO grams (the doc
    // still scores — the prior/floor terms — rather than scoring NULL).
    coalesce(graft.functions.VectorFunctions.charGrams(s, ns),
      array().cast("array<string>"))
  }

  /** Train on labeled documents (rows with a NULL label are ignored).
    * One corpus pass; the returned count table is exact, so two models
    * trained on corpus halves merge by summing counts.
    */
  def train(df: DataFrame, textCol: String, labelCol: String,
            alpha: Double = 0.5, ns: Seq[Int] = Seq(3, 4)): Model = {
    require(alpha > 0, s"smoothing alpha must be positive, got $alpha")
    require(ns.nonEmpty && ns.forall(_ >= 1), s"n-gram lengths must be >= 1, got $ns")
    val labeled = df.where(col(labelCol).isNotNull)
      .select(col(labelCol).cast("string").as("__lang"), col(textCol).as("__text"))
    val gramCounts = labeled
      .select(col("__lang"), explode(charGrams(col("__text"), ns)).as("gram"))
      .groupBy(col("__lang"), col("gram"))
      .agg(count(lit(1)).cast("double").as("__c"))
      // vocab-sized, read three times (N_ℓ, V, the returned lpc table):
      // without the checkpoint each read re-runs the corpus explode —
      // "one corpus pass" would silently be three
      .localCheckpoint(true)
    // N_ℓ and V are vocab-table aggregates; doc counts give the priors.
    // All three collect K (or 1) rows — driver LUT literals, documented
    // like the codebook collects.
    val nv = gramCounts.groupBy(col("__lang")).agg(sum(col("__c")).as("__n"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val vRow = gramCounts.agg(countDistinct(col("gram")).cast("double")).head()
    require(!vRow.isNullAt(0) && vRow.getDouble(0) > 0,
      "CharLangId.train: empty union vocabulary — no labeled document " +
        "contains a single char n-gram; check the text and label columns")
    val v = vRow.getDouble(0)
    val docCounts = labeled.groupBy(col("__lang")).agg(count(lit(1)).as("__d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docCounts.values.sum.toDouble
    val stats = docCounts.keys.toSeq.sorted.zipWithIndex.map { case (l, r) =>
      LangStat(l, math.log(docCounts(l) / total),
        math.log(alpha) - math.log(nv.getOrElse(l, 0.0) + alpha * v), r)
    }
    val table = gramCounts.select(col("gram"), col("__lang").as("lang"),
      log((col("__c") + alpha) / alpha).as("lpc"))
    Model(table, stats, ns)
  }

  /** Persist a trained model — the serve-side split every other served
    * tier already has ([[graft.sim.PqIndex.write]]'s convention): the
    * vocab-sized lpc table as parquet plus two tiny manifests (K
    * language stats, the n-gram lengths), so a serving pipeline loads
    * the finished model instead of retraining per session. Parquet
    * round-trips the doubles bit-exact, so loaded == in-memory
    * prediction id-for-id (LangIdSpec pins it). Unlike the ANN tiers
    * there is no per-row lifecycle (no tombstones): the model is one
    * monolithic generation artifact — a takedown or drift answer is a
    * retrain (counts are exact and mergeable, so incremental retrain is
    * a count merge) written to a fresh dir and swapped by the caller.
    */
  def write(model: Model, dir: String): Unit = {
    val spark = model.gramLogCounts.sparkSession
    model.gramLogCounts.write.mode("overwrite").parquet(s"$dir/lpc")
    spark.createDataFrame(model.stats).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/stats")
    spark.createDataFrame(model.ns.map(Tuple1(_))).toDF("n").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Publish a trained model as a new GENERATION under a managed base
    * dir — the cross-session serve convention the index tiers use
    * ([[graft.sources.GenerationPointer]]): the model lands complete in
    * `baseDir/gen-<n+1>`, then the `_current` pointer flips atomically,
    * so a concurrent [[loadCurrent]] sees either the old model or the
    * complete new one, never a half-written dir. A retrain (drift, or a
    * takedown answered by retraining on the purged corpus) is publish +
    * [[graft.sources.Sources.retireOldGenerations]] once in-flight
    * readers drain — the model itself stays a monolithic artifact (no
    * per-row tombstones; see [[write]]).
    */
  def publish(model: Model, baseDir: String): String = {
    val spark = model.gramLogCounts.sparkSession
    // a pointer that is not gen-<int> is foreign/torn state: refuse (the
    // compactManaged convention) rather than silently writing gen-0 over
    // history — retireOldGenerations is the ONLY sanctioned delete
    val n = graft.sources.GenerationPointer.current(spark, baseDir)
      .map { g =>
        g.stripPrefix("gen-").toIntOption.filter(_ => g.startsWith("gen-"))
          .getOrElse(throw new IllegalStateException(
            s"unrecognized generation '$g' at $baseDir/_current — not gen-<n>"))
      }.getOrElse(-1)
    val gen = s"gen-${n + 1}"
    // never overwrite an existing generation dir: a concurrent publisher
    // that read the same pointer would otherwise delete parquet files a
    // reader of the just-flipped pointer is already scanning — the torn
    // state the pointer protocol exists to prevent. Publishers must
    // serialize (the lost race retries and lands on the next n); the
    // exists-check is the fast path, and the exclusive `_claim` create
    // below closes its TOCTOU window: two publishers that both read the
    // same pointer and both pass the check race on ONE create(…,
    // overwrite=false) — namenode-atomic on HDFS-style stores, a narrow
    // best-effort window on the raw local FS — so the loser refuses
    // cleanly instead of co-writing a torn generation.
    val genPath = new org.apache.hadoop.fs.Path(s"$baseDir/$gen")
    val fs = genPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(genPath)) throw new IllegalStateException(
      s"generation dir $genPath already exists (concurrent publish?) — " +
        "re-read the pointer and retry")
    // Only the already-exists outcome IS the race; any other IO failure
    // (permissions, quota, a transient store error) must surface as
    // itself, cause attached — masking it as "lost the race" would send
    // the caller into a futile retry loop against a broken filesystem.
    try fs.create(new org.apache.hadoop.fs.Path(genPath, "_claim"), false).close()
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"lost the publish race claiming $genPath (concurrent publish) — " +
            "re-read the pointer and retry")
      case e: java.nio.file.FileAlreadyExistsException =>
        // RawLocalFileSystem surfaces the non-overwrite create this way
        throw new IllegalStateException(
          s"lost the publish race claiming $genPath (concurrent publish) — " +
            "re-read the pointer and retry", e)
      case e: java.io.IOException =>
        // ChecksumFileSystem/older FS impls report the same condition as
        // a plain IOException — message phrasing varies per impl
        // ("already exists", POSIX "File exists", …), so don't trust the
        // string: probe the store. If the claim (or the generation dir a
        // peer is mid-writing) now exists, this WAS the race; otherwise
        // the failure is genuine (permissions, quota, transient store
        // error) and must surface as itself, cause attached — masking it
        // as "lost the race" would send the caller into a futile retry
        // loop against a broken filesystem.
        val raced =
          try fs.exists(new org.apache.hadoop.fs.Path(genPath, "_claim")) ||
            fs.exists(genPath)
          catch { case _: java.io.IOException => false }
        if (raced) throw new IllegalStateException(
          s"lost the publish race claiming $genPath (concurrent publish) — " +
            "re-read the pointer and retry", e)
        else throw e
    }
    write(model, s"$baseDir/$gen")
    graft.sources.GenerationPointer.write(spark, baseDir, gen)
    gen
  }

  /** Load the generation the `_current` pointer names — throws when the
    * base dir is unmanaged (a managed reader must not guess).
    */
  def loadCurrent(spark: org.apache.spark.sql.SparkSession, baseDir: String): Model =
    load(spark, graft.sources.GenerationPointer.currentDir(spark, baseDir))

  /** Load a [[write]]-persisted model. The lpc table stays a lazy scan
    * (bounded: vocab-sized) — persist it when scoring many batches
    * against one model; the two manifests collect (K rows, ≤ a few
    * ints), the codebook-literal convention.
    */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Model = {
    val lpc = spark.read.parquet(s"$dir/lpc")
    val stats = spark.read.parquet(s"$dir/stats").collect().map(r =>
      LangStat(r.getAs[String]("lang"), r.getAs[Double]("prior"),
        r.getAs[Double]("floor"), r.getAs[Int]("rank")))
      .sortBy(_.rank).toSeq
    require(stats.nonEmpty, s"CharLangId.load: no language stats under $dir")
    val ns = spark.read.parquet(s"$dir/meta").collect()
      .map(_.getAs[Int]("n")).toSeq.sorted
    Model(lpc, stats, ns)
  }

  /** Predict the language of every document: (idCol, lang_pred, score)
    * with score the winner's 6-dp-rounded posterior log-likelihood.
    * Zero-gram documents still predict (the prior argmax). Tie-break on
    * equal rounded score: lexicographically first language — identical
    * in any engine replaying the same arithmetic.
    */
  def predict(df: DataFrame, idCol: String, textCol: String, model: Model): DataFrame = {
    val grams = df.select(col(idCol).as("__id"),
      charGrams(col(textCol), model.ns).as("__grams"))
    val tf = grams.select(col("__id"), explode(col("__grams")).as("gram"))
      .groupBy(col("__id"), col("gram")).agg(count(lit(1)).cast("double").as("__tf"))
    val part = tf.join(model.gramLogCounts, Seq("gram"))
      .groupBy(col("__id"), col("lang"))
      .agg(sum(col("__tf") * col("lpc")).as("__p"))
    // K-wide literal explode (no join, no BroadcastNestedLoopJoin): each
    // doc row fans out to its K candidate rows with the driver constants
    // inlined — codegen'd, and PlanAudit-clean by construction.
    val langLit = explode(array(model.stats.map(s =>
      struct(lit(s.lang).as("lang"), lit(s.prior).as("__prior"),
        lit(s.floor).as("__floor"), lit(s.rank).as("__r"))): _*))
    val expanded = grams
      .select(col("__id"), size(col("__grams")).cast("double").as("__t"), langLit.as("__l"))
      .select(col("__id"), col("__t"), col("__l.lang").as("lang"),
        col("__l.__prior").as("__prior"), col("__l.__floor").as("__floor"),
        col("__l.__r").as("__r"))
    expanded.join(part, Seq("__id", "lang"), "left")
      .select(col("__id"),
        round(col("__prior") + coalesce(col("__p"), lit(0.0)) + col("__t") * col("__floor"), 6)
          .as("__score"),
        col("__r"), col("lang"))
      .groupBy(col("__id"))
      .agg(max(struct(col("__score"), (-col("__r")).as("__nr"), col("lang"))).as("__w"))
      .select(col("__id").as(idCol), col("__w.lang").as("lang_pred"),
        col("__w.__score").as("score"))
  }
}
