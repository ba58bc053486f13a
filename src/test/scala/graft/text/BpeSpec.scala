package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Serial reference BPE trainer (Sennrich 2016, algorithm 1): weighted
    * pair counts over the word-frequency table, greedy left-to-right
    * merge application, lexicographic tie-break — the ground truth the
    * distributed implementation must reproduce merge-for-merge.
    */
  private def serialBpe(corpus: Seq[String], numMerges: Int,
                        minPairCount: Long = 2L): Seq[(String, String, Long)] = {
    val wordCounts = corpus.flatMap(_.trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var vocab: Map[Seq[String], Long] = wordCounts.map { case (w, c) =>
      (w.split("").filter(_.nonEmpty).toSeq :+ Bpe.EndOfWord) -> c
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (!done && out.size < numMerges) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (sym, c) =>
        sym.sliding(2).filter(_.size == 2).foreach { p =>
          pairCounts((p(0), p(1))) = pairCounts.getOrElse((p(0), p(1)), 0L) + c
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val ((a, b), c) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }
        if (c < minPairCount) done = true
        else {
          out += ((a, b, c))
          vocab = vocab.map { case (sym, wc) =>
            val m = scala.collection.mutable.ArrayBuffer.empty[String]
            sym.foreach { x =>
              if (m.nonEmpty && m.last == a && x == b) m(m.length - 1) = a + b
              else m += x
            }
            m.toSeq -> wc
          }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        }
      }
    }
    out.toSeq
  }

  private val corpus = Seq(
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest",
    "low lower newest widest")

  test("both regimes (driver-local and distributed loop) equal the independent serial reference, rank for rank") {
    val df = corpus.toDF("text")
    val want = serialBpe(corpus, 12)
    // default threshold: tiny vocab takes the collected driver-side loop
    val local = Bpe.bpeMerges(spark, df, "text", numMerges = 12)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(local == want, s"\nlocal: $local\nwant:  $want")
    // threshold 0: force the distributed vocab-frame loop
    val dist = Bpe.bpeMerges(spark, df, "text", numMerges = 12,
        localVocabThreshold = 0L)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(dist == want, s"\ndist: $dist\nwant: $want")
  }

  test("greedy left-to-right fold: aaaa merges to [aa, aa], never overlapping") {
    val df = Seq(Seq("a", "a", "a", "a"), Seq("a", "a", "a")).toDF("symbols")
    val out = df.select(Bpe.mergePair(col("symbols"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(out == List(List("aa", "aa"), List("aa", "a")))
  }

  test("minPairCount stops early: singleton words learn no merges below the bar") {
    val df = Seq("x y z").toDF("text") // every pair occurs once
    val got = Bpe.bpeMerges(spark, df, "text", numMerges = 5, minPairCount = 2L)
    assert(got.count() == 0L)
  }

  test("tie-break is lexicographic (left, then right) — deterministic on re-run") {
    // "ab" and "cd" both occur exactly twice; (a,b) must win over (c,d).
    val df = Seq("ab ab cd cd").toDF("text")
    val first = Bpe.bpeMerges(spark, df, "text", numMerges = 1)
      .collect().map(r => (r.getString(1), r.getString(2))).head
    // pairs at count 2: (a,b), (b,</w>), (c,d), (d,</w>) → (a,b) first
    assert(first == ("a", "b"))
  }

  test("encodeUdf segments with the learned table; token counts are consistent") {
    val df = corpus.toDF("text")
    val merges = Bpe.bpeMerges(spark, df, "text", numMerges = 12)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = Bpe.encodeUdf(merges)
    val got = df.select(enc(col("text")).as("toks")).collect()
      .map(_.getSeq[String](0))
    // every document round-trips: joining sub-tokens and stripping the
    // end-of-word marker reconstructs the lowercased word sequence
    got.zip(corpus).foreach { case (toks, doc) =>
      val rebuilt = toks.mkString("").replace(Bpe.EndOfWord, " ").trim
      assert(rebuilt == doc.toLowerCase.split("\\s+").mkString(" "))
    }
    // and the distributed fold agrees with the serial encoder per word
    val serial = corpus.flatMap(_.split("\\s+")).distinct
      .map(w => w -> Bpe.encodeWord(w, merges)).toMap
    got.zip(corpus).foreach { case (toks, doc) =>
      val want = doc.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .flatMap(serial).toSeq
      assert(toks == want)
    }
  }

  test("rankEncode (min-rank loop) == encodeWord (rank-order application), incl. adversarial merges") {
    // learned merges from the corpus: the realistic case
    val df = corpus.toDF("text")
    val learned = Bpe.bpeMerges(spark, df, "text", numMerges = 20)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val learnedRanks = learned.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val words = corpus.flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty).distinct
    words.foreach { w =>
      assert(Bpe.rankEncode(w, learnedRanks) == Bpe.encodeWord(w, learned), s"word=$w")
    }
    // adversarial hand-built tables: self-merges, chained merges whose
    // later ranks consume earlier outputs, and merges that never fire
    val nasty = Seq(("a", "a"), ("aa", "a"), ("aa", "aa"), ("b", "a"),
      ("ba", "aa"), ("c", Bpe.EndOfWord), ("aaa", "c"))
    val nastyRanks = nasty.zipWithIndex.map { case (p, i) => p -> i }.toMap
    for (w <- Seq("a", "aa", "aaa", "aaaa", "aaaaa", "aaaaaaa", "baa", "baaa",
        "abc", "cab", "bac", "aabaa", "c", "bbbb", "")) {
      assert(Bpe.rankEncode(w, nastyRanks) == Bpe.encodeWord(w, nasty), s"word=$w")
    }
    // random fuzz over a 3-letter alphabet
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 500) {
      val w = (0 until (1 + rnd.nextInt(12))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      assert(Bpe.rankEncode(w, nastyRanks) == Bpe.encodeWord(w, nasty), s"word=$w")
      assert(Bpe.rankEncode(w, learnedRanks) == Bpe.encodeWord(w, learned), s"word=$w")
    }
  }

  test("validateMerges: learned tables pass; invariant-violating tables fail fast in encodeUdf") {
    // learned tables satisfy the creation-order invariant by construction
    val df = corpus.toDF("text")
    val learned = Bpe.bpeMerges(spark, df, "text", numMerges = 20)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    Bpe.validateMerges(learned)
    // chained composites built strictly from earlier ranks also pass
    Bpe.validateMerges(Seq(("a", "a"), ("aa", "a"), ("aa", "aa"), ("b", "a"),
      ("ba", "aa"), ("c", Bpe.EndOfWord), ("aaa", "c")))
    // the divergence table: rank 0 consumes "ab", which only rank 1
    // produces — rankEncode would yield ["abc"] where encodeWord yields
    // ["ab","c"]. Must be rejected with the offending rank named.
    val bad = Seq(("ab", "c"), ("a", "b"))
    val e = intercept[IllegalArgumentException] { Bpe.validateMerges(bad) }
    assert(e.getMessage.contains("rank 0"), e.getMessage)
    intercept[IllegalArgumentException] { Bpe.encodeUdf(bad) }
  }
}
