package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("seedPieces: bounded substrings, occurrence-weighted, chars always kept") {
    // "abab"×2: substrings (len≤2) a×2, b×2, ab×2, ba×1 per occurrence
    val lp = Unigram.seedPieces(Seq("abab" -> 2L), maxPieceLen = 2, seedSize = 5)
    // weights: a=4, b=4, ab=4, ba=2 -> total 14 over kept 5 (all kept)
    assert(lp.keySet == Set("a", "b", "ab", "ba"))
    assert(math.abs(lp("ab") - math.log(4.0 / 14.0)) < 1e-12)
    assert(math.abs(lp("ba") - math.log(2.0 / 14.0)) < 1e-12)
    // seedSize caps MULTI-char pieces only; single chars always survive
    val tight = Unigram.seedPieces(Seq("abab" -> 2L), maxPieceLen = 2, seedSize = 3)
    assert(tight.keySet == Set("a", "b", "ab")) // ab (4) beats ba (2)
  }

  test("expectedCounts: hand-computed forward-backward posteriors on a 2-path lattice") {
    // word "ab", pieces {a, b, ab}: paths [ab] (p_ab) and [a][b] (p_a p_b)
    val lp = Map("a" -> math.log(0.3), "b" -> math.log(0.2), "ab" -> math.log(0.5))
    val z = 0.5 + 0.3 * 0.2
    val e = Unigram.expectedCounts("ab", lp, maxPieceLen = 2).toMap
    assert(math.abs(e("ab") - 0.5 / z) < 1e-12)
    assert(math.abs(e("a") - 0.06 / z) < 1e-12)
    assert(math.abs(e("b") - 0.06 / z) < 1e-12)
    // unsegmentable word -> empty (no piece covers 'x')
    assert(Unigram.expectedCounts("ax", lp, 2).isEmpty)
  }

  test("serialTrain: EM concentrates mass on real pieces; Viterbi segments with them") {
    val wc = Seq("abab" -> 20L, "ab" -> 10L, "cd" -> 6L, "ad" -> 1L)
    val vocab = Unigram.serialTrain(wc, vocabSize = 6, maxPieceLen = 2,
      seedSize = 20, emIters = 3).toMap
    // the compositional pieces win the EM race over the bridge bigram
    assert(vocab.contains("ab") && vocab.contains("cd"))
    assert(vocab("ab") > vocab.getOrElse("ba", Double.NegativeInfinity))
    val floor = vocab.values.min - 10.0
    assert(Unigram.viterbi("abab", vocab, 2, floor) == Seq("ab", "ab"))
    assert(Unigram.viterbi("cd", vocab, 2, floor) == Seq("cd"))
    // single chars are never pruned: arbitrary words stay segmentable
    assert(Unigram.viterbi("dcba", vocab, 2, floor).mkString == "dcba")
  }

  test("distributed train == serialTrain: piece set exact, logprobs to fp tolerance, segmentations identical") {
    val docs = Seq(
      "abab ab abab cd", "ab cd abab ab", "cd ab ad abab"
    ).toDF("text")
    val serialWc = docs
      .select(explode(TextFunctions.wsTokens(lower(trim(col("text"))))).as("w"))
      .groupBy("w").count().collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val want = Unigram.serialTrain(serialWc, vocabSize = 6, maxPieceLen = 2,
      seedSize = 20, emIters = 2)
    // threshold 0 forces the distributed loop on the same corpus
    val got = Unigram.train(spark, docs, "text", vocabSize = 6, maxPieceLen = 2,
      seedSize = 20, emIters = 2, localVocabThreshold = 0L)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).sortBy(_._1).toSeq
    assert(got.map(_._1) == want.map(_._1), s"piece sets differ: $got vs $want")
    got.zip(want).foreach { case ((p, a), (_, b)) =>
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)), s"piece $p: $a vs $b")
    }
    val floorW = want.map(_._2).min - 10.0
    val wantMap = want.toMap; val gotMap = got.toMap
    serialWc.map(_._1).foreach { w =>
      assert(Unigram.viterbi(w, gotMap, 2, floorW) == Unigram.viterbi(w, wantMap, 2, floorW), w)
    }
  }

  test("encodeUdf: round-trip coverage, unknown-char floor, null passthrough") {
    // vocabSize 6 = 4 single chars + 2 multi slots (ab, cd); at 5 the
    // rarer cd would be pruned and segment as chars
    val vocab = Unigram.serialTrain(Seq("abab" -> 20L, "cd" -> 5L),
      vocabSize = 6, maxPieceLen = 2, seedSize = 20, emIters = 2)
    val enc = Unigram.encodeUdf(vocab)
    val out = Seq("abab cd", "abxq", null: String).toDF("t")
      .select(enc(col("t")).as("p")).collect()
    val r0 = out(0).getSeq[String](0)
    assert(r0.mkString == "ababcd", r0.toString)      // pieces tile the words
    assert(r0 == Seq("ab", "ab", "cd"))
    val r1 = out(1).getSeq[String](0)
    assert(r1.mkString == "abxq")                     // unknown chars at floor
    assert(out(2).isNullAt(0))
  }
}
