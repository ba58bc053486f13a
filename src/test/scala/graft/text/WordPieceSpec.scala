package graft.text

import graft.SparkSpec

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  test("likelihood criterion: cohesive rare pair beats the frequent pair BPE would take; ## merge spelling") {
    // units: a:10 ##b:10 c:3 ##d:3. BPE's frequency criterion takes
    // (a,##b) first (count 10); WordPiece scores (c,##d) 3/(3·3)=0.333
    // over (a,##b) 10/(10·10)=0.1 — the rarer pair is more cohesive
    // relative to its unigram expectation.
    val wc = Seq(("ab", 10L), ("cd", 3L))
    val m = WordPiece.serialTrain(wc, numMerges = 2, minPairCount = 1)
    assert(m.map(x => (x._1, x._2)) == Seq(("c", "##d"), ("a", "##b")), m.toString)
    assert(m.head._3 == 3L && math.abs(m.head._4 - 3.0 / 9.0) < 1e-15)
    // merge output strips the continuation prefix off the right side
    val vocab = WordPiece.vocabulary(wc, m.map(x => (x._1, x._2)))
    assert(vocab("cd") && vocab("ab"))
    assert(vocab("a") && vocab("##b") && vocab("c") && vocab("##d"))
    // a continuation-continuation merge keeps the prefix: word "xab"
    // has units x ##a ##b with equal pair scores (5/25 each), so the
    // lexicographic tie-break picks ("##a","##b") and spells "##ab"
    val m2 = WordPiece.serialTrain(Seq(("xab", 5L)), numMerges = 1, minPairCount = 1)
    assert(m2.head._1 == "##a" && m2.head._2 == "##b" && m2.head._3 == 5L, m2.toString)
    assert(WordPiece.vocabulary(Seq(("xab", 5L)),
      m2.map(x => (x._1, x._2)))("##ab"))
  }

  test("serial == distributed merge-for-merge, counts and scores included") {
    val docs = Seq("the cat the hat", "the cat sat on the mat",
      "hat cat the", "a mat sat").toDF("text")
    val wc = docs.collect().flatMap(_.getString(0).split("\\s+"))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
    val serial = WordPiece.serialTrain(wc, numMerges = 6, minPairCount = 1)
    val dist = WordPiece.train(spark, docs, "text", numMerges = 6,
        minPairCount = 1, localVocabThreshold = 0)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    assert(dist.length == serial.length)
    serial.zip(dist).zipWithIndex.foreach { case ((s, d), i) =>
      assert(s._1 == d._1 && s._2 == d._2 && s._3 == d._3,
        s"rank $i: serial $s != distributed $d")
      assert(math.abs(s._4 - d._4) < 1e-15, s"rank $i score")
    }
    // the collected regime (default threshold) equals both
    val local = WordPiece.train(spark, docs, "text", numMerges = 6, minPairCount = 1)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(local.toSeq == serial.map(s => (s._1, s._2, s._3)))
  }

  test("greedy longest-match encode: longest piece wins, continuation matching, UNK collapse, udf") {
    val vocab = Set("un", "##able", "u", "##n", "##a", "a", "##b", "##l", "##e")
    assert(WordPiece.encodeWord("unable", vocab) == Seq("un", "##able"))
    // longest FIRST piece wins even when a shorter split could continue
    assert(WordPiece.encodeWord("una", vocab) == Seq("un", "##a"))
    // any unmatchable position collapses the whole word
    assert(WordPiece.encodeWord("unq", vocab) == Seq(WordPiece.Unk))
    assert(WordPiece.encodeWord("qun", vocab) == Seq(WordPiece.Unk))
    assert(WordPiece.encodeWord("", vocab).isEmpty)
    val toks = Seq("Unable a  q").toDF("text")
      .select(WordPiece.encodeUdf(vocab)(org.apache.spark.sql.functions.col("text")))
      .head().getSeq[String](0)
    assert(toks == Seq("un", "##able", "a", WordPiece.Unk), toks.toString)
  }
}
