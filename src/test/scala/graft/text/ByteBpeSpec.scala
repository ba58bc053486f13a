package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ByteBpeSpec extends SparkSpec {
  import spark.implicits._

  test("byte alphabet is a bijection; pre-tokenizer is lossless") {
    assert(ByteBpe.byteToChar.distinct.length == 256)
    assert(ByteBpe.charToByte.size == 256)
    (0 until 256).foreach(b => assert(ByteBpe.charToByte(ByteBpe.byteToChar(b)) == b))
    for (s <- Seq("", "a", "  ", "hello world", " lead", "trail ",
        "tab\tand\nnewline", "emoji 🎉🎉 and 中文 mixed", "a b")) {
      assert(ByteBpe.preTokens(s).mkString == s, s"pre-tokens must rebuild: '$s'")
      // runs strictly alternate whitespace/non-whitespace
      val kinds = ByteBpe.preTokens(s).map(t => t.forall(Character.isWhitespace))
      kinds.sliding(2).foreach {
        case Seq(a, b) => assert(a != b, s"adjacent runs same kind in '$s'")
        case _ =>
      }
    }
  }

  test("learned merges: case preserved, multi-byte chars reassemble, serial == distributed") {
    // "aa" dominates; "Aa" is DISTINCT (no lowercasing at byte level).
    // 中 is three UTF-8 bytes: its pieces must merge back together from
    // byte symbols once frequent enough.
    val corpus = Seq.fill(8)("aa 中中").map(Tuple1(_)).toDF("text")
      .union(Seq.fill(2)("Aa").map(Tuple1(_)).toDF("text"))
    val serial = ByteBpe.byteBpeMerges(spark, corpus, "text", numMerges = 6)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val dist = ByteBpe.byteBpeMerges(spark, corpus, "text", numMerges = 6,
        localVocabThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(serial.toSeq == dist.toSeq, s"\nserial=${serial.toSeq}\ndist=${dist.toSeq}")
    val merged = serial.map { case (_, a, b, _) => a + b }.toSet
    // the full "aa" (two 'a' bytes) and the full 中 (3 bytes) both form
    assert(merged.contains("aa"))
    val zhong = ByteBpe.toSymbols("中").mkString
    assert(merged.contains(zhong), s"3-byte char must reassemble; merged=$merged")
    // case preserved: 'A' byte symbols are distinct from 'a'
    assert(ByteBpe.toSymbols("Aa") != ByteBpe.toSymbols("aa"))
  }

  test("byte fallback: inputs sharing nothing with training still encode, nothing is OOV") {
    val ranks = Map(("a", "a") -> 0)
    val weird = "Ω ☃".replace(" ", "\u0000") // unseen letters, a NUL byte, a snowman
    val toks = ByteBpe.encode(weird, ranks)
    assert(toks.nonEmpty)
    assert(ByteBpe.decodeTokens(toks) == weird)
    // every emitted token decodes — no UNK collapse anywhere
    toks.foreach(t => ByteBpe.decodeTokens(Seq(t)))
  }

  test("round-trip property: fuzzed unicode re-decodes byte-identical") {
    val corpus = Seq("the quick brown fox", "the the the 🎉", "中文 mixed text")
      .map(Tuple1(_)).toDF("text")
    val merges = ByteBpe.byteBpeMerges(spark, corpus, "text", numMerges = 20)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val ranks = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val rnd = new scala.util.Random(42)
    val pools = Seq(
      ('a' to 'z').map(_.toString), Seq(" ", "\t", "\n", " "),
      Seq("é", "ß", "ü"), Seq("中", "文", "語"), Seq("🎉", "💡", "🚀"),
      Seq("Ω", "λ"), Seq(".", ",", "!", "\""))
    val cases = (0 until 200).map { _ =>
      val len = rnd.nextInt(30)
      (0 until len).map { _ =>
        val pool = pools(rnd.nextInt(pools.length)); pool(rnd.nextInt(pool.length))
      }.mkString
    } ++ Seq("", " ", "\n\n\n", "🎉", "a", "中")
    cases.foreach { s =>
      val toks = ByteBpe.encode(s, ranks)
      val back = ByteBpe.decodeTokens(toks)
      assert(back == s, s"round-trip failed: '$s' -> $toks -> '$back'")
      assert(back.getBytes("UTF-8").toSeq == s.getBytes("UTF-8").toSeq)
    }
  }

  test("encodeUdf matches the driver-side encoder and handles nulls") {
    val corpus = Seq.fill(5)("ab ab ab").map(Tuple1(_)).toDF("text")
    val merges = ByteBpe.byteBpeMerges(spark, corpus, "text", numMerges = 3)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val ranks = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val df = Seq((1L, "ab ab"), (2L, "xyz"), (3L, null)).toDF("id", "text")
    val got = df.select(col("id"), ByteBpe.encodeUdf(merges)(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1).toSeq)).toMap
    assert(got(1L) == ByteBpe.encode("ab ab", ranks))
    assert(got(2L) == ByteBpe.encode("xyz", ranks))
    assert(got(3L) == null)
  }
}
