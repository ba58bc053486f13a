package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._
  import TextFunctions._

  private def one[T](c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    spark.range(1).select(c).collect()(0)

  test("token counts") {
    val df = Seq("  the quick  brown fox ", "", "hello, world 42!").toDF("t")
    val out = df.select(tokenCount($"t"), bpeTokenCount($"t")).collect()
    assert(out(0).getLong(0) == 4)
    assert(out(1).getLong(0) == 0)
    assert(out(2).getLong(0) == 3)
    assert(out(2).getLong(1) == 6) // hello , world 4 2 !
  }

  test("shingles of k=3") {
    val r = one(shingleSet(lit("a b c d"), 3))
    assert(r.getSeq[String](0).toSet == Set("a b c", "b c d"))
    val short = one(shingleSet(lit("a b"), 3))
    assert(short.getSeq[String](0) == Seq("a b"))
  }

  test("langId picks the dominant stopword language") {
    val df = Seq(
      "the cat is in the house and it is big",
      "der hund ist nicht mit der katze",
      "le chat est dans la maison pour les amis",
      "zzz qqq www").toDF("t")
    val out = df.select(langId($"t")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("en", "de", "fr", "und"))
  }

  test("quality score is in [0,1] and penalizes punctuation soup") {
    val df = Seq(
      "the cat is on the mat and it is a fine day for all of us to see",
      ".,;:!?.,;:!?.,;:!?").toDF("t")
    val out = df.select(qualityScore($"t")).collect().map(_.getDouble(0))
    assert(out.forall(q => q >= 0.0 && q <= 1.0))
    assert(out(0) > out(1))
  }

  test("repetition signals: dup-line/paragraph fractions and top-2-gram share") {
    // 4 lines, "b" repeated twice -> 1 duplicate of 4
    assert(one(dupLineFraction(lit("a\nb\nc\nb"))).getDouble(0) == 0.25)
    // blank lines are not lines; trim before comparing
    assert(one(dupLineFraction(lit(" a \n\n\na\n  \n"))).getDouble(0) == 0.5)
    assert(one(dupLineFraction(lit("a\nb"))).getDouble(0) == 0.0)
    assert(one(dupLineFraction(lit(""))).getDouble(0) == 0.0)
    // paragraphs split on blank lines (2+ newlines); inner \n stays
    assert(one(dupParagraphFraction(lit("x\ny\n\nx\ny\n\nz"))).getDouble(0) == 0.333333)
    assert(one(dupParagraphFraction(lit("p\n\nq"))).getDouble(0) == 0.0)
    // "a b" occurs 3x among 5 2-grams, 6 tokens -> 2*3/6 = 1.0
    assert(one(top2GramShare(lit("a b a b a b"))).getDouble(0) == 1.0)
    // "the cat" 2x, 6 tokens -> 2*2/6 (case-insensitive)
    assert(one(top2GramShare(lit("The cat saw the cat nap"))).getDouble(0) == 0.666667)
    // all distinct 2-grams -> 2*1/4
    assert(one(top2GramShare(lit("a b c d"))).getDouble(0) == 0.5)
    // degenerate inputs have no 2-gram
    assert(one(top2GramShare(lit("solo"))).getDouble(0) == 0.0)
    assert(one(top2GramShare(lit(""))).getDouble(0) == 0.0)
  }

  test("lineStats: per-line fractions over non-blank lines, hand-computed") {
    val text = Seq(
      "A proper sentence here today.",   // punct, 5 words
      "- bullet item",                   // bullet, short (3 words — the marker splits as one)
      "",                                // blank -> not a line
      "1. numbered list entry",          // bullet (digit marker), 4 words
      "no punctuation trailer",          // 3 words -> short
      "Is this short?  "                 // punct after trim (spaces), 3 words -> short
    ).mkString("\n")
    val r = one(lineStats(lit(text))).getStruct(0)
    assert(r.getLong(0) == 5L)                       // n_lines
    assert(r.getDouble(1) == 0.4)                    // punct: 2/5
    assert(r.getDouble(2) == 0.4)                    // bullet: 2/5
    assert(r.getDouble(3) == 0.6)                    // short: 3/5
    assert(r.getDouble(4) == 3.6)                    // words: (5+3+4+3+3)/5
    // degenerate: no lines at all
    val z = one(lineStats(lit("  \n \n"))).getStruct(0)
    assert(z.getLong(0) == 0L && z.getDouble(4) == 0.0)
  }

  test("tokenEntropy: hand-computed nats, degenerate and uniform limits") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // "a a b": p = (2/3, 1/3) -> H = ln3 - (2 ln2)/3
    assert(one(tokenEntropy(lit("a a b"))).getDouble(0) ==
      r6(math.log(3) - 2 * math.log(2) / 3))
    // all-same tokens -> 0; all-distinct -> ln n; empty -> 0
    assert(one(tokenEntropy(lit("x x x x"))).getDouble(0) == 0.0)
    assert(one(tokenEntropy(lit("a b c d"))).getDouble(0) == r6(math.log(4)))
    assert(one(tokenEntropy(lit("  "))).getDouble(0) == 0.0)
    // case-insensitive like the other signals
    assert(one(tokenEntropy(lit("A a"))).getDouble(0) == 0.0)
  }

  test("fingerprint is whitespace/case insensitive; min-shingle fp stable under tail edits") {
    val df = Seq(
      ("The  quick brown fox", "the quick brown fox"),
      ).toDF("a", "b")
    val r = df.select(fingerprint($"a") === fingerprint($"b")).collect()(0)
    assert(r.getBoolean(0))
  }

  test("encodingSignals: replacement/control/mojibake fractions, clean and empty texts") {
    // 10 chars: 1 replacement char, 1 BEL control, Ã + the Latin-1 tail
    // of a mojibake'd é — tab/newline must NOT count as control
    val corrupted = "ab\uFFFD\u00C3\u00A9cd\u0007" + "\t\n"
    val row = one(TextFunctions.encodingSignals(lit(corrupted)))
      .getStruct(0)
    assert(row.getAs[Long]("n_chars") == 10L)
    assert(row.getAs[Double]("replacement_frac") == 0.1)
    assert(row.getAs[Double]("control_frac") == 0.1)  // BEL only, not \t\n
    assert(row.getAs[Double]("mojibake_frac") == 0.1) // the Ã lead, not ©
    // C1 range counts too (0x7F-0x9F)
    val c1 = one(TextFunctions.encodingSignals(lit("\u007F\u0085xyz")))
      .getStruct(0)
    assert(c1.getAs[Double]("control_frac") == 0.4)
    // clean, empty and NULL texts all score zero
    for (t <- Seq(lit("plain ascii, nothing wrong."), lit(""),
        lit(null).cast("string"))) {
      val r = one(TextFunctions.encodingSignals(t)).getStruct(0)
      assert(r.getAs[Double]("replacement_frac") == 0.0)
      assert(r.getAs[Double]("control_frac") == 0.0)
      assert(r.getAs[Double]("mojibake_frac") == 0.0)
    }
  }
}
