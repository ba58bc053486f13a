package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangIdSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed log-odds on the two-doc corpus") {
    // Train: lang A = "abc", lang B = "abd" (one 3-gram each, no
    // 4-grams). V = 2, N_A = N_B = 1, alpha = 0.5:
    //   lpc("abc", A) = ln((1 + .5)/.5)            = ln 3
    //   floor_A      = ln .5 - ln(1 + .5*2)        = -ln 4
    //   prior_A      = ln(1/2)
    // Scoring "abc" (T = 1):
    //   A: ln(1/2) + ln 3 - ln 4 = -0.980829...
    //   B: ln(1/2) + 0    - ln 4 = -2.079442...
    val train = Seq(("A", "abc"), ("B", "abd")).toDF("lang", "text")
    val model = CharLangId.train(train, "text", "lang")
    val lpc = model.gramLogCounts.where($"gram" === "abc" && $"lang" === "A")
      .head().getDouble(2)
    assert(math.abs(lpc - math.log(3.0)) < 1e-12)
    val sa = model.stats.find(_.lang == "A").get
    assert(math.abs(sa.prior - math.log(0.5)) < 1e-12)
    assert(math.abs(sa.floor - (math.log(0.5) - math.log(2.0))) < 1e-12)

    val pred = CharLangId.predict(Seq((1L, "abc")).toDF("id", "text"), "id", "text", model)
      .head()
    assert(pred.getString(1) == "A")
    assert(math.abs(pred.getDouble(2) - -0.980829) < 1e-6)
  }

  test("distinct languages classify correctly; matches the serial reference") {
    val train = Seq(
      ("en", "the cat sat on the mat"), ("en", "the dog ate the food"),
      ("fr", "le chat sur le tapis"), ("fr", "le chien et le chiot"),
      ("zz", "zzz zaz zzz zuz zzz")).toDF("lang", "text")
    val test = Seq((1L, "the cow and the hen"), (2L, "le chapeau sur le chat"),
      (3L, "zzz zez zzz")).toDF("id", "text")
    val model = CharLangId.train(train, "text", "lang")
    val got = CharLangId.predict(test, "id", "text", model)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.map(g => (g._1, g._2)).toSeq == Seq((1L, "en"), (2L, "fr"), (3L, "zz")))

    // Serial reference: same add-alpha NB computed with plain Scala maps.
    val alpha = 0.5
    def grams(s: String): Seq[String] = {
      val t = s.trim.toLowerCase
      (3 to 4).flatMap(n => if (t.length >= n) t.sliding(n).toSeq else Seq.empty)
    }
    val trainRows = Seq(
      ("en", "the cat sat on the mat"), ("en", "the dog ate the food"),
      ("fr", "le chat sur le tapis"), ("fr", "le chien et le chiot"),
      ("zz", "zzz zaz zzz zuz zzz"))
    val counts = trainRows.flatMap { case (l, t) => grams(t).map(g => (l, g)) }
      .groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val vocab = counts.keys.map(_._2).toSet
    val nl = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val dcs = trainRows.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val langs = dcs.keys.toSeq.sorted
    def score(doc: String, l: String): Double = {
      val gs = grams(doc)
      val prior = math.log(dcs(l) / trainRows.size)
      val floor = math.log(alpha) - math.log(nl(l) + alpha * vocab.size)
      val part = gs.groupBy(identity).map { case (g, occ) =>
        counts.get((l, g)).map(c => occ.size * math.log((c + alpha) / alpha)).getOrElse(0.0)
      }.sum
      prior + part + gs.size * floor
    }
    for ((id, doc) <- Seq((1L, "the cow and the hen"), (2L, "le chapeau sur le chat"),
        (3L, "zzz zez zzz"))) {
      val exp = langs.map(l => (BigDecimal(score(doc, l)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, l)).maxBy(s => (s._1, s._2.head * -1))
      val expWin = langs.map(l => (math.rint(score(doc, l) * 1e6) / 1e6, l))
        .sortBy { case (s, l) => (-s, l) }.head
      val g = got.find(_._1 == id).get
      assert(g._2 == expWin._2, s"doc $id")
      assert(math.abs(g._3 - expWin._1) < 1e-9, s"doc $id score ${g._3} vs $expWin $exp")
    }
  }

  test("zero-gram documents predict the prior argmax; ties break lang-asc") {
    // "x" is shorter than every n: T = 0, score(l) = round(prior_l, 6).
    // Balanced classes make every prior equal -ln 2 — the tie breaks to
    // the lexicographically first language.
    val train = Seq(("aa", "abcabc"), ("bb", "xyzxyz")).toDF("lang", "text")
    val model = CharLangId.train(train, "text", "lang")
    val p = CharLangId.predict(Seq((7L, "x")).toDF("id", "text"), "id", "text", model).head()
    assert(p.getString(1) == "aa")
    assert(math.abs(p.getDouble(2) - math.rint(math.log(0.5) * 1e6) / 1e6) < 1e-9)
  }

  test("prediction is invariant to input partitioning") {
    val train = Seq(("en", "the cat and the dog"), ("fr", "le chat et le chien"))
      .toDF("lang", "text")
    val test = (0L until 20L).map(i =>
      (i, if (i % 2 == 0) "the hen and the cow" else "le chiot et le chaton"))
      .toDF("id", "text")
    val model = CharLangId.train(train.repartition(7), "text", "lang")
    val a = CharLangId.predict(test.repartition(1), "id", "text", model)
      .orderBy("id").collect().map(_.toSeq)
    val b = CharLangId.predict(test.repartition(13), "id", "text", model)
      .orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("write/load round-trip: the loaded model predicts id-for-id like the in-memory one") {
    val train = Seq(
      ("en", "the cat sat on the mat"), ("en", "the dog ate the food"),
      ("fr", "le chat sur le tapis"), ("fr", "le chien et le chiot"),
      ("zz", "zzz zaz zzz zuz zzz")).toDF("lang", "text")
    val test = (0L until 30L).map(i => (i, i % 3 match {
      case 0 => s"the cow and the hen $i"
      case 1 => s"le chapeau sur le chat $i"
      case _ => s"zzz zez zzz $i"
    })).toDF("id", "text")
    val model = CharLangId.train(train, "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft-lid").toString
    CharLangId.write(model, dir)
    val loaded = CharLangId.load(spark, dir)
    // manifests survive exactly: stats in rank order, ns, and the lpc rows
    assert(loaded.stats == model.stats)
    assert(loaded.ns == model.ns)
    assert(loaded.gramLogCounts.orderBy("gram", "lang").collect().toSeq ==
      model.gramLogCounts.orderBy("gram", "lang").collect().toSeq)
    // the serve contract: loaded == in-memory prediction, id for id,
    // score for score (parquet round-trips the doubles bit-exact)
    val a = CharLangId.predict(test, "id", "text", model)
      .orderBy("id").collect().map(_.toSeq)
    val b = CharLangId.predict(test, "id", "text", loaded)
      .orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    // a fresh write to an occupied dir overwrites cleanly (new generation)
    CharLangId.write(CharLangId.train(train.where($"lang" =!= "zz"),
      "text", "lang"), dir)
    assert(CharLangId.load(spark, dir).stats.map(_.lang) == Seq("en", "fr"))
  }

  test("publish/loadCurrent: generation pointer serves the newest model; old gens retire") {
    val train1 = Seq(
      ("en", "the cat sat on the mat"), ("en", "the dog ate the food"),
      ("fr", "le chat sur le tapis"), ("fr", "le chien et le chiot"),
      ("zz", "zzz zaz zzz zuz zzz")).toDF("lang", "text")
    val base = java.nio.file.Files.createTempDirectory("graft-lid-gen").toString
    // unmanaged dir: a managed reader must refuse, not guess
    intercept[IllegalStateException] { CharLangId.loadCurrent(spark, base) }
    assert(CharLangId.publish(CharLangId.train(train1, "text", "lang"), base) == "gen-0")
    assert(CharLangId.loadCurrent(spark, base).stats.map(_.lang) == Seq("en", "fr", "zz"))
    // retrain (takedown: zz purged) publishes a NEW generation and flips
    // the pointer; the old generation's bytes survive until retired
    val gen2 = CharLangId.publish(
      CharLangId.train(train1.where($"lang" =!= "zz"), "text", "lang"), base)
    assert(gen2 == "gen-1")
    val served = CharLangId.loadCurrent(spark, base)
    assert(served.stats.map(_.lang) == Seq("en", "fr"))
    // served == freshly loaded gen dir, id for id
    val test = (0L until 12L).map(i =>
      (i, if (i % 2 == 0) s"the cow and the hen $i" else s"le chapeau du chat $i"))
      .toDF("id", "text")
    val a = CharLangId.predict(test, "id", "text", served)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val b = CharLangId.predict(test, "id", "text",
      CharLangId.load(spark, s"$base/gen-1")).orderBy("id").collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(new java.io.File(base, "gen-0").exists())
    val retired = graft.sources.Sources.retireOldGenerations(spark, base)
    assert(retired == Seq("gen-0") && !new java.io.File(base, "gen-0").exists())
    assert(CharLangId.loadCurrent(spark, base).stats.map(_.lang) == Seq("en", "fr"))
    // a foreign/torn pointer refuses instead of silently overwriting
    // gen-0 (the only sanctioned delete is retireOldGenerations)
    val m = CharLangId.train(train1, "text", "lang")
    graft.sources.GenerationPointer.write(spark, base, "v2-final")
    intercept[IllegalStateException] { CharLangId.publish(m, base) }
    // a lost publish race (pointer behind an existing gen dir) refuses
    // rather than overwrite files a reader may be scanning
    graft.sources.GenerationPointer.write(spark, base, "gen-0")
    intercept[IllegalStateException] { CharLangId.publish(m, base) }
    // both refusals left the served generation intact
    graft.sources.GenerationPointer.write(spark, base, "gen-1")
    assert(CharLangId.loadCurrent(spark, base).stats.map(_.lang) == Seq("en", "fr"))
  }

  test("null labels are ignored; empty vocabulary throws with a clear message") {
    val train = Seq((Some("en"), "the cat"), (None, "dropped row"))
      .toDF("lang", "text")
    val m = CharLangId.train(train, "text", "lang")
    assert(m.stats.map(_.lang) == Seq("en"))
    val bad = Seq(("en", "ab"), ("fr", " x ")).toDF("lang", "text")
    val e = intercept[IllegalArgumentException] {
      CharLangId.train(bad, "text", "lang")
    }
    assert(e.getMessage.contains("empty union vocabulary"))
  }

  test("native charGrams == HOF reference, gram for gram, on adversarial strings") {
    // The native kernel (graft.functions.CharGrams) replaced the
    // interpreted transform(sequence)+substr form; this pins
    // value-identity on the edges: empty, whitespace-only (trim → ""),
    // shorter than min(ns), exactly n, multi-byte UTF-8 (char ≠ byte
    // positions), surrogate pairs, uppercase (lower() applies first),
    // and NULL (both forms featurize to an empty array).
    val rows = Seq("", "   ", "ab", "abc", "abcd", "The CAT",
      "héllo wörld", "日本語のテキスト", "a😀b😀c", " padded  text ",
      null.asInstanceOf[String]).zipWithIndex
      .map { case (s, i) => (i.toLong, Option(s)) }
    val df = rows.toDF("id", "text")
    for (ns <- Seq(Seq(3, 4), Seq(1), Seq(2, 5))) {
      val s = lower(trim(col("text")))
      val hof = {
        val parts = ns.map { n =>
          when(length(s) >= n,
            transform(sequence(lit(1), length(s) - (n - 1)), i => s.substr(i, lit(n))))
            .otherwise(array().cast("array<string>"))
        }
        if (parts.size == 1) parts.head else concat(parts: _*)
      }
      val got = df.select(col("id"),
          CharLangId.charGrams(col("text"), ns).as("native"), hof.as("ref"))
        .collect()
      for (r <- got) {
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"ns=$ns id=${r.getLong(0)}: native=${r.getSeq[String](1)} ref=${r.getSeq[String](2)}")
      }
    }
  }
}
