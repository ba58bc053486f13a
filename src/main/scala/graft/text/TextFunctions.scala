package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  * All pure Column expressions (codegen'd, no UDFs) so they run inside
  * whole-stage codegen and scale linearly with no shuffle of their own.
  */
object TextFunctions {

  /** Whitespace tokens, empties dropped. */
  def wsTokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(wsTokens(text)).cast("long")

  /** BPE-ish token count: letter runs, single digits, single punctuation —
    * the shape of GPT-style pre-tokenization, as a pure regex.
    */
  val BpePattern = "[a-zA-Z]+|[0-9]|[^\\sa-zA-Z0-9]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0))).cast("long")

  /** Word k-shingles over the token array (w-shingling for near-dup).
    * Native codegen'd expression (graft.functions.WordShingles).
    */
  def wordShingles(tokens: Column, k: Int): Column =
    graft.functions.VectorFunctions.shingles(tokens, k)

  /** Distinct word k-shingles of a text column. */
  def shingleSet(text: Column, k: Int): Column =
    array_distinct(wordShingles(wsTokens(lower(text)), k))

  // Minimal stopword lists for the language-ID heuristic. Public knowledge
  // (most-frequent function words per language).
  val StopEn = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
  val StopDe = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu")
  val StopFr = Seq("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour")
  val StopEs = Seq("el", "la", "los", "y", "es", "un", "una", "en", "que", "por")

  private def hitCount(tokens: Column, stop: Seq[String]): Column =
    size(array_intersect(array_distinct(tokens), array(stop.map(lit): _*)))

  /** N-gram/stopword language-ID heuristic: the language whose stopword
    * set intersects the document's distinct tokens the most; 'und'
    * (undetermined) when no stopword hits at all. Ties break in fixed
    * order en > de > fr > es (deterministic).
    */
  def langId(text: Column): Column = {
    val toks = wsTokens(lower(text))
    val en = hitCount(toks, StopEn); val de = hitCount(toks, StopDe)
    val fr = hitCount(toks, StopFr); val es = hitCount(toks, StopEs)
    val m = greatest(en, de, fr, es)
    when(m === 0, lit("und"))
      .when(en === m, lit("en"))
      .when(de === m, lit("de"))
      .when(fr === m, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Quality score in [0,1]: rewards reasonable length and stopword
    * density, penalizes punctuation soup. Deterministic arithmetic only
    * (reproducible across engines).
    */
  def qualityScore(text: Column): Column = {
    val toks = wsTokens(text)
    val nTok = size(toks).cast("double")
    val nChar = length(text).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    val stopHits = size(filter(wsTokens(lower(text)),
      t => array_contains(array(StopEn.map(lit): _*), t))).cast("double")
    val lenScore = least(nTok / 100.0, lit(1.0))
    val punctScore = lit(1.0) - least(punct / greatest(nChar, lit(1.0)) * 10.0, lit(1.0))
    val stopScore = least(stopHits / greatest(nTok, lit(1.0)) * 5.0, lit(1.0))
    round((lenScore + punctScore + stopScore) / 3.0, 6)
  }

  /** Gopher-style repetition signals — the standard pre-training quality
    * gates beyond stopword ratios (duplicate-line / duplicate-paragraph
    * fraction and most-frequent-n-gram coverage, per the published Gopher
    * data-quality filters). Pure column expressions, exact arithmetic
    * over splits — oracle-reproducible and codegen'd; the 2-gram pass is
    * O(L log L) per document (sort + one fold), never O(L²).
    */

  private[text] def nonBlankSegments(text: Column, pattern: String): Column =
    filter(transform(split(text, pattern), s => trim(s)), s => length(s) > 0)

  /** (n − distinct)/n over the segments in ONE pass: sort, then count
    * elements and value transitions in a single fold. HOF expressions
    * evaluate interpreted (no codegen, no common-subexpression
    * elimination), so referencing `segs` once instead of three times —
    * size + array_distinct + the guard — is a real 2-3× on wide scans.
    */
  private def dupFraction(segs: Column): Column =
    aggregate(array_sort(segs),
      struct(lit("").as("prev"), lit(0L).as("n"), lit(0L).as("nd")),
      (st, x) => struct(x.as("prev"), (st.getField("n") + 1).as("n"),
        when(x === st.getField("prev"), st.getField("nd"))
          .otherwise(st.getField("nd") + 1).as("nd")),
      st => when(st.getField("n") <= 0, lit(0.0))
        .otherwise(round((st.getField("n") - st.getField("nd")).cast("double") /
          st.getField("n").cast("double"), 6)))

  /** Fraction of non-blank lines that repeat an earlier line. */
  def dupLineFraction(text: Column): Column =
    dupFraction(nonBlankSegments(text, "\n"))

  /** Fraction of non-blank paragraphs (blank-line separated) that repeat. */
  def dupParagraphFraction(text: Column): Column =
    dupFraction(nonBlankSegments(text, "\n{2,}"))

  /** Token-coverage share of the most frequent word 2-gram, capped at 1:
    * 2 × max-2-gram-count / token-count. The max count comes from a sort
    * + longest-equal-run fold (aggregate HOF) — no per-row quadratic
    * scan, no shuffle.
    */
  def top2GramShare(text: Column): Column = {
    val toks = wsTokens(lower(text))
    val n = size(toks)
    val grams = array_sort(wordShingles(toks, 2))
    val best = aggregate(grams,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (st, g) => {
        val run = when(g === st.getField("prev"), st.getField("run") + 1).otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          greatest(st.getField("best"), run).as("best"))
      },
      st => st.getField("best"))
    // < 2 tokens has no 2-gram (wordShingles degenerates to the whole run)
    when(n < 2, lit(0.0))
      .otherwise(round(least(best.cast("double") * 2.0 / n.cast("double"), lit(1.0)), 6))
  }

  /** Line-level quality signals (the RefinedWeb/FineWeb line filters):
    * over the non-blank lines of a document —
    *   n_lines, terminal-punctuation line fraction ([.!?"'] at line
    *   end), bullet-line fraction (-, *, •, or "1." / "1)" markers),
    *   short-line fraction (< 4 words), mean words per line —
    * as ONE struct from a single pass over the split lines (pure column
    * expressions: no shuffle, no UDF; 6dp-rounded fractions, zero/0.0
    * for line-less documents). Complements the document-level Gopher
    * signals (dupLineFraction / top2GramShare) one level down.
    */
  def lineStats(text: Column): Column = {
    val lines = nonBlankSegments(text, "\n")
    val n = size(lines)
    val nd = n.cast("double")
    val punct = size(filter(lines, l => l.rlike("[.!?\"']$")))
    val bullet = size(filter(lines, l => l.rlike("^([-*•]|[0-9]+[.)])\\s")))
    val words = transform(lines, l =>
      size(filter(split(l, "\\s+"), w => length(w) > 0)).cast("long"))
    val shortN = size(filter(words, w => w < 4))
    val totW = aggregate(words, lit(0L), (a, x) => a + x)
    when(n <= 0, struct(
      lit(0L).as("n_lines"), lit(0.0).as("punct_line_frac"),
      lit(0.0).as("bullet_line_frac"), lit(0.0).as("short_line_frac"),
      lit(0.0).as("mean_words_per_line"))
    ).otherwise(struct(
      n.cast("long").as("n_lines"),
      round(punct.cast("double") / nd, 6).as("punct_line_frac"),
      round(bullet.cast("double") / nd, 6).as("bullet_line_frac"),
      round(shortN.cast("double") / nd, 6).as("short_line_frac"),
      round(totW.cast("double") / nd, 6).as("mean_words_per_line")))
  }

  /** Unigram (token) Shannon entropy of a document in nats, via the
    * identity H = ln n − (Σ_t c_t·ln c_t)/n — one sort + one fold over
    * the tokens (the dupFraction shape), no distinct-list
    * materialization. Low entropy = few tokens dominate = boilerplate /
    * generated text; the information-theoretic complement of the d18
    * repetition fractions. 6dp-rounded; token-less documents score 0.
    */
  def tokenEntropy(text: Column): Column = {
    val toks = array_sort(wsTokens(lower(text)))
    val folded = aggregate(toks,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("n"), lit(0.0).as("acc")),
      (st, x) => {
        val same = x === st.getField("prev")
        val closed = when(same, st.getField("acc")).otherwise(
          st.getField("acc") + when(st.getField("run") > 0,
            st.getField("run").cast("double") * log(st.getField("run").cast("double")))
            .otherwise(lit(0.0)))
        struct(x.as("prev"),
          when(same, st.getField("run") + 1).otherwise(lit(1L)).as("run"),
          (st.getField("n") + 1).as("n"), closed.as("acc"))
      },
      st => {
        val acc = st.getField("acc") + when(st.getField("run") > 0,
          st.getField("run").cast("double") * log(st.getField("run").cast("double")))
          .otherwise(lit(0.0))
        val n = st.getField("n").cast("double")
        when(st.getField("n") <= 0, lit(0.0))
          .otherwise(round(log(n) - acc / n, 6))
      })
    folded
  }

  /** The Gopher stop-word presence list (Rae 2021 Table A1's "must
    * contain at least 2 of": the, be, to, of, and, that, have, with).
    */
  val GopherStop = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** One-pass run statistics over a segment array (tokens, n-grams,
    * lines or paragraphs): sort, then fold runs of equal values into
    *   cnt  — number of segments,
    *   nd   — number of DISTINCT segments,
    *   top  — count(v*) · charlen(v*) for v* the MOST FREQUENT value
    *          (Rae 2021 Table A1's "most frequent n-gram"; ties on
    *          count break to the larger char mass, deterministically),
    *   dup  — Σ over values with count(v) > 1 of (count(v)−1) · charlen(v),
    *   tot  — Σ charlen over ALL segments (= Σ count(v) · charlen(v)),
    * where charlen(s) = length(s) − sepOverhead (n-grams arrive joined
    * by single spaces, so their sepOverhead is n−1; raw lines/tokens use
    * 0). O(L log L) per document, a single interpreted fold — the same
    * shape as [[tokenEntropy]]. Segments must be non-empty strings (the
    * run-open test uses run > 0, not a sentinel value, so any content —
    * including NUL bytes — is safe).
    */
  private[text] def segMassFold(segs: Column, sepOverhead: Int): Column = {
    val sep = lit(sepOverhead.toLong)
    def clen(s: Column) = length(s).cast("long") - sep
    aggregate(array_sort(segs),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("cnt"),
        lit(0L).as("nd"), lit(0L).as("topc"), lit(0L).as("top"),
        lit(0L).as("dup"), lit(0L).as("tot")),
      (st, x) => {
        val run = st.getField("run")
        val prev = st.getField("prev")
        val same = (run > 0) && (x === prev)
        val closed = run * clen(prev) // mass of the run being closed (0 when run=0)
        val better = !same && ((run > st.getField("topc")) ||
          (run === st.getField("topc") && closed > st.getField("top")))
        struct(x.as("prev"),
          when(same, run + 1).otherwise(lit(1L)).as("run"),
          (st.getField("cnt") + 1).as("cnt"),
          when(same, st.getField("nd")).otherwise(st.getField("nd") + 1).as("nd"),
          when(better, run).otherwise(st.getField("topc")).as("topc"),
          when(better, closed).otherwise(st.getField("top")).as("top"),
          when(!same && run > 1,
            st.getField("dup") + (run - 1) * clen(prev))
            .otherwise(st.getField("dup")).as("dup"),
          (st.getField("tot") + clen(x)).as("tot"))
      },
      st => {
        val run = st.getField("run")
        val prev = st.getField("prev")
        val closed = run * clen(prev)
        val better = (run > st.getField("topc")) ||
          (run === st.getField("topc") && closed > st.getField("top"))
        struct(st.getField("cnt").as("cnt"), st.getField("nd").as("nd"),
          when(better, closed).otherwise(st.getField("top")).as("top"),
          when(run > 1, st.getField("dup") + (run - 1) * clen(prev))
            .otherwise(st.getField("dup")).as("dup"),
          st.getField("tot").as("tot"))
      })
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text —
    * the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Winnowing-style content fingerprint: the minimum shingle digest —
    * stable under local edits away from the minimizing shingle.
    */
  def minShingleFingerprint(text: Column, k: Int): Column =
    array_min(transform(shingleSet(text, k), s => md5(s)))

  /** Encoding-corruption signals — the ftfy-class diagnostics every web
    * pipeline filters on (Dolma's "UTF-8 garbage" rules): per document,
    * the character fractions of
    *  - U+FFFD replacement characters (a decoder already gave up),
    *  - C0/C1 control characters excluding tab/newline/carriage-return
    *    (binary-in-text / wrong-charset tells),
    *  - Â/Ã lead bytes (U+00C2/U+00C3 — the classic UTF-8-read-as-
    *    Latin-1 mojibake signature: 'é' becomes 'Ã©').
    * Each via one codegen'd regexp_replace length-difference — a pure
    * map over the corpus, the cheapest operator class at 100 TB.
    * Fractions are 6dp-rounded over the RAW char count; empty/NULL
    * texts score zero. Filter on any fraction > 0 for the strict form,
    * or feed the fractions to calibratedQualityFilter.
    */
  def encodingSignals(text: Column): Column = {
    val t = coalesce(text, lit(""))
    val n = length(t)
    val nd = n.cast("double")
    def frac(pattern: String): Column =
      when(n === 0, 0.0).otherwise(
        round((n - length(regexp_replace(t, pattern, ""))).cast("double") / nd, 6))
    struct(
      n.cast("long").as("n_chars"),
      frac("\\uFFFD").as("replacement_frac"),
      frac("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]").as("control_frac"),
      frac("[\\u00C2\\u00C3]").as("mojibake_frac"))
  }
}
