package graft.cube

/** CubeQuery → portable SQL text — the graft analogue of the reference's
  * SQL backend (bacon/sql.py:1-370, which renders cube queries as
  * Postgres SQL). graft's primary execution path compiles to Catalyst
  * (Slicer); this compiler exists for pushing a cube query INTO an
  * external SQL store — a warehouse over JDBC, DuckDB, Postgres — when
  * the data lives there and shipping it to Spark would be the bottleneck.
  *
  * The emitted text is deliberately restricted to the dialect
  * intersection of Spark SQL and DuckDB (date_trunc + CAST, null-safe
  * predicates spelled with IS NULL instead of `<=>`, explicit
  * NULLS FIRST/LAST, LIMIT/OFFSET), and the correctness gate runs the
  * SAME generated string on both engines (s01_sql_pushdown: Spark
  * executes it via spark.sql, DuckDB executes it as the oracle — a
  * hash-identical result proves the text is genuinely portable).
  * Postgres parses most of this surface but is NOT in the tested
  * intersection (e.g. the STRING cast alias is Spark/DuckDB-only) —
  * target it via a dedicated dialect before trusting the text.
  *
  * Supported surface: plain-column and arithmetic labels, date-trunc
  * hierarchy labels (via DateUnitCodec), scalar filter ops
  * (eq/ne/gt/ge/lt/le/in/ni with the reference's Python null semantics),
  * the full set-label algebra (hasall…notequals — membership chains use
  * the shared `array_contains` spelling; the universally-quantified ops
  * and the `split` set-label constructor are per-dialect, see Dialect),
  * Sum/Min/Max/Count/CountDistinct/Avg measures, ordering with the
  * Slicer's null placement, limit/offset. match/nmatch compile only for
  * a `dialect` with a regex spelling (no spelling is shared: Spark has
  * regexp_like, DuckDB has regexp_matches, Postgres has `~` — and the
  * Postgres dialect additionally VALIDATES the pattern down to the
  * Java∩POSIX-ARE-identical subset, refusing with the pattern named
  * otherwise; the reference pushes raw Python-re patterns into `~`
  * unvalidated, bacon/cubedef.py:369-380). Anything
  * else — set labels as axes, pivots, sketch accumulators — throws
  * `IllegalArgumentException`; callers fall back to the Catalyst path,
  * exactly as the reference falls back from its SQL strategy to the
  * Python one when a piece is not SQL-expressible.
  */
object SqlCompiler {

  /** Target-dialect hooks for the (few) spots where no shared spelling
    * exists — the analogue of the reference's per-label `to_sql`
    * specialization (bacon/cubedef.py). `Portable` is the default: the
    * Spark∩DuckDB intersection, which has NO regex predicate, so
    * match/nmatch throw and the caller falls back to Catalyst.
    */
  sealed abstract class Dialect(val name: String) {
    /** Partial-match regex predicate (Python `re.search` semantics: true
      * when the pattern matches anywhere), or None when this dialect has
      * no spelling with those semantics. `pattern` is the RAW pattern —
      * the dialect renders its own literal (escaping differs) and may
      * validate pattern compatibility (Postgres does).
      */
    def regexMatch(e: String, pattern: String): Option[String]
    /** Universal quantification over an array: SQL that is TRUE iff
      * `pred` (with `x` as the element variable) holds for EVERY element,
      * quantifying vacuously TRUE over empty AND NULL arrays (the
      * reference's make_set turns NULL into the empty set). None when the
      * dialect has no lambda spelling.
      */
    def listForall(arr: String, pred: String): Option[String]
    /** Regex split to array — the one function set labels are built from
      * (`split(col, re)`). Spark's `split` is Java-regex; DuckDB's is
      * `regexp_split_to_array` (RE2); no spelling is shared. `rawPattern`
      * carries the unescaped pattern when the split's pattern argument is
      * a string literal — dialects that validate pattern compatibility
      * (Postgres) need it and refuse a non-literal pattern.
      */
    def splitRegex(e: String, patternLit: String,
                   rawPattern: Option[String] = None): Option[String]
    /** Membership of a scalar literal in an array/set expression, with
      * make_set's null contract (NULL array = ∅ contains nothing →
      * coalesce FALSE). `array_contains` is shared by Spark and DuckDB
      * (where it aliases list_contains); Postgres spells it `= ANY`.
      */
    def arrayContains(arr: String, valueLit: String): String =
      s"coalesce(array_contains($arr, $valueLit), FALSE)"
    /** The dialect's spelling of the string type in CAST. `STRING` is an
      * alias accepted by Spark and DuckDB; Postgres needs TEXT.
      */
    def stringTypeName: String = "STRING"
    /** Row-multiplying element stream of a set expression with make_set
      * semantics (NULL → ∅, '' discarded, duplicates collapsed), for a
      * set label used as an AXIS. Spark spells it explode() in the select
      * list, DuckDB unnest(); no spelling is shared — and the portable
      * dialect has none.
      */
    def unnestSet(arr: String): Option[String]
    /** Quoted identifier. Backtick in Spark's default parser vs `"…"` in
      * DuckDB/Postgres (where Spark reads a string literal unless
      * `spark.sql.ansi.doubleQuotedIdentifiers` is on) — so only plain
      * `[A-Za-z_][A-Za-z0-9_]*` names are portable; anything else (pivot
      * columns named after data values like `1-URGENT`) needs a concrete
      * dialect.
      */
    def quoteIdent(s: String): String = {
      require(s.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"identifier '$s' has no portable quoting (backtick vs double-quote) — " +
          "compile for Dialect.SparkSql / Dialect.DuckDb explicitly")
      s
    }
    /** String literal in this dialect. `''` is an escaped quote in every
      * target (verified against Spark 4 and DuckDB — NOT adjacent-literal
      * concatenation), but backslashes split the engines: Spark's default
      * parser treats them as escape prefixes ('\d' parses as 'd'), while
      * DuckDB/Postgres (standard_conforming_strings) keep them literal.
      * So SparkSql doubles them, the standard dialects pass them through,
      * and Portable — whose contract is ONE string with identical
      * semantics on both engines — refuses rather than silently letting
      * a regex like \d match the wrong thing on one side.
      */
    def stringLit(s: String): String = {
      require(!s.contains("\\"),
        s"string literal with a backslash has no portable spelling (Spark eats it, " +
          s"DuckDB keeps it) — compile for Dialect.SparkSql / Dialect.DuckDb explicitly")
      "'" + s.replace("'", "''") + "'"
    }
  }
  object Dialect {
    case object Portable extends Dialect("portable") {
      def regexMatch(e: String, p: String): Option[String] = None
      def listForall(arr: String, pred: String): Option[String] = None
      def splitRegex(e: String, p: String, raw: Option[String]): Option[String] = None
      def unnestSet(arr: String): Option[String] = None
    }
    case object SparkSql extends Dialect("spark") {
      def regexMatch(e: String, p: String): Option[String] =
        Some(s"regexp_like($e, ${stringLit(p)})") // Java regex, find-anywhere
      def listForall(arr: String, pred: String): Option[String] =
        // forall(NULL, ...) is NULL -> coalesce TRUE (make_set(NULL) = ∅)
        Some(s"coalesce(forall($arr, x -> $pred), TRUE)")
      def splitRegex(e: String, p: String, raw: Option[String]): Option[String] =
        Some(s"split($e, $p)")
      def unnestSet(arr: String): Option[String] =
        Some(s"explode(array_distinct(array_remove(coalesce($arr, array()), '')))")
      override def stringLit(s: String): String =
        "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"
      override def quoteIdent(s: String): String = "`" + s.replace("`", "``") + "`"
    }
    case object DuckDb extends Dialect("duckdb") {
      def regexMatch(e: String, p: String): Option[String] =
        Some(s"regexp_matches($e, ${stringLit(p)})") // RE2, find-anywhere
      def listForall(arr: String, pred: String): Option[String] =
        // bool_and of an empty transform is NULL -> coalesce TRUE, same
        // vacuous-truth contract as the Spark spelling
        Some(s"coalesce(list_aggregate(list_transform($arr, x -> $pred), 'bool_and'), TRUE)")
      def splitRegex(e: String, p: String, raw: Option[String]): Option[String] =
        Some(s"regexp_split_to_array($e, $p)")
      def unnestSet(arr: String): Option[String] =
        Some(s"unnest(list_distinct(list_filter(coalesce($arr, []), x -> x <> '')))")
      override def stringLit(s: String): String = "'" + s.replace("'", "''") + "'"
      override def quoteIdent(s: String): String = "\"" + s.replace("\"", "\"\"") + "\""
    }
    /** The reference's primary SQL target (bacon/sql.py renders cube
      * queries as Postgres SQL; match/nmatch compile to `~`/`!~`,
      * bacon/cubedef.py:369-380 — with NO pattern validation). graft is
      * stricter: Postgres `~` is Spencer ARE, whose semantics diverge
      * from the Java/RE2 patterns graft queries carry on class
      * shorthands (\d, \w), lazy quantifiers, lookaround, class
      * intersection and bracket escapes — so [[requirePostgresSafeRegex]]
      * accepts only the structurally-identical subset and throws with the
      * pattern named otherwise (the caller falls back to Catalyst).
      * Accepted patterns are prefixed with ARE's `(?p)` (partial
      * newline-sensitivity: `.`/brackets stop matching \n while ^/$ stay
      * string anchors) which is exactly Java's default contract. One
      * documented residue: Java's `$` also matches just before a FINAL
      * trailing newline; ARE's does not — visible only on subjects
      * ending in a literal '\n'.
      *
      * Set ops: membership spells `= ANY`, universal quantification an
      * unnest anti-EXISTS (vacuously TRUE over NULL/empty — unnest of an
      * empty/NULL array yields no rows), set axes an ARRAY(SELECT
      * DISTINCT …) unnest in the select list (PG10+ SRF semantics: zero
      * elements remove the row, matching explode).
      */
    case object Postgres extends Dialect("postgres") {
      def regexMatch(e: String, p: String): Option[String] = {
        requirePostgresSafeRegex(p)
        Some(s"$e ~ ${stringLit("(?p)" + p)}")
      }
      def listForall(arr: String, pred: String): Option[String] =
        Some(s"(NOT EXISTS (SELECT 1 FROM unnest($arr) AS __fa(x) WHERE NOT ($pred)))")
      def splitRegex(e: String, p: String, raw: Option[String]): Option[String] = {
        val r = raw.getOrElse(throw new IllegalArgumentException(
          "split() with a non-literal pattern is not postgres-compilable " +
            "(POSIX-safety validation needs the raw pattern)"))
        requirePostgresSafeRegex(r)
        Some(s"regexp_split_to_array($e, ${stringLit("(?p)" + r)})")
      }
      def unnestSet(arr: String): Option[String] =
        Some(s"unnest(ARRAY(SELECT DISTINCT __u.x FROM unnest($arr) AS __u(x) WHERE __u.x <> ''))")
      override def arrayContains(arr: String, valueLit: String): String =
        s"coalesce($valueLit = ANY($arr), FALSE)"
      override def stringTypeName: String = "TEXT"
      // standard_conforming_strings (on since PG 9.1): backslash literal
      override def stringLit(s: String): String = "'" + s.replace("'", "''") + "'"
      override def quoteIdent(s: String): String = "\"" + s.replace("\"", "\"\"") + "\""
    }
  }

  /** Accept only regex constructs whose meaning is identical under Java
    * regex (what graft's Catalyst path executes) and Postgres ARE with
    * the `(?p)` prefix: literals, `.`, anchors, alternation, grouping
    * `(...)`, greedy `* + ?` and numeric `{m[,n]}` bounds, bracket
    * expressions without escapes/POSIX-classes/`&&`, and escaped
    * punctuation (`\.` etc. — literal in both). Everything else —
    * `\d`-style class shorthands (ARE has them but with subtly different
    * class definitions), `\b` (ARE: backspace; Java: word boundary!),
    * lazy quantifiers, `(?...)` groups, backreference digits, bracket
    * escapes (POSIX: literal backslash), `[[:alpha:]]` (Java: error),
    * class intersection `&&` — throws with the pattern and reason named,
    * so the caller falls back to the Catalyst path instead of silently
    * changing meaning.
    */
  private[cube] def requirePostgresSafeRegex(p: String): Unit = {
    def fail(why: String): Nothing = throw new IllegalArgumentException(
      s"regex pattern '$p' is not postgres-compilable: $why — Java and POSIX-ARE " +
        "semantics diverge on this construct; rewrite the pattern or run the " +
        "filter on the Catalyst/Slicer path")
    var i = 0
    var inClass = false
    var classStart = -1
    while (i < p.length) {
      val c = p.charAt(i)
      if (!inClass) c match {
        case '\\' =>
          if (i + 1 >= p.length) fail("trailing backslash")
          val n = p.charAt(i + 1)
          if (n.isLetterOrDigit)
            fail(s"escape \\$n (class shorthands, \\b, and backreferences are engine-specific)")
          i += 1
        case '[' =>
          inClass = true; classStart = i
        case '(' =>
          if (i + 1 < p.length && p.charAt(i + 1) == '?')
            fail("'(?' group (flags, lookaround and non-capturing groups differ)")
        case '*' | '+' | '?' =>
          if (i + 1 < p.length && p.charAt(i + 1) == '?') fail("lazy quantifier")
          if (i + 1 < p.length && p.charAt(i + 1) == '+')
            fail("possessive quantifier (Java-only; ARE rejects quantifier-after-quantifier)")
        case '{' =>
          val j = p.indexOf('}', i)
          if (j < 0 || !p.substring(i + 1, j).matches("\\d+(,\\d*)?"))
            fail("'{' outside a numeric {m[,n]} bound (literal-brace handling differs)")
          if (j + 1 < p.length && p.charAt(j + 1) == '?') fail("lazy quantifier")
          if (j + 1 < p.length && p.charAt(j + 1) == '+')
            fail("possessive quantifier (Java-only; ARE rejects quantifier-after-quantifier)")
          i = j
        case _ => ()
      } else c match {
        case '\\' => fail("backslash inside [...] (literal in POSIX, escape in Java)")
        case '[' if i + 1 < p.length && ":.=".contains(p.charAt(i + 1)) =>
          fail("POSIX [[:class:]]/collating syntax (Java has none)")
        case '&' if i + 1 < p.length && p.charAt(i + 1) == '&' =>
          fail("'&&' inside [...] (Java class intersection, POSIX literal)")
        case ']' =>
          val leading = i == classStart + 1 ||
            (p.charAt(classStart + 1) == '^' && i == classStart + 2)
          if (leading) fail("']' as the first bracket element (literal in POSIX, error in Java)")
          inClass = false
        case _ => ()
      }
      i += 1
    }
    if (inClass) fail("unbalanced '['")
  }

  /** Render `q` over `table`. `roundDp` optionally wraps a measure in
    * round(_, dp) — floating-point sums differ across engines in the
    * last bits (summation order), so cross-engine comparisons round,
    * same as every float-valued oracle in the gate.
    *
    * Pivot queries compile to FILTER-ed aggregates — one
    * `agg(e) FILTER (WHERE pivotExpr IS NOT DISTINCT FROM value)` column
    * per (pivot value × measure), both clauses shared by Spark and
    * DuckDB — and REQUIRE `pivotValues` (the fixed-column scale path;
    * this compiler never fires a distinct-values job). Column naming
    * mirrors Slicer/Spark pivot: the value string alone for a single
    * measure, `value_measure` for several; the names need per-dialect
    * identifier quoting, so pivots refuse Dialect.Portable.
    *
    * A set label as an AXIS (per-element row multiplication — Slicer's
    * explode) compiles as a row-multiplying subquery:
    * `FROM (SELECT *, <unnestSet(arr)> AS axis FROM t WHERE …)` with the
    * outer GROUP BY on the alias. The unnest spelling is per-dialect; at
    * most ONE set axis compiles (a second would need nested subqueries
    * with zip-vs-cross-product traps across engines — use Slicer), and
    * filters stay in the INNER where (they test the whole set, pre-
    * explosion, exactly like the Catalyst path).
    */
  def compile(cube: CubeDef, q: CubeQuery, table: String,
              roundDp: Map[String, Int] = Map.empty,
              dialect: Dialect = Dialect.Portable,
              pivotValues: Seq[Any] = Nil): String = {
    val setAxes = q.axes.filter(a => cube.label(a).isSet)
    require(setAxes.size <= 1,
      s"${setAxes.size} set axes are not SQL-compilable (nested unnest zips or " +
        "cross-products depending on the engine — use Slicer)")
    require(q.pivot.isEmpty || setAxes.isEmpty,
      "a pivot combined with a set axis is not SQL-compilable (use Slicer)")
    require(q.pivot.isEmpty || pivotValues.nonEmpty,
      "pivot compilation needs explicit pivotValues (the fixed-column scale " +
        "path; this compiler never runs a distinct-values job)")

    def axisSql(a: String): String =
      if (setAxes.contains(a)) dialect.quoteIdent(a) else labelSql(cube, a, dialect)

    val axes = q.rowAxes.map(a => s"${axisSql(a)} AS $a")
    val aggs: Seq[String] =
      if (q.pivot.isEmpty)
        q.values.map { m => s"${measureSql(cube, m, roundDp.get(m), dialect)} AS $m" }
      else {
        val pvSql =
          if (q.pivot.size == 1) labelSql(cube, q.pivot.head, dialect)
          else q.pivot.map(p => s"CAST(${labelSql(cube, p, dialect)} AS ${dialect.stringTypeName})")
            .mkString("concat_ws('/', ", ", ", ")")
        val measures = if (q.values.nonEmpty) q.values else Vector("count")
        for (v <- pivotValues; m <- measures) yield {
          val pred = s"$pvSql IS NOT DISTINCT FROM ${lit(v, dialect)}"
          val colName =
            if (measures.size == 1) String.valueOf(v) else s"${String.valueOf(v)}_$m"
          val agg =
            if (q.values.isEmpty) // valueless pivot slices count rows (Slicer's default)
              s"nullif(count(*) FILTER (WHERE $pred), 0)"
            else measureSql(cube, m, roundDp.get(m), dialect, filterPred = Some(pred))
          s"$agg AS ${dialect.quoteIdent(colName)}"
        }
      }
    require(axes.nonEmpty || aggs.nonEmpty, "empty query")

    val where = q.filters.map(filterSql(cube, _, dialect)) match {
      case Vector() => ""
      case fs       => "\nWHERE " + fs.mkString("\n  AND ")
    }
    // With a set axis the filtered scan moves INTO the exploding
    // subquery; everything else (grouping, ordering, paging) is the
    // outer query over one-row-per-element.
    val from = setAxes.headOption match {
      case None => s"$table$where"
      case Some(a) =>
        val arr = exprSql(cube.label(a).expr, dialect)
        val un = dialect.unnestSet(arr).getOrElse(
          throw new IllegalArgumentException(
            s"set axis '$a' needs an unnest spelling; dialect '${dialect.name}' has " +
              "none (use Dialect.SparkSql / Dialect.DuckDb, or fall back to Catalyst)"))
        s"(SELECT *, $un AS ${dialect.quoteIdent(a)} FROM $table$where) AS __exploded"
    }
    val groupBy =
      if (q.rowAxes.isEmpty) ""
      else "\nGROUP BY " + q.rowAxes.map(axisSql).mkString(", ")
    val orderBy =
      if (q.order.isEmpty) ""
      else "\nORDER BY " + q.order.map { o =>
        // mirror Slicer.finish: asc_nulls_first / desc_nulls_last —
        // engines disagree on default null placement, so be explicit.
        // With a pivot key the sort targets that pivoted column
        // (bacon/cubequery.py:278), whose name needs quoting — and with
        // MULTIPLE measures the pivoted columns are suffixed
        // `<value>_<measure>` (the naming the SELECT above emits), so the
        // sort target carries the ordered measure's suffix too.
        val target =
          if (o.pivotKey.nonEmpty) {
            val measures = if (q.values.nonEmpty) q.values else Vector("count")
            val base = o.pivotKey.mkString("/")
            dialect.quoteIdent(
              if (measures.size == 1) base else s"${base}_${o.name}")
          } else o.name
        if (o.ascending) s"$target ASC NULLS FIRST" else s"$target DESC NULLS LAST"
      }.mkString(", ")
    val limit = q.limit.map(n => s"\nLIMIT $n").getOrElse("")
    val offset = q.offset.map(n => s" OFFSET $n").getOrElse("")
    s"SELECT ${(axes ++ aggs).mkString(",\n       ")}\nFROM $from$groupBy$orderBy$limit$offset"
  }

  /** SQL for a label: the date-trunc hierarchy compiles from its codec
    * (portable `CAST(date_trunc(...))` rather than Spark's `trunc`);
    * plain/arithmetic labels render their Catalyst expression, which for
    * column refs and arithmetic is already dialect-neutral.
    */
  private def labelSql(cube: CubeDef, name: String, dialect: Dialect): String = {
    require(cube.hasLabel(name), s"unknown label '$name'")
    val label = cube.label(name)
    label.codec.collect { case ValueCodec.DateUnitCodec(u) => u } match {
      case Some(u) if name.endsWith(s"_$u") =>
        val base = name.stripSuffix(s"_$u")
        u match {
          case "year" | "quarter" | "month" | "week" | "day" =>
            s"CAST(date_trunc('$u', $base) AS DATE)"
          case "hour" =>
            s"CAST(date_trunc('hour', $base) AS TIMESTAMP)"
          case other =>
            throw new IllegalArgumentException(s"date unit '$other' not SQL-compilable")
        }
      case Some(_) =>
        throw new IllegalArgumentException(
          s"label '$name' has a date codec but a non-conventional name; not SQL-compilable")
      case None => exprSql(label.expr, dialect)
    }
  }

  /** `filterPred` attaches `FILTER (WHERE …)` to every aggregate CALL in
    * the measure (both halves of Avg) — the pivot compilation's
    * per-column predicate; the clause is in both engines' grammars.
    *
    * Filtered counts wrap in nullif(…, 0): Spark's pivot is a two-phase
    * aggregate (group by (axes, pivotCol), then pivot), so a combination
    * with NO rows surfaces as NULL, not 0 — and a combination that
    * exists always counts ≥ 1, so nullif reproduces the representation
    * exactly. It also turns Avg's empty-combination denominator into
    * NULL (NULL division agrees across engines; x/0 does not).
    */
  private def measureSql(cube: CubeDef, name: String, dp: Option[Int],
                         dialect: Dialect, filterPred: Option[String] = None): String = {
    val m = cube.measure(name)
    val e = exprSql(m.expr, dialect)
    def f(call: String) = filterPred.fold(call)(p => s"$call FILTER (WHERE $p)")
    def cnt(call: String) = filterPred.fold(call)(_ => s"nullif(${f(call)}, 0)")
    val raw = m.agg match {
      case Agg.Sum           => f(s"sum($e)")
      case Agg.Min           => f(s"min($e)")
      case Agg.Max           => f(s"max($e)")
      case Agg.Count         => cnt("count(*)") // bacon Count counts rows
      case Agg.CountDistinct => cnt(s"count(DISTINCT $e)")
      // bacon Average divides by TOTAL row count, not non-null count
      case Agg.Avg           => s"(${f(s"sum($e)")} / ${cnt("count(*)")})"
      case other =>
        throw new IllegalArgumentException(s"accumulator $other is not SQL-compilable")
    }
    dp.fold(raw)(d => s"round($raw, $d)")
  }

  /** Filter SQL with the reference's Python null semantics (FilterOp):
    * eq NULL matches only NULL; ne/ni KEEP null rows; positive
    * comparisons drop them (which plain SQL predicates already do).
    * Spelled with IS NULL / OR instead of `<=>` so both engines parse it.
    */
  private def filterSql(cube: CubeDef, f: Filter, dialect: Dialect): String = {
    val e = labelSql(cube, f.name, dialect)
    def regex: String = dialect.regexMatch(e, f.value.toString).getOrElse(
      throw new IllegalArgumentException(
        s"filter op '${f.op}' has no regex spelling in dialect '${dialect.name}' " +
          "(use Dialect.SparkSql / Dialect.DuckDb, or fall back to Catalyst)"))
    f.op match {
      // match: NULL drops (a positive predicate, like re.search on None);
      // nmatch keeps NULL rows, mirroring FilterOp's Python semantics
      case FilterOp.Match  => regex
      case FilterOp.NMatch => s"(NOT $regex OR $e IS NULL)"
      case FilterOp.Eq => if (f.value == null) s"$e IS NULL" else s"$e = ${lit(f.value, dialect)}"
      case FilterOp.Ne =>
        if (f.value == null) s"$e IS NOT NULL"
        else s"($e <> ${lit(f.value, dialect)} OR $e IS NULL)"
      case FilterOp.Gt => s"$e > ${lit(f.value, dialect)}"
      case FilterOp.Ge => s"$e >= ${lit(f.value, dialect)}"
      case FilterOp.Lt => s"$e < ${lit(f.value, dialect)}"
      case FilterOp.Le => s"$e <= ${lit(f.value, dialect)}"
      case FilterOp.In =>
        s"$e IN (${seqValues(f.value).map(lit(_, dialect)).mkString(", ")})"
      case FilterOp.Ni =>
        s"($e NOT IN (${seqValues(f.value).map(lit(_, dialect)).mkString(", ")}) OR $e IS NULL)"
      case op if setOps(op) => setFilterSql(e, op, f.value, dialect)
      case other =>
        throw new IllegalArgumentException(s"filter op '$other' is not SQL-compilable")
    }
  }

  private val setOps: Set[String] = FilterOp.multiArg -- Set(FilterOp.In, FilterOp.Ni)

  /** The set-label algebra (FilterOp's Catalyst formulation, rendered as
    * SQL with identical null semantics): make_set turns a NULL column
    * into the empty set and — for string sets — discards empty-string
    * elements; every leaf predicate below is coalesced to a non-NULL
    * boolean, so NOT compositions stay two-valued.
    *
    * Membership tests render as `array_contains` chains (a spelling
    * shared by Spark and DuckDB, where it aliases list_contains); only
    * the universally-quantified ops (subsetof/equals/hasonly and their
    * negations) need the per-dialect `listForall` lambda. A NULL element
    * in the FILTER SET throws — the reference's make_set never produces
    * one from a URL, and cross-engine NULL-in-array equality is exactly
    * the kind of edge this compiler refuses rather than approximates.
    */
  private def setFilterSql(arr: String, op: String, value: Any, dialect: Dialect): String = {
    import FilterOp._
    val raw = seqValues(value)
    require(!raw.contains(null), s"set filter '$op' with a NULL element is not SQL-compilable")
    val stringy = raw.forall(_.isInstanceOf[String])
    val vs = raw.distinct.filterNot(v => stringy && v == "")
    // array_contains(NULL, v) / v = ANY(NULL) is NULL; make_set(NULL) = ∅
    // must not contain anything -> the dialect spelling coalesces FALSE
    def contains(v: Any) = dialect.arrayContains(arr, lit(v, dialect))
    def hasAll = if (vs.isEmpty) "TRUE" else vs.map(contains).mkString("(", " AND ", ")")
    def hasAny = if (vs.isEmpty) "FALSE" else vs.map(contains).mkString("(", " OR ", ")")
    // col ⊆ S: every element is in S — with a NULL element never matching
    // (array_except keeps it on the Catalyst path, failing the subset) and
    // '' ignored for string sets (make_set discards it from the col side)
    def subsetOf = {
      val memb =
        if (vs.isEmpty) { if (stringy) "x = ''" else "FALSE" }
        else {
          val in = s"x IN (${vs.map(lit(_, dialect)).mkString(", ")})"
          if (stringy) s"($in OR x = '')" else in
        }
      dialect.listForall(arr, s"x IS NOT NULL AND $memb").getOrElse(
        throw new IllegalArgumentException(
          s"filter op '$op' needs an array-forall spelling; dialect '${dialect.name}' has " +
            "none (use Dialect.SparkSql / Dialect.DuckDb, or fall back to Catalyst)"))
    }
    op match {
      case HasAll | SupersetOf       => hasAll
      case HasNotAll | NotSupersetOf => s"(NOT $hasAll)"
      case HasAny | Intersects       => hasAny
      case HasNone | DisjointFrom    => s"(NOT $hasAny)"
      case SubsetOf                  => subsetOf
      case NotSubsetOf               => s"(NOT $subsetOf)"
      case Equals | HasOnly          => s"($hasAll AND $subsetOf)"
      case NotEquals                 => s"(NOT ($hasAll AND $subsetOf))"
      case other =>
        throw new IllegalArgumentException(s"set filter op '$other' is not SQL-compilable")
    }
  }

  private def seqValues(v: Any): Seq[Any] = v match {
    case s: Seq[_] => s
    case other     => Seq(other)
  }

  private def lit(v: Any, dialect: Dialect): String = v match {
    case null                     => "NULL"
    case s: String                => dialect.stringLit(s)
    case d: java.sql.Date         => s"DATE '$d'"
    case d: java.time.LocalDate   => s"DATE '$d'"
    case t: java.sql.Timestamp    => s"TIMESTAMP '$t'"
    case b: Boolean               => if (b) "TRUE" else "FALSE"
    case n: Number                => String.valueOf(n)
    case other =>
      throw new IllegalArgumentException(s"literal ${other.getClass.getName} not SQL-renderable")
  }

  /** Catalyst → SQL text for label/measure expressions, rendered by hand
    * over a validated portable subset (column refs, literals, arithmetic,
    * CAST, floor/ceil/abs/round). Anything else — Spark-only functions
    * like weekday(), regex, array ops — throws rather than silently
    * emitting dialect-specific text. (Hand-rendering matters: Spark's own
    * Expression.sql spells node-converted operators as `` `*`(a, b) ``,
    * which no target dialect parses.)
    */
  private def exprSql(c: org.apache.spark.sql.Column, dialect: Dialect): String =
    renderExpr(org.apache.spark.sql.graft.ColumnBridge.catalystExpression(c), dialect)

  private val portableFns = Set("floor", "ceil", "ceiling", "abs", "round")
  private val infixOps = Set("+", "-", "*", "/", "%")

  private def renderExpr(e: org.apache.spark.sql.catalyst.expressions.Expression,
                         dialect: Dialect): String = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    e match {
      case a: AttributeReference => a.name
      case a: UnresolvedAttribute => a.nameParts.mkString(".")
      case l: Literal => literalSql(l, dialect)
      case c: Cast => s"CAST(${renderExpr(c.child, dialect)} AS ${castTypeSql(c.dataType, dialect)})"
      case f: UnresolvedFunction =>
        val name = f.nameParts.last
        lazy val args = f.arguments.map(renderExpr(_, dialect))
        // split(col, re[, -1]): THE set-label constructor. No shared
        // spelling (Spark split is Java-regex, DuckDB regexp_split_to_array
        // is RE2) -> per-dialect; an explicit non-default limit is not
        // portable at all.
        if (name == "split" &&
            (f.arguments.length == 2 ||
             (f.arguments.length == 3 && (f.arguments(2) match {
               case Literal(-1, _) => true; case _ => false })))) {
          val rawPattern = f.arguments(1) match {
            case Literal(s, _: org.apache.spark.sql.types.StringType) if s != null =>
              Some(s.toString)
            case _ => None
          }
          dialect.splitRegex(args(0), args(1), rawPattern).getOrElse(
            throw new IllegalArgumentException(
              s"split() has no spelling in dialect '${dialect.name}' " +
                "(use Dialect.SparkSql / Dialect.DuckDb, or fall back to Catalyst)"))
        } else if (infixOps(name) && args.length == 2) s"(${args(0)} $name ${args(1)})"
        else if (portableFns(name.toLowerCase)) s"${name.toLowerCase}(${args.mkString(", ")})"
        else throw new IllegalArgumentException(
          s"function '$name' is not portable-SQL-compilable")
      // resolved arithmetic shapes (Columns built straight from expressions)
      case b: BinaryArithmetic if infixOps(b.symbol) =>
        s"(${renderExpr(b.left, dialect)} ${b.symbol} ${renderExpr(b.right, dialect)})"
      case fl: Floor => s"floor(${renderExpr(fl.child, dialect)})"
      case ce: Ceil => s"ceil(${renderExpr(ce.child, dialect)})"
      case ab: Abs => s"abs(${renderExpr(ab.child, dialect)})"
      case other => throw new IllegalArgumentException(
        s"expression node ${other.getClass.getSimpleName} is not portable-SQL-compilable")
    }
  }

  private def literalSql(l: org.apache.spark.sql.catalyst.expressions.Literal,
                         dialect: Dialect): String = {
    import org.apache.spark.sql.types._
    if (l.value == null) return "NULL"
    l.dataType match {
      case _: IntegerType | _: LongType | _: ShortType | _: DoubleType | _: FloatType =>
        String.valueOf(l.value)
      case _: StringType => lit(l.value.toString, dialect)
      case _: BooleanType => if (l.value == true) "TRUE" else "FALSE"
      case _: DateType => // stored as days since epoch
        s"DATE '${java.time.LocalDate.ofEpochDay(l.value.asInstanceOf[Int].toLong)}'"
      case other => throw new IllegalArgumentException(
        s"literal of type $other is not portable-SQL-renderable")
    }
  }

  private def castTypeSql(dt: org.apache.spark.sql.types.DataType,
                          dialect: Dialect): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => "BIGINT"
      case IntegerType => "INTEGER"
      case DoubleType => if (dialect == Dialect.Postgres) "DOUBLE PRECISION" else "DOUBLE"
      case FloatType => if (dialect == Dialect.Postgres) "REAL" else "FLOAT"
      case StringType => dialect.stringTypeName // STRING: Spark/DuckDB alias; PG: TEXT
      case DateType => "DATE"
      case TimestampType => "TIMESTAMP"
      case BooleanType => "BOOLEAN"
      case other =>
        throw new IllegalArgumentException(s"cast to $other is not portable-SQL-compilable")
    }
  }
}
