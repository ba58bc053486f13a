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
  * Sum/Min/Max/Count/CountDistinct/Avg measures, ordering with the
  * Slicer's null placement, limit/offset. match/nmatch compile only for
  * a `dialect` with a regex spelling (no spelling is shared: Spark has
  * regexp_like, DuckDB has regexp_matches, and Postgres `~` is POSIX —
  * different regex semantics — so it stays unsupported). Anything else —
  * set-label filters, pivots, sketch accumulators — throws
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
      * no spelling with those semantics.
      */
    def regexMatch(e: String, patternLit: String): Option[String]
  }
  object Dialect {
    case object Portable extends Dialect("portable") {
      def regexMatch(e: String, p: String): Option[String] = None
    }
    case object SparkSql extends Dialect("spark") {
      def regexMatch(e: String, p: String): Option[String] =
        Some(s"regexp_like($e, $p)") // Java regex, find-anywhere
    }
    case object DuckDb extends Dialect("duckdb") {
      def regexMatch(e: String, p: String): Option[String] =
        Some(s"regexp_matches($e, $p)") // RE2, find-anywhere
    }
    /** Postgres `~` is POSIX ERE — classes like \d and lazy quantifiers
      * behave differently from the Java/RE2 patterns graft queries carry,
      * so regex filters refuse rather than silently change meaning.
      */
    case object Postgres extends Dialect("postgres") {
      def regexMatch(e: String, p: String): Option[String] = None
    }
  }

  /** Render `q` over `table`. `roundDp` optionally wraps a measure in
    * round(_, dp) — floating-point sums differ across engines in the
    * last bits (summation order), so cross-engine comparisons round,
    * same as every float-valued oracle in the gate.
    */
  def compile(cube: CubeDef, q: CubeQuery, table: String,
              roundDp: Map[String, Int] = Map.empty,
              dialect: Dialect = Dialect.Portable): String = {
    require(q.pivot.isEmpty, "pivot queries are not SQL-compilable here (use Slicer)")
    val axes = q.axes.map(a => s"${labelSql(cube, a)} AS $a")
    val aggs = q.values.map { m => s"${measureSql(cube, m, roundDp.get(m))} AS $m" }
    require(axes.nonEmpty || aggs.nonEmpty, "empty query")

    val select = (axes ++ aggs).mkString(",\n       ")
    val where = q.filters.map(filterSql(cube, _, dialect)) match {
      case Vector() => ""
      case fs       => "\nWHERE " + fs.mkString("\n  AND ")
    }
    val groupBy =
      if (q.axes.isEmpty) ""
      else "\nGROUP BY " + q.axes.map(labelSql(cube, _)).mkString(", ")
    val orderBy =
      if (q.order.isEmpty) ""
      else "\nORDER BY " + q.order.map { o =>
        // mirror Slicer.finish: asc_nulls_first / desc_nulls_last —
        // engines disagree on default null placement, so be explicit
        if (o.ascending) s"${o.name} ASC NULLS FIRST" else s"${o.name} DESC NULLS LAST"
      }.mkString(", ")
    val limit = q.limit.map(n => s"\nLIMIT $n").getOrElse("")
    val offset = q.offset.map(n => s" OFFSET $n").getOrElse("")
    s"SELECT $select\nFROM $table$where$groupBy$orderBy$limit$offset"
  }

  /** SQL for a label: the date-trunc hierarchy compiles from its codec
    * (portable `CAST(date_trunc(...))` rather than Spark's `trunc`);
    * plain/arithmetic labels render their Catalyst expression, which for
    * column refs and arithmetic is already dialect-neutral.
    */
  private def labelSql(cube: CubeDef, name: String): String = {
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
      case None => exprSql(label.expr)
    }
  }

  private def measureSql(cube: CubeDef, name: String, dp: Option[Int]): String = {
    val m = cube.measure(name)
    val e = exprSql(m.expr)
    val raw = m.agg match {
      case Agg.Sum           => s"sum($e)"
      case Agg.Min           => s"min($e)"
      case Agg.Max           => s"max($e)"
      case Agg.Count         => "count(*)" // bacon Count counts rows
      case Agg.CountDistinct => s"count(DISTINCT $e)"
      // bacon Average divides by TOTAL row count, not non-null count
      case Agg.Avg           => s"(sum($e) / count(*))"
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
    val e = labelSql(cube, f.name)
    def regex: String = dialect.regexMatch(e, lit(f.value.toString)).getOrElse(
      throw new IllegalArgumentException(
        s"filter op '${f.op}' has no regex spelling in dialect '${dialect.name}' " +
          "(use Dialect.SparkSql / Dialect.DuckDb, or fall back to Catalyst)"))
    f.op match {
      // match: NULL drops (a positive predicate, like re.search on None);
      // nmatch keeps NULL rows, mirroring FilterOp's Python semantics
      case FilterOp.Match  => regex
      case FilterOp.NMatch => s"(NOT $regex OR $e IS NULL)"
      case FilterOp.Eq => if (f.value == null) s"$e IS NULL" else s"$e = ${lit(f.value)}"
      case FilterOp.Ne =>
        if (f.value == null) s"$e IS NOT NULL"
        else s"($e <> ${lit(f.value)} OR $e IS NULL)"
      case FilterOp.Gt => s"$e > ${lit(f.value)}"
      case FilterOp.Ge => s"$e >= ${lit(f.value)}"
      case FilterOp.Lt => s"$e < ${lit(f.value)}"
      case FilterOp.Le => s"$e <= ${lit(f.value)}"
      case FilterOp.In =>
        s"$e IN (${seqValues(f.value).map(lit).mkString(", ")})"
      case FilterOp.Ni =>
        s"($e NOT IN (${seqValues(f.value).map(lit).mkString(", ")}) OR $e IS NULL)"
      case other =>
        throw new IllegalArgumentException(s"filter op '$other' is not SQL-compilable")
    }
  }

  private def seqValues(v: Any): Seq[Any] = v match {
    case s: Seq[_] => s
    case other     => Seq(other)
  }

  private def lit(v: Any): String = v match {
    case null                     => "NULL"
    case s: String                => "'" + s.replace("'", "''") + "'"
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
  private def exprSql(c: org.apache.spark.sql.Column): String =
    renderExpr(org.apache.spark.sql.graft.ColumnBridge.catalystExpression(c))

  private val portableFns = Set("floor", "ceil", "ceiling", "abs", "round")
  private val infixOps = Set("+", "-", "*", "/", "%")

  private def renderExpr(e: org.apache.spark.sql.catalyst.expressions.Expression): String = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    e match {
      case a: AttributeReference => a.name
      case a: UnresolvedAttribute => a.nameParts.mkString(".")
      case l: Literal => literalSql(l)
      case c: Cast => s"CAST(${renderExpr(c.child)} AS ${castTypeSql(c.dataType)})"
      case f: UnresolvedFunction =>
        val name = f.nameParts.last
        val args = f.arguments.map(renderExpr)
        if (infixOps(name) && args.length == 2) s"(${args(0)} $name ${args(1)})"
        else if (portableFns(name.toLowerCase)) s"${name.toLowerCase}(${args.mkString(", ")})"
        else throw new IllegalArgumentException(
          s"function '$name' is not portable-SQL-compilable")
      // resolved arithmetic shapes (Columns built straight from expressions)
      case b: BinaryArithmetic if infixOps(b.symbol) =>
        s"(${renderExpr(b.left)} ${b.symbol} ${renderExpr(b.right)})"
      case fl: Floor => s"floor(${renderExpr(fl.child)})"
      case ce: Ceil => s"ceil(${renderExpr(ce.child)})"
      case ab: Abs => s"abs(${renderExpr(ab.child)})"
      case other => throw new IllegalArgumentException(
        s"expression node ${other.getClass.getSimpleName} is not portable-SQL-compilable")
    }
  }

  private def literalSql(l: org.apache.spark.sql.catalyst.expressions.Literal): String = {
    import org.apache.spark.sql.types._
    if (l.value == null) return "NULL"
    l.dataType match {
      case _: IntegerType | _: LongType | _: ShortType | _: DoubleType | _: FloatType =>
        String.valueOf(l.value)
      case _: StringType => lit(l.value.toString)
      case _: BooleanType => if (l.value == true) "TRUE" else "FALSE"
      case _: DateType => // stored as days since epoch
        s"DATE '${java.time.LocalDate.ofEpochDay(l.value.asInstanceOf[Int].toLong)}'"
      case other => throw new IllegalArgumentException(
        s"literal of type $other is not portable-SQL-renderable")
    }
  }

  private def castTypeSql(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => "BIGINT"
      case IntegerType => "INTEGER"
      case DoubleType => "DOUBLE"
      case FloatType => "FLOAT"
      case StringType => "STRING" // alias accepted by both Spark and DuckDB
      case DateType => "DATE"
      case TimestampType => "TIMESTAMP"
      case BooleanType => "BOOLEAN"
      case other =>
        throw new IllegalArgumentException(s"cast to $other is not portable-SQL-compilable")
    }
  }
}
