package graft.cube

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SqlCompilerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    // tg exercises make_set's edges: a double space (empty-string element),
    // a NULL array, and overlapping word sets
    ("A", Option("x"), "2024-01-03", 1.0, Option("red blue")),
    ("A", Option.empty[String], "2024-01-20", 2.0, Option("red  green")),
    ("B", Option("x"), "2024-02-03", 4.0, Option.empty[String]),
    ("B", Option("y"), "2024-03-01", 8.0, Option("blue")),
    // duplicate element: make_set collapses it (one contribution per group)
    ("C", Option("z"), "2024-04-01", 16.0, Option("red red")),
  ).toDF("k", "s", "d", "v", "tg").withColumn("d", to_date(col("d")))

  private val cube = CubeDef(
    labels = Seq(Label("k"), Label("s"),
      Label("v_band", (floor(col("v") / 4) * 4).cast("long")),
      Label("tags", split(col("tg"), " "), isSet = true),
      Label("tags2", split(col("tg"), " "), isSet = true)) ++
      DateLabels.hierarchy("d", dim = "t"),
    measures = Seq(
      Measure("sum_v", col("v"), Agg.Sum),
      Measure("n", lit(1), Agg.Count),
      Measure("avg_v", col("v"), Agg.Avg),
      Measure("n_s", col("s"), Agg.CountDistinct)))

  private def viaSql(q: CubeQuery) = {
    df.createOrReplaceTempView("t")
    spark.sql(SqlCompiler.compile(cube, q, "t")).collect().map(_.toSeq).toSet
  }
  private def viaSlicer(q: CubeQuery) =
    Slicer.slice(df, cube, q).collect().map(_.toSeq).toSet

  test("generated SQL equals the Catalyst path across query shapes") {
    val shapes = Seq(
      CubeQuery().addAxis("k").addValue("sum_v").addValue("n"),
      CubeQuery().addAxis("k").addAxis("s").addValue("n").addValue("n_s"),
      CubeQuery().addValue("sum_v").addValue("avg_v"), // 0-dim grand total
      CubeQuery().addAxis("d_month").addValue("sum_v"), // date-trunc axis
      CubeQuery().addAxis("v_band").addValue("n"), // arithmetic label
      CubeQuery().addAxis("k").addValue("sum_v").addFilter("s", "x"), // null-safe eq
      CubeQuery().addAxis("k").addValue("n").addFilter("s", null), // eq NULL → IS NULL
      CubeQuery().addAxis("k").addValue("n").addFilter("s", "x", FilterOp.Ne), // ne keeps NULLs
      CubeQuery().addAxis("k").addValue("n").addFilter("k", Seq("A", "B"), FilterOp.In),
      CubeQuery().addAxis("k").addValue("n").addFilter("s", Seq("x"), FilterOp.Ni),
      CubeQuery().addAxis("d_month").addValue("sum_v")
        .addFilter("d_month", java.sql.Date.valueOf("2024-01-01")),
      CubeQuery().addAxis("k").addValue("sum_v").addFilter("v_band", 4L, FilterOp.Ge),
    )
    shapes.foreach { q =>
      assert(viaSql(q) == viaSlicer(q), "\n" + SqlCompiler.compile(cube, q, "t"))
    }
  }

  test("ordering/limit render with the Slicer's explicit null placement") {
    val q = CubeQuery().addAxis("s").addValue("sum_v")
      .copy(order = Vector(Order("+", "s")), limit = Some(2))
    df.createOrReplaceTempView("t")
    val sql = SqlCompiler.compile(cube, q, "t")
    assert(sql.contains("ASC NULLS FIRST") && sql.contains("LIMIT 2"))
    val got = spark.sql(sql).collect().map(_.toSeq).toList
    val want = Slicer.slice(df, cube, q).collect().map(_.toSeq).toList
    assert(got == want) // ordered compare: null-first row included both ways
  }

  test("unsupported pieces throw so callers fall back to the Catalyst path") {
    intercept[IllegalArgumentException] {
      SqlCompiler.compile(cube,
        CubeQuery().addAxis("k").addValue("n").addFilter("k", "A.*", FilterOp.Match), "t")
    }
    intercept[IllegalArgumentException] { // pivot without fixed pivotValues
      SqlCompiler.compile(cube,
        CubeQuery().addAxis("k").addAxis("s").setPivot("s").addValue("n"), "t")
    }
    intercept[IllegalArgumentException] { // weekday is a part codec, not a trunc
      SqlCompiler.compile(cube, CubeQuery().addAxis("d_weekday").addValue("n"), "t")
    }
  }

  test("pivot compiles to FILTER-ed aggregates matching the Slicer/Spark pivot") {
    df.createOrReplaceTempView("t")
    // single measure: columns named by the pivot value alone
    val q1 = CubeQuery().addAxis("k").addAxis("s").setPivot("s").addValue("sum_v")
    // two measures: value_measure naming; count must yield the same
    // missing-combination representation as Spark's pivot
    val q2 = CubeQuery().addAxis("k").addAxis("s").setPivot("s")
      .addValue("n").addValue("sum_v")
    for (q <- Seq(q1, q2); vs = Seq("x", "y")) {
      val sql = SqlCompiler.compile(cube, q, "t",
        dialect = SqlCompiler.Dialect.SparkSql, pivotValues = vs)
      val got = spark.sql(sql)
      val want = Slicer.slice(df, cube, q, pivotValues = vs)
      assert(got.columns.toSeq == want.columns.toSeq, "\n" + sql)
      assert(got.collect().map(_.toSeq).toSet == want.collect().map(_.toSeq).toSet,
        "\n" + sql)
    }
    // non-identifier pivot values quote per-dialect; Portable refuses
    val qv = CubeQuery().addAxis("k").addAxis("s").setPivot("s").addValue("n")
    val sparkSql = SqlCompiler.compile(cube, qv, "t",
      dialect = SqlCompiler.Dialect.SparkSql, pivotValues = Seq("1-a"))
    assert(sparkSql.contains("AS `1-a`"), "\n" + sparkSql)
    val duck = SqlCompiler.compile(cube, qv, "t",
      dialect = SqlCompiler.Dialect.DuckDb, pivotValues = Seq("1-a"))
    assert(duck.contains("AS \"1-a\""), "\n" + duck)
    intercept[IllegalArgumentException] {
      SqlCompiler.compile(cube, qv, "t", pivotValues = Seq("1-a")) // portable quoting
    }
  }

  test("ORDER BY a pivoted column carries the measure suffix when measures > 1") {
    df.createOrReplaceTempView("t")
    val vs = Seq("x", "y")
    // single measure: bare pivot-value column name
    val q1 = CubeQuery().addAxis("k").addAxis("s").setPivot("s").addValue("sum_v")
      .orderBy("-sum_v", pivotKey = Seq("x"))
    val sql1 = SqlCompiler.compile(cube, q1, "t",
      dialect = SqlCompiler.Dialect.SparkSql, pivotValues = vs)
    assert(sql1.contains("ORDER BY `x` DESC"), "\n" + sql1)
    // two measures: the SELECT emits x_n / x_sum_v — the sort target
    // must reference the suffixed column, not the nonexistent bare `x`
    val q2 = CubeQuery().addAxis("k").addAxis("s").setPivot("s")
      .addValue("n").addValue("sum_v").orderBy("-sum_v", pivotKey = Seq("x"))
    val sql2 = SqlCompiler.compile(cube, q2, "t",
      dialect = SqlCompiler.Dialect.SparkSql, pivotValues = vs)
    assert(sql2.contains("ORDER BY `x_sum_v` DESC"), "\n" + sql2)
    val got = spark.sql(sql2).collect().map(_.toSeq).toList
    val want = Slicer.slice(df, cube, q2, pivotValues = vs).collect().map(_.toSeq).toList
    assert(got == want, "\n" + sql2)
  }

  test("set axis compiles to a row-multiplying unnest subquery = Slicer explode") {
    df.createOrReplaceTempView("t")
    // covers: NULL array → no contribution, '' element discarded,
    // duplicate element collapsed, plain axis alongside, whole-set filter
    val shapes = Seq(
      CubeQuery().addAxis("tags").addValue("n").addValue("sum_v"),
      CubeQuery().addAxis("k").addAxis("tags").addValue("n"),
      CubeQuery().addAxis("tags").addValue("n")
        .addFilter("tags", Seq("red", "blue"), FilterOp.HasAny),
    )
    shapes.foreach { q =>
      val sql = SqlCompiler.compile(cube, q, "t", dialect = SqlCompiler.Dialect.SparkSql)
      assert(spark.sql(sql).collect().map(_.toSeq).toSet == viaSlicer(q), "\n" + sql)
    }
    // the Slicer side of the same contract, asserted absolutely: per-element
    // multiplication with make_set edges applied
    val counts = Slicer.slice(df, cube, CubeQuery().addAxis("tags").addValue("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("red" -> 3, "blue" -> 2, "green" -> 1))
    // renderings: explode vs unnest; two set axes and pivot+set refuse
    val one = CubeQuery().addAxis("tags").addValue("n")
    assert(SqlCompiler.compile(cube, one, "t", dialect = SqlCompiler.Dialect.SparkSql)
      .contains("explode(array_distinct(array_remove("))
    assert(SqlCompiler.compile(cube, one, "t", dialect = SqlCompiler.Dialect.DuckDb)
      .contains("unnest(list_distinct(list_filter("))
    intercept[IllegalArgumentException] { // portable has no unnest spelling
      SqlCompiler.compile(cube, one, "t")
    }
    intercept[IllegalArgumentException] {
      SqlCompiler.compile(cube,
        CubeQuery().addAxis("tags").addAxis("tags2").addValue("n"),
        "t", dialect = SqlCompiler.Dialect.SparkSql)
    }
    intercept[IllegalArgumentException] {
      SqlCompiler.compile(cube,
        CubeQuery().addAxis("tags").addAxis("k").setPivot("k").addValue("n"),
        "t", dialect = SqlCompiler.Dialect.SparkSql, pivotValues = Seq("A"))
    }
  }

  test("regex filters compile per-dialect; dialects without a spelling still throw") {
    val m = CubeQuery().addAxis("k").addValue("n")
      .addFilter("k", "A", FilterOp.Match)
    val nm = CubeQuery().addAxis("k").addValue("n")
      .addFilter("s", "x", FilterOp.NMatch) // s nullable → null-keep observable
    // the Spark rendering equals the Catalyst path, null semantics included
    df.createOrReplaceTempView("t")
    for (q <- Seq(m, nm)) {
      val sql = SqlCompiler.compile(cube, q, "t", dialect = SqlCompiler.Dialect.SparkSql)
      assert(spark.sql(sql).collect().map(_.toSeq).toSet == viaSlicer(q), "\n" + sql)
    }
    // the DuckDB rendering differs only in the predicate spelling
    val duck = SqlCompiler.compile(cube, nm, "t", dialect = SqlCompiler.Dialect.DuckDb)
    assert(duck.contains("(NOT regexp_matches(s, 'x') OR s IS NULL)"), "\n" + duck)
    assert(SqlCompiler.compile(cube, m, "t", dialect = SqlCompiler.Dialect.SparkSql)
      .contains("regexp_like(k, 'A')"))
    // portable has no partial-match spelling → throw, so the caller
    // falls back to Catalyst instead of silently changing meaning
    intercept[IllegalArgumentException] {
      SqlCompiler.compile(cube, m, "t", dialect = SqlCompiler.Dialect.Portable)
    }
    // Postgres compiles the validated subset to `~` with the (?p)
    // prefix (Java-default newline semantics), nmatch keeping NULLs
    val pg = SqlCompiler.compile(cube, nm, "t", dialect = SqlCompiler.Dialect.Postgres)
    assert(pg.contains("(NOT s ~ '(?p)x' OR s IS NULL)"), "\n" + pg)
    assert(SqlCompiler.compile(cube, m, "t", dialect = SqlCompiler.Dialect.Postgres)
      .contains("k ~ '(?p)A'"))
  }

  test("Postgres regex validation: Java∩ARE-identical subset passes, divergent constructs throw with the pattern named") {
    import SqlCompiler.requirePostgresSafeRegex
    // structurally identical in Java and (?p)-prefixed ARE
    for (p <- Seq("abc", "^[123]-", "a.c*d+e?", "(foo|bar)baz", "x{2,3}y{4}z{1,}",
        "[a-z0-9_.-]+@[a-z]+", "[^abc]", "end$", """1\.5""", """a\(b\)c""", "don't"))
      requirePostgresSafeRegex(p)
    // each divergent construct refuses, naming the pattern
    val bad = Seq(
      """^\d-URGENT""" -> "\\d",          // class shorthand
      """\bword\b""" -> "\\b",            // Java word boundary = ARE backspace!
      "a*?b" -> "lazy",                   // lazy quantifier
      "a{2,3}?b" -> "lazy",
      "(?i)abc" -> "'(?'",                // embedded flags
      "(?:ab)+" -> "'(?'",                // non-capturing group
      "(?=x)y" -> "'(?'",                 // lookahead
      """[\d]""" -> "backslash inside",   // bracket escape
      "[[:alpha:]]+" -> "[[:",            // POSIX class
      "[a&&b]" -> "'&&'",                 // Java class intersection
      "[]x]" -> "']'",                    // leading ] literal in POSIX only
      "a{x}" -> "numeric",                // literal-brace divergence
      "unclosed[ab" -> "unbalanced",
      "trailing\\" -> "trailing")
    bad.foreach { case (p, why) =>
      val e = intercept[IllegalArgumentException] { requirePostgresSafeRegex(p) }
      assert(e.getMessage.contains(p) || e.getMessage.toLowerCase.contains(why.toLowerCase),
        s"pattern=$p message=${e.getMessage}")
      assert(e.getMessage.contains("postgres"), e.getMessage)
    }
  }

  test("Postgres dialect golden renderings mirror the s01-s07 gate shapes") {
    import SqlCompiler.Dialect.Postgres
    // s01 shape (portable surface) compiles unchanged semantics for PG
    val s01 = graft.Queries.s01Sql
    assert(s01.contains("date_trunc('month', o_orderdate)"))
    // s02 shape: match + nmatch over the validated subset → ~ with (?p)
    val s02 = graft.Queries.s02Sql(Postgres)
    assert(s02.contains("o_orderpriority ~ '(?p)^[123]-'"), "\n" + s02)
    assert(s02.contains("(NOT o_orderstatus ~ '(?p)F' OR o_orderstatus IS NULL)"), "\n" + s02)
    // s03 shape: membership ops → `= ANY` with the make_set null contract,
    // split constructor → regexp_split_to_array with the validated pattern
    val s03 = graft.Queries.s03Sql(Postgres)
    assert(s03.contains("coalesce('red' = ANY(regexp_split_to_array(p_name, '(?p) ')), FALSE)"),
      "\n" + s03)
    assert(s03.contains("NOT (coalesce('small' = ANY("), "\n" + s03)
    // s04 shape: universal quantification → unnest anti-EXISTS
    val s04 = graft.Queries.s04Sql(Postgres)
    assert(s04.contains("NOT EXISTS (SELECT 1 FROM unnest(") &&
      s04.contains("AS __fa(x) WHERE NOT (x IS NOT NULL AND (x IN ("), "\n" + s04)
    // s05 shape: the \d pattern is OUTSIDE the identical subset — the
    // compile refuses specifically, naming the pattern (not wholesale)
    val e = intercept[IllegalArgumentException] { graft.Queries.s05Sql(Postgres) }
    assert(e.getMessage.contains("""^\d-(URGENT|HIGH)"""), e.getMessage)
    // s06 shape: pivot FILTER-ed aggregates with PG identifier quoting
    val s06 = graft.Queries.s06Sql(Postgres)
    assert(s06.contains("FILTER (WHERE o_orderpriority IS NOT DISTINCT FROM '1-URGENT')"),
      "\n" + s06)
    assert(s06.contains("AS \"1-URGENT_n_orders\""), "\n" + s06)
    // s07 shape: set axis → SRF unnest of a deduped, ''-filtered ARRAY()
    val s07 = graft.Queries.s07Sql(Postgres)
    assert(s07.contains(
      "unnest(ARRAY(SELECT DISTINCT __u.x FROM unnest(regexp_split_to_array(p_name, '(?p) ')) " +
        "AS __u(x) WHERE __u.x <> '')) AS \"name_words\""), "\n" + s07)
    // a non-literal split pattern cannot be validated → refuse
    val dynCube = CubeDef(
      labels = Seq(Label("k"),
        Label("dyn", expr("split(tg, s)"), isSet = true)),
      measures = Seq(Measure("n", lit(1), Agg.Count)))
    intercept[IllegalArgumentException] {
      SqlCompiler.compile(dynCube,
        CubeQuery().addAxis("k").addValue("n")
          .addFilter("dyn", Seq("red"), FilterOp.HasAny), "t", dialect = Postgres)
    }
  }

  test("string literals escape per-dialect: backslashes survive Spark's parser") {
    // '\d' in a filter pattern: Spark's parser eats single backslashes in
    // string literals, so the SparkSql rendering must double them — the
    // executed pattern then equals what DuckDB receives verbatim
    val q = CubeQuery().addAxis("k").addValue("n")
      .addFilter("k", """^\w$""", FilterOp.Match)
    df.createOrReplaceTempView("t")
    val sparkSql = SqlCompiler.compile(cube, q, "t", dialect = SqlCompiler.Dialect.SparkSql)
    assert(sparkSql.contains("""regexp_like(k, '^\\w$')"""), "\n" + sparkSql)
    assert(spark.sql(sparkSql).collect().map(_.toSeq).toSet == viaSlicer(q), "\n" + sparkSql)
    // DuckDB (standard_conforming_strings) keeps the backslash literal
    val duck = SqlCompiler.compile(cube, q, "t", dialect = SqlCompiler.Dialect.DuckDb)
    assert(duck.contains("""regexp_matches(k, '^\w$')"""), "\n" + duck)
    // quotes double everywhere (a genuine escape in Spark 4 and DuckDB,
    // not adjacent-literal concatenation — probed on both engines)
    val eq = CubeQuery().addAxis("k").addValue("n").addFilter("s", "it's")
    val eqSql = SqlCompiler.compile(cube, eq, "t", dialect = SqlCompiler.Dialect.SparkSql)
    assert(eqSql.contains("s = 'it''s'"), "\n" + eqSql)
    assert(spark.sql(eqSql).collect().map(_.toSeq).toSet == viaSlicer(eq))
    // no portable spelling for a backslash literal → refuse, don't diverge
    intercept[IllegalArgumentException] {
      SqlCompiler.compile(cube,
        CubeQuery().addAxis("k").addValue("n").addFilter("s", """a\b"""), "t")
    }
  }

  test("set-label filters match the Catalyst path across the whole algebra") {
    // every set op over a corpus with a NULL array (make_set -> ∅), an
    // empty-string element (discarded for string sets) and duplicates
    val ops = Seq(
      FilterOp.HasAll -> Seq("red"),
      FilterOp.HasNotAll -> Seq("red"),
      FilterOp.HasAny -> Seq("red", "green"),
      FilterOp.HasNone -> Seq("red", "green"),
      FilterOp.Intersects -> Seq("blue"),
      FilterOp.DisjointFrom -> Seq("blue"),
      FilterOp.SupersetOf -> Seq("red", "blue"),
      FilterOp.NotSupersetOf -> Seq("red", "blue"),
      FilterOp.SubsetOf -> Seq("red", "blue"),
      FilterOp.NotSubsetOf -> Seq("red", "blue"),
      FilterOp.SubsetOf -> Seq("red", "green"),
      FilterOp.Equals -> Seq("red", "blue"),
      FilterOp.NotEquals -> Seq("red", "blue"),
      FilterOp.HasOnly -> Seq("blue"),
      FilterOp.Equals -> Seq("red", "green"), // '' in col must not break equality
    )
    df.createOrReplaceTempView("t")
    ops.foreach { case (op, set) =>
      val q = CubeQuery().addAxis("k").addValue("n").addFilter("tags", set, op)
      val sql = SqlCompiler.compile(cube, q, "t", dialect = SqlCompiler.Dialect.SparkSql)
      assert(spark.sql(sql).collect().map(_.toSeq).toSet == viaSlicer(q),
        s"\nop=$op set=$set\n$sql")
    }
  }

  test("set-label rendering: shared contains spelling, per-dialect split/forall") {
    val member = CubeQuery().addAxis("k").addValue("n")
      .addFilter("tags", Seq("red"), FilterOp.HasAll)
    val forall = CubeQuery().addAxis("k").addValue("n")
      .addFilter("tags", Seq("red", "blue"), FilterOp.SubsetOf)
    val spark_ = SqlCompiler.compile(cube, member, "t", dialect = SqlCompiler.Dialect.SparkSql)
    val duck = SqlCompiler.compile(cube, member, "t", dialect = SqlCompiler.Dialect.DuckDb)
    // the predicate spelling is shared; only the split constructor differs
    assert(spark_.contains("coalesce(array_contains(split(tg, ' '), 'red'), FALSE)"), "\n" + spark_)
    assert(duck.contains("coalesce(array_contains(regexp_split_to_array(tg, ' '), 'red'), FALSE)"), "\n" + duck)
    val duckForall = SqlCompiler.compile(cube, forall, "t", dialect = SqlCompiler.Dialect.DuckDb)
    assert(duckForall.contains("list_aggregate(list_transform(") &&
      duckForall.contains("'bool_and'"), "\n" + duckForall)
    // no spelling in the portable intersection -> throw, Catalyst fallback
    intercept[IllegalArgumentException] {
      SqlCompiler.compile(cube, member, "t", dialect = SqlCompiler.Dialect.Portable)
    }
    // NULL elements in the filter set refuse rather than approximate
    intercept[IllegalArgumentException] {
      SqlCompiler.compile(cube,
        CubeQuery().addAxis("k").addValue("n")
          .addFilter("tags", Seq("red", null), FilterOp.HasAny), "t",
        dialect = SqlCompiler.Dialect.SparkSql)
    }
  }

  test("the s01 gate string is stable, portable SQL") {
    val sql = graft.Queries.s01Sql
    assert(sql.contains("CAST(date_trunc('month', o_orderdate) AS DATE) AS o_orderdate_month"))
    assert(sql.contains("count(*) AS n_orders"))
    assert(sql.contains("round(sum(o_totalprice), 2) AS sum_total"))
    assert(sql.contains("count(DISTINCT o_custkey) AS n_cust"))
    assert(sql.contains("o_orderpriority IN ('1-URGENT', '2-HIGH')"))
    assert(!sql.contains("`")) // no Spark-only quoting leaks into the text
  }
}
