package graft.cube

import org.scalatest.funsuite.AnyFunSuite

class UrlQueryBuilderSpec extends AnyFunSuite {
  import UrlQueryBuilder._

  test("parse basic commands") {
    val q = parse("a:flag/v:qty/f:status:O/o:-qty/l:10")
    assert(q.axes == Vector("flag"))
    assert(q.values == Vector("qty"))
    assert(q.filters == Vector(Filter("status", "eq", "O")))
    assert(q.order == Vector(Order("-", "qty")))
    assert(q.limit.contains(10))
  }

  test("filter with explicit op and multi-arg op") {
    val q = parse("f:x:gt:5/f:tags:hasany:a:b:c/f:tags:hasonly:p:q")
    assert(q.filters(0) == Filter("x", "gt", "5"))
    assert(q.filters(1) == Filter("tags", "hasany", Vector("a", "b", "c")))
    assert(q.filters(2) == Filter("tags", "hasonly", Vector("p", "q")))
  }

  test("escaped separators in values") {
    val q = parse("""f:name:a\:b\/c""")
    assert(q.filters.head == Filter("name", "eq", "a:b/c"))
  }

  test("round trip") {
    val q = CubeQuery()
      .addFilter("status", "O")
      .addFilter("x", "5", FilterOp.Gt)
      .addFilter("tags", Vector("a", "b"), FilterOp.HasAny)
      .addAxis("flag").setPivot("p").addValue("qty").hideValue("h")
      .orderBy("-qty").setLimit(7)
    val s = toUrlString(q)
    val q2 = parse(s)
    assert(q2.axes == q.axes)
    assert(q2.pivot == q.pivot)
    assert(q2.values == q.values)
    assert(q2.hiddenValues == q.hiddenValues)
    assert(q2.order == q.order)
    assert(q2.limit == q.limit)
    assert(q2.filters.map(f => (f.name, f.op)) == q.filters.map(f => (f.name, f.op)))
  }

  test("round trip with escaping") {
    val q = CubeQuery().addFilter("name", "a:b/c\\d")
    val q2 = parse(toUrlString(q))
    assert(q2.filters.head.value == "a:b/c\\d")
  }

  test("unknown command raises") {
    intercept[IllegalArgumentException](parse("zz:boom"))
  }

  // ---- typed parse/unparse through label codecs --------------------

  private val today = java.time.LocalDate.of(2026, 8, 12)
  private def dateCube = CubeDef(
    labels = DateLabels.hierarchy("d", dim = "t"),
    measures = Seq(Measure("n", org.apache.spark.sql.functions.lit(1), Agg.Count)))

  test("relative date tokens parse to the period start (reference _re_delta)") {
    val q = parse("a:d_month/v:n/f:d_month:-6", dateCube, today)
    assert(q.filters.head.value == java.sql.Date.valueOf("2026-02-01"))
    val w = parse("f:d_week:-1", dateCube, today) // week of 2026-08-10 minus 1
    assert(w.filters.head.value == java.sql.Date.valueOf("2026-08-03"))
    val d = parse("f:d_day:-30", dateCube, today)
    assert(d.filters.head.value == java.sql.Date.valueOf("2026-07-13"))
    val qq = parse("f:d_quarter:-2", dateCube, today) // Q3 2026 minus 2 = Q1
    assert(qq.filters.head.value == java.sql.Date.valueOf("2026-01-01"))
  }

  test("absolute date tokens parse per unit format and snap to period start") {
    val q = parse("f:d_month:1997-06/f:d_day:ge:1997-03-01/f:d_year:1997/f:d_quarter:1997-05",
      dateCube, today)
    assert(q.filters(0).value == java.sql.Date.valueOf("1997-06-01"))
    assert(q.filters(1).value == java.sql.Date.valueOf("1997-03-01") && q.filters(1).op == "ge")
    assert(q.filters(2).value == java.sql.Date.valueOf("1997-01-01"))
    assert(q.filters(3).value == java.sql.Date.valueOf("1997-04-01")) // snapped to Q2
  }

  test("part codecs range-check and parse ints; typed round trip") {
    val q = parse("f:d_moy:12/f:d_weekday:1", dateCube, today)
    assert(q.filters(0).value == 12 && q.filters(1).value == 1)
    intercept[IllegalArgumentException](parse("f:d_moy:13", dateCube, today))

    val rt = parse("f:d_month:1997-06/f:d_moy:12/a:d_month/v:n", dateCube, today)
    val s = toUrlString(rt, dateCube)
    assert(s.contains("f:d_month:1997-06") && s.contains("f:d_moy:12"), s)
    assert(parse(s, dateCube, today) == rt) // full typed round-trip
  }

  test("bssplit respects escapes") {
    assert(bssplit("""a\:b:c""", ':') == Vector("a:b", "c"))
    assert(bssplit("a:b:c", ':') == Vector("a", "b", "c"))
  }
}
