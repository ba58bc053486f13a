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

  test("bssplit respects escapes") {
    assert(bssplit("""a\:b:c""", ':') == Vector("a:b", "c"))
    assert(bssplit("a:b:c", ':') == Vector("a", "b", "c"))
  }
}
