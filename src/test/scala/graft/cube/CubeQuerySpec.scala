package graft.cube

import org.scalatest.funsuite.AnyFunSuite

class CubeQuerySpec extends AnyFunSuite {

  test("axes are added before pivots by default") {
    val q = CubeQuery().addAxis("a").setPivot("p").addAxis("b")
    assert(q.axes == Vector("a", "b", "p"))
    assert(q.pivot == Vector("p"))
    assert(q.rowAxes == Vector("a", "b"))
  }

  test("addAxis before/after positions") {
    val q = CubeQuery().addAxis("a").addAxis("c")
    assert(q.addAxis("b", before = Some("c")).axes == Vector("a", "b", "c"))
    assert(q.addAxis("b", after = Some("a")).axes == Vector("a", "b", "c"))
  }

  test("removeAxis clears pivot state and pivot-ordering") {
    val q = CubeQuery().addAxis("a").setPivot("p").orderBy("m", Seq("X"))
    val r = q.removeAxis("p")
    assert(!r.pivots.contains("p"))
    assert(r.order.head.pivotKey.isEmpty)
  }

  test("addValue is idempotent and preserves position on re-add") {
    val q = CubeQuery().addValue("x").addValue("y").addValue("x")
    assert(q.allValues == Vector("y", "x"))
  }

  test("hidden values are excluded from values but kept in valuesInSlice semantics") {
    val q = CubeQuery().addValue("x").addValue("y", visible = false).hideValue("x")
    assert(q.values.isEmpty)
    assert(q.valuesInSlice == Vector("y")) // user-hidden x dropped, invisible y kept
  }

  test("filter add/remove/swap/invert") {
    val q = CubeQuery().addFilter("a", 1, FilterOp.Gt)
    assert(q.addFilter("a", 1, FilterOp.Gt).filters.size == 1) // dedup
    assert(q.invertFilter("a", 1, FilterOp.Gt).filters.head.op == FilterOp.Le)
    assert(q.swapFilter("a", 1, FilterOp.Gt, FilterOp.Ge).filters.head.op == FilterOp.Ge)
    assert(q.removeFilter("a").filters.isEmpty)
  }

  test("relatedFilters covers the operator family") {
    val q = CubeQuery().addFilter("a", 1, FilterOp.Gt)
    val rel = q.relatedFilters("a", 1, FilterOp.Gt)
    assert(rel.keySet == Set("eq", "ne", "gt", "lt", "ge", "le"))
  }

  test("getRange from ge/le/eq filters") {
    val q = CubeQuery().addFilter("d", "2020-01-01", FilterOp.Ge).addFilter("d", "2020-12-31", FilterOp.Le)
    assert(q.getRange("d") == (Some("2020-01-01"), Some("2020-12-31")))
    val e = CubeQuery().addFilter("d", "x", FilterOp.Eq)
    assert(e.getRange("d") == (Some("x"), Some("x")))
  }

  test("usesAxis true for axis or eq filter only") {
    val q = CubeQuery().addAxis("a").addFilter("b", 1).addFilter("c", 1, FilterOp.Gt)
    assert(q.usesAxis("a") && q.usesAxis("b") && !q.usesAxis("c"))
  }

  test("FilterOp antonym table is involutive") {
    for (op <- FilterOp.antonym.keys if FilterOp.antonym.contains(FilterOp.antonym(op));
         if op != "hasonly")
      assert(FilterOp.invert(FilterOp.invert(op)) == op, s"op=$op")
  }
}
