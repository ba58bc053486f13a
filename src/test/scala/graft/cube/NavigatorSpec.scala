package graft.cube

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class NavigatorSpec extends AnyFunSuite {

  // day -> month -> quarter -> year hierarchy + an unrelated label
  private val cube = CubeDef(
    labels = Seq(
      Label("year", col("d"), dimension = Some("time")),
      Label("quarter", col("d"), childOf = Seq("year"), dimension = Some("time")),
      Label("month", col("d"), childOf = Seq("quarter"), dimension = Some("time")),
      Label("day", col("d"), childOf = Seq("month"), dimension = Some("time")),
      Label("flag", col("f")),
      Label("secret", col("s"), hidden = true),
    ),
    measures = Seq(Measure("n")))

  test("hierarchy reachability") {
    assert(cube.ancestors("day") == Set("month", "quarter", "year"))
    assert(cube.descendants("year") == Set("quarter", "month", "day"))
    assert(cube.connected("month").contains("year"))
    assert(cube.rank("day") == 3 && cube.rank("year") == 0)
  }

  test("expansion allowed for unused dimension") {
    val nav = new Navigator(cube, CubeQuery().addAxis("flag"))
    assert(nav.expandIfYouCan(nav.query, cube.label("month")).isDefined)
  }

  test("expansion keeps hierarchy order: ancestor inserted before used descendant") {
    val q = CubeQuery().addAxis("month")
    val nav = new Navigator(cube, q)
    val expanded = nav.expandIfYouCan(q, cube.label("year"))
    assert(expanded.map(_.axes).contains(Vector("year", "month")))
  }

  test("expansion of descendant goes after used ancestor") {
    val q = CubeQuery().addAxis("year").addAxis("flag")
    val nav = new Navigator(cube, q)
    val expanded = nav.expandIfYouCan(q, cube.label("day"))
    assert(expanded.map(_.axes).contains(Vector("year", "day", "flag")))
  }

  test("already used label cannot be expanded; hidden labels not offered") {
    val nav = new Navigator(cube, CubeQuery().addAxis("month"))
    assert(nav.expandIfYouCan(nav.query, cube.label("month")).isEmpty)
    assert(!nav.expansions.exists(_._1.name == "secret"))
  }

  test("drill adds eq filter on first axis and drops it") {
    val nav = new Navigator(cube, CubeQuery().addAxis("year").addAxis("month"))
    val drilled = nav.drill("2020-01-01")
    assert(drilled.query.axes == Vector("month"))
    assert(drilled.query.filters == Vector(Filter("year", "eq", "2020-01-01")))
  }

  test("filter manipulations expose remove/invert/related") {
    val nav = new Navigator(cube, CubeQuery().addFilter("flag", "x", FilterOp.Eq))
    val f = nav.filters.head
    assert(f.queryWithout.filters.isEmpty)
    assert(f.queryInvert.filters.head.op == FilterOp.Ne)
    assert(f.queryRelated.keySet.contains(FilterOp.Gt))
  }

  // ---- manipulation surface parity (bacon/cubenav.py:152-337) -------

  private val cube2 = cube.withMeasure(Measure("extra", col("e"), Agg.Sum, showByDefault = false))

  test("removeDimensionFilters clears every filter in the label's dimension") {
    val q = CubeQuery().addAxis("month")
      .addFilter("year", "2020", FilterOp.Eq)
      .addFilter("day", "2020-05-01", FilterOp.Ge)
      .addFilter("flag", "x", FilterOp.Eq)
    val nav = new Navigator(cube, q)
    val cleared = nav.removeDimensionFilters("month")
    assert(cleared.filters == Vector(Filter("flag", "eq", "x")))
    // a label with no dimension leaves the query unchanged (reference behavior)
    assert(nav.removeDimensionFilters("flag") == q)
  }

  test("hideLabeledValue starts an ni filter then merges into it") {
    val nav = new Navigator(cube, CubeQuery().addAxis("flag"))
    val q1 = nav.hideLabeledValue("flag", "x")
    assert(q1.filters == Vector(Filter("flag", "ni", Seq("x"))))
    val q2 = new Navigator(cube, q1).hideLabeledValue("flag", "y")
    assert(q2.filters.head.op == FilterOp.Ni)
    assert(q2.filters.head.value.asInstanceOf[Seq[_]].toSet == Set("x", "y"))
    // re-hiding the same value does not duplicate it
    val q3 = new Navigator(cube, q2).hideLabeledValue("flag", "x")
    assert(q3.filters.head.value.asInstanceOf[Seq[_]].toSet == Set("x", "y"))
    // a hand-built ni filter with a Set value merges flat, never nests
    val qSet = CubeQuery().addAxis("flag").addFilter("flag", Set("x", "y"), FilterOp.Ni)
    val q4 = new Navigator(cube, qSet).hideLabeledValue("flag", "z")
    val merged = q4.filters.head.value.asInstanceOf[Seq[_]]
    assert(merged.toSet == Set("x", "y", "z"))
    assert(merged.forall(!_.isInstanceOf[Iterable[_]]), "Set value must not nest")
  }

  test("rowFilter carries the row's cells as eq filters plus current filters") {
    val nav = new Navigator(cube,
      CubeQuery().addAxis("year").addAxis("flag").addValue("n")
        .addFilter("month", "2020-05", FilterOp.Eq))
    val q = nav.rowFilter(Seq("year" -> "2020", "flag" -> "x"))
    assert(q.axes.isEmpty && q.values.isEmpty)
    assert(q.filters.toSet == Set(
      Filter("year", "eq", "2020"), Filter("flag", "eq", "x"),
      Filter("month", "eq", "2020-05")))
  }

  test("hiddenValues lists not-shown-by-default measures and query-hidden values") {
    val q = CubeQuery().addValue("n").hideValue("n")
    val nav = new Navigator(cube2, q)
    val hv = nav.hiddenValues.map { case (m, q2) => m.name -> q2 }.toMap
    assert(hv.keySet == Set("extra", "n"))
    assert(hv("extra").allValues.contains("extra")) // reveal = add the value
    assert(hv("n").hiddenValues.isEmpty)            // reveal = unhide
  }

  test("hideValue removes not-shown-by-default measures and resets order on the hidden value") {
    val q = CubeQuery().addValue("n").addValue("extra").orderBy("-extra")
    val nav = new Navigator(cube2, q)
    val hidden = nav.hideValue("extra")
    assert(!hidden.allValues.contains("extra")) // removed, not just hidden
    assert(hidden.order.isEmpty)                // ordering by it was reset
    val hidden2 = nav.hideValue("n")
    assert(hidden2.hiddenValues == Vector("n") && hidden2.order.nonEmpty)
  }

  test("setPivot respects allowPivot") {
    val c = cube.withLabel(Label("nopiv", col("p"), allowPivot = false))
    val q = CubeQuery().addAxis("nopiv").addAxis("flag")
    val nav = new Navigator(c, q)
    assert(nav.setPivot("nopiv") == q)          // ignored, not bombing
    assert(nav.setPivot("flag").pivot == Vector("flag"))
  }

  test("UrlMaker: toggles, no-op Nones, and typed URLs") {
    val q = CubeQuery().addAxis("flag").addValue("n").orderBy("-n")
    val mk = new UrlMaker(new Navigator(cube, q))
    assert(mk.pivotUrl("flag").contains("p:flag"))
    assert(mk.orderUrl("n").isEmpty)            // already ordered desc by n
    assert(mk.orderAscUrl("n").exists(_.contains("o:n")))
    assert(mk.resetOrderUrl.isDefined)
    assert(mk.filterUrl("flag", "x") == "f:flag:x/v:n/o:-n") // axis dropped
    assert(mk.hideLabeledValueUrl("flag", "x").contains("f:flag:ni:x"))
    assert(new UrlMaker(new Navigator(cube, q.noOrder)).resetOrderUrl.isEmpty)
  }
}
