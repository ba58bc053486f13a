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
}
