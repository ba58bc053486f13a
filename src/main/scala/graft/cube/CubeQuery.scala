package graft.cube

/** A single filter term: `(label, op, value)`. `value` is a scalar for
  * scalar ops, a Seq for multi-arg ops (in/ni and the set algebra).
  */
final case class Filter(name: String, op: String, value: Any)

/** Ordering term: direction ("+"/"-"), value name, pivot-column key
  * (bacon/cubequery.py:278 order_by).
  */
final case class Order(dir: String, name: String, pivotKey: Seq[String] = Nil) {
  def ascending: Boolean = dir == "+"
}

/** Immutable query over a CubeDef — a direct port of the reference's query
  * model (bacon/cubequery.py:57). Every mutator returns a new query, which
  * is what makes drill-down navigation (Navigator) and slice-cache lookup
  * cheap and safe.
  *
  * @param axes         group-by labels, in nesting order
  * @param valueDefs    (measure name, visible) in insertion order
  * @param filters      ANDed filter terms
  * @param hiddenValues user-hidden measures (still accumulated, not shown)
  * @param order        result ordering
  * @param pivots       subset of `axes` rendered as columns, not rows
  */
final case class CubeQuery(
    axes: Vector[String] = Vector.empty,
    valueDefs: Vector[(String, Boolean)] = Vector.empty,
    filters: Vector[Filter] = Vector.empty,
    hiddenValues: Vector[String] = Vector.empty,
    order: Vector[Order] = Vector.empty,
    pivots: Set[String] = Set.empty,
    limit: Option[Int] = None,
    offset: Option[Int] = None,
) {
  def dim: Int = axes.length

  /** Visible values: declared visible and not user-hidden. */
  def values: Vector[String] =
    valueDefs.collect { case (n, true) if !hiddenValues.contains(n) => n }

  def allValues: Vector[String] = valueDefs.map(_._1)

  /** Values that must be accumulated in a slice: everything not user-hidden
    * (bacon/cutting.py:752 _get_values_in_slice).
    */
  def valuesInSlice: Vector[String] = allValues.filterNot(hiddenValues.contains)

  def pivot: Vector[String] = axes.filter(pivots.contains)
  def rowAxes: Vector[String] = axes.filterNot(pivots.contains)

  def hasAxis(axis: String): Boolean =
    axes.contains(axis) || filters.exists(_.name == axis)

  /** bacon/cubequery.py:225 — axis or eq-filtered. */
  def usesAxis(label: String): Boolean =
    axes.contains(label) || filters.exists(f => f.name == label && f.op == FilterOp.Eq)

  def addAxis(name: String, before: Option[String] = None, after: Option[String] = None): CubeQuery = {
    val pos = (before, after) match {
      case (None, None)    => axes.length - pivots.size
      case (_, Some(a))    => axes.indexOf(a) + 1
      case (Some(b), None) => axes.indexOf(b)
    }
    copy(axes = (axes.take(pos) :+ name) ++ axes.drop(pos))
  }

  def removeAxis(name: String): CubeQuery = {
    val q = copy(axes = axes.filterNot(_ == name))
    if (pivots.contains(name))
      q.copy(pivots = pivots - name, order = order.map(o => if (o.pivotKey.nonEmpty) o.copy(pivotKey = Nil) else o))
    else q
  }

  def addValue(name: String, visible: Boolean = true): CubeQuery =
    removeValue(name).copy(valueDefs = removeValue(name).valueDefs :+ (name -> visible))

  def removeValue(name: String): CubeQuery = {
    val i = valueDefs.indexWhere(_._1 == name)
    if (i < 0) this else copy(valueDefs = valueDefs.patch(i, Nil, 1))
  }

  def addFilter(name: String, value: Any, op: String = FilterOp.Eq): CubeQuery = {
    val f = Filter(name, op, value)
    if (filters.contains(f)) this else copy(filters = filters :+ f)
  }

  def removeFilter(name: String): CubeQuery =
    copy(filters = filters.filterNot(_.name == name))

  def removeFilterExact(name: String, op: String, value: Any): CubeQuery =
    copy(filters = filters.filterNot(_ == Filter(name, op, value)))

  def swapFilter(name: String, value: Any, op: String, newOp: String): CubeQuery =
    copy(filters = filters.map(f => if (f == Filter(name, op, value)) Filter(name, newOp, value) else f))

  def invertFilter(name: String, value: Any, op: String): CubeQuery =
    swapFilter(name, value, op, FilterOp.invert(op))

  def relatedFilters(name: String, value: Any, op: String): Map[String, CubeQuery] =
    FilterOp.related(op).map(o => o -> swapFilter(name, value, op, o)).toMap

  /** bacon/cubequery.py:202 — (from, to) bounds implied by ge/le/eq filters. */
  def getRange(axis: String): (Option[Any], Option[Any]) = {
    var from: Option[Any] = None
    var to: Option[Any] = None
    filters.foreach { f =>
      if (f.name == axis) f.op match {
        case FilterOp.Ge => from = Some(f.value)
        case FilterOp.Le => to = Some(f.value)
        case FilterOp.Eq => from = Some(f.value); to = Some(f.value)
        case _           =>
      }
    }
    (from, to)
  }

  def getFilter(axis: String, wantedOp: String = FilterOp.Eq): Option[Any] =
    filters.find(f => f.name == axis && f.op == wantedOp).map(_.value)

  def hideValue(name: String): CubeQuery =
    if (hiddenValues.contains(name)) this else copy(hiddenValues = hiddenValues :+ name)

  def showValue(name: String): CubeQuery =
    copy(hiddenValues = hiddenValues.filterNot(_ == name))

  def setPivot(name: String): CubeQuery =
    copy(
      axes = axes.filterNot(_ == name) :+ name,
      pivots = pivots + name,
      order = order.map(o => if (o.pivotKey.nonEmpty) o.copy(pivotKey = Nil) else o),
    )

  def unsetPivot(name: String): CubeQuery =
    copy(
      pivots = pivots - name,
      order = order.map(o => if (o.pivotKey.nonEmpty) o.copy(pivotKey = Nil) else o),
    )

  /** `name` may be prefixed with "-" for descending. */
  def orderBy(name: String, pivotKey: Seq[String] = Nil): CubeQuery =
    if (name.startsWith("-")) copy(order = Vector(Order("-", name.drop(1), pivotKey)))
    else copy(order = Vector(Order("+", name, pivotKey)))

  def noOrder: CubeQuery = copy(order = Vector.empty)

  def setLimit(n: Int): CubeQuery = copy(limit = Some(n))
  def setOffset(n: Int): CubeQuery = copy(offset = Some(n))
}
