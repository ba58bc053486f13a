package graft.cube

/** Interactive navigation over a cube — the drill-down logic of the
  * reference Navigator (bacon/cubenav.py:18). Pure query manipulation;
  * execution stays in the Slicer.
  */
final class Navigator(val cubedef: CubeDef, val query: CubeQuery) {

  def withQuery(q: CubeQuery): Navigator = new Navigator(cubedef, q)

  /** All labels with, per label, the expanded query if that label can be
    * added as an axis (bacon/cubenav.py:49 iter_expansions). Labels are
    * offered in (dimension, rank) order; hidden labels are skipped.
    */
  def expansions: Seq[(Label, Option[CubeQuery])] = {
    val labels = cubedef.labels
      .filterNot(_.hidden)
      .sortBy(l => (l.dimension.getOrElse("￿"), cubedef.rank(l.name)))
    labels.map(l => l -> expandIfYouCan(query, l))
  }

  /** bacon/cubenav.py:59 _expand_if_you_can — a label can be added iff its
    * dimension's already-used labels form a chain with it (hierarchies
    * must stay totally ordered along an axis path).
    */
  def expandIfYouCan(q: CubeQuery, label: Label): Option[CubeQuery] = {
    val name = label.name
    val used = q.axes.toSet
    if (used.contains(name)) return None

    val dimLabels = cubedef.connected(name)
    val usedInDim = dimLabels & used
    if (usedInDim.isEmpty) return Some(q.addAxis(name))

    val anc = cubedef.ancestors(name)
    val des = cubedef.descendants(name)
    if (!usedInDim.subsetOf(anc | des)) return None

    val usedDes = des & usedInDim
    if (usedDes.nonEmpty) {
      val ref = usedDes.minBy(cubedef.rank)
      return Some(q.addAxis(name, before = Some(ref)))
    }
    val usedAnc = anc & usedInDim
    if (usedAnc.nonEmpty) {
      val ref = usedAnc.maxBy(cubedef.rank)
      return Some(q.addAxis(name, after = Some(ref)))
    }
    Some(q.addAxis(name))
  }

  /** Current filters with their manipulation targets (remove / invert /
    * related variants) — bacon/cubenav.py:96 iter_filters.
    */
  final case class CurrentFilter(
      name: String, op: String, value: Any,
      queryWithout: CubeQuery, queryInvert: CubeQuery,
      queryRelated: Map[String, CubeQuery])

  def filters: Seq[CurrentFilter] =
    query.filters.map { f =>
      CurrentFilter(f.name, f.op, f.value,
        queryWithout = query.removeFilterExact(f.name, f.op, f.value),
        queryInvert = query.invertFilter(f.name, f.value, f.op),
        queryRelated = query.relatedFilters(f.name, f.value, f.op))
    }

  /** Drill: filter on a value of the first axis and drop that axis —
    * the click-through the reference optimizes with DrillOnFirstAxis
    * (bacon/cutting.py:274); with Spark the finer slice can simply be
    * persisted and re-aggregated (Slicer.Reagg).
    */
  def drill(value: Any): Navigator = {
    require(query.axes.nonEmpty, "cannot drill a 0-dimensional query")
    val first = query.axes.head
    withQuery(query.addFilter(first, value).removeAxis(first))
  }
}
