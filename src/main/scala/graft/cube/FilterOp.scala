package graft.cube

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's filter-operator algebra (bacon/cubequery.py:5-54 for the
  * antonym/related tables, bacon/cutting.py:846-870 for evaluation) compiled
  * to Catalyst predicates.
  *
  * Semantics traps carried over deliberately (see SURVEY.md §3):
  *  - Python `!=`/`not in`/`not match` treat NULL as TRUE, so the negative
  *    operators here are null-safe negations, not SQL `<>`.
  *  - Set operators run through `make_set` (bacon/cutting.py:788): NULL → ∅
  *    and empty-string elements are discarded.
  */
object FilterOp {
  val Eq = "eq"; val Ne = "ne"; val Gt = "gt"; val Ge = "ge"
  val Lt = "lt"; val Le = "le"; val In = "in"; val Ni = "ni"
  val Match = "match"; val NMatch = "nmatch"
  val HasAll = "hasall"; val HasNotAll = "hasnotall"
  val HasNone = "hasnone"; val HasAny = "hasany"; val HasOnly = "hasonly"
  val SubsetOf = "subsetof"; val NotSubsetOf = "notsubsetof"
  val SupersetOf = "supersetof"; val NotSupersetOf = "notsupersetof"
  val DisjointFrom = "disjointfrom"; val Intersects = "intersects"
  val Equals = "equals"; val NotEquals = "notequals"

  private val antonymPairs = Seq(
    Eq -> Ne, Gt -> Le, Lt -> Ge, In -> Ni,
    HasAll -> HasNotAll, HasNone -> HasAny,
    SubsetOf -> NotSubsetOf, SupersetOf -> NotSupersetOf,
    DisjointFrom -> Intersects, Equals -> NotEquals,
    Match -> NMatch,
  )

  /** bacon/cubequery.py:19-21 */
  val antonym: Map[String, String] =
    (antonymPairs ++ antonymPairs.map(_.swap)).toMap + (HasOnly -> NotEquals)

  private val opSets: Seq[Set[String]] = Seq(
    Set(Eq, Ne, Gt, Lt, Ge, Le),
    Set(In, Ni),
    Set(HasAll, HasNotAll, HasNone, HasAny, SubsetOf, NotSubsetOf,
        SupersetOf, NotSupersetOf, DisjointFrom, Intersects, Equals, NotEquals),
    Set(Match, NMatch),
  )

  def invert(op: String): String = antonym(op)

  /** bacon/cubequery.py:50 */
  def related(op: String): Set[String] =
    opSets.find(_.contains(op)).getOrElse(Set.empty)

  /** Operators taking a set of values rather than a scalar
    * (bacon/constants.py MULTI_ARG_OPS = HAS_ARGS ∪ SET_ARGS — note
    * hasonly is multi-arg but not in the related-ops family).
    */
  val multiArg: Set[String] = Set(In, Ni, HasOnly) ++ opSets(2)

  private def valueCol(v: Any): Column = v match {
    case c: Column => c
    case null      => lit(null)
    case other     => lit(other)
  }

  private def arrayLit(v: Any): Column = v match {
    case c: Column       => c
    case s: Seq[_]       => array(s.map(x => lit(x)): _*)
    case s: Set[_]       => array(s.toSeq.map(x => lit(x)): _*)
    case null            => array()
    case other           => array(lit(other))
  }

  /** make_set (bacon/cutting.py:788): NULL → empty array; the reference
    * additionally discards empty-STRING elements — only applicable (and
    * only type-correct) when the filter values are strings.
    */
  private def asSet(c: Column, stringElems: Boolean): Column = {
    val nonNull = coalesce(c, array())
    array_distinct(if (stringElems) array_remove(nonNull, "") else nonNull)
  }

  private def valuesAreStrings(value: Any): Boolean = value match {
    case s: Seq[_] => s.forall(_.isInstanceOf[String])
    case s: Set[_] => s.forall(_.isInstanceOf[String])
    case s: String => true
    case _         => false
  }

  private def falseIfNull(c: Column): Column = coalesce(c, lit(false))

  /** Compile `(col OP value)` to a boolean Column. `value` may be a scalar,
    * a Seq/Set (for multi-arg ops), or a Column.
    */
  def compile(op: String, col: Column, value: Any): Column = op match {
    case Eq => col <=> valueCol(value)
    case Ne => !(col <=> valueCol(value))
    // Plain SQL comparisons: NULL rows drop out (Python would raise on
    // None < x, so there is no semantic to preserve) and — crucially —
    // the bare predicate pushes down to the parquet scan for row-group
    // pruning; a coalesce(...) wrapper would block PushedFilters.
    case Gt => col > valueCol(value)
    case Ge => col >= valueCol(value)
    case Lt => col < valueCol(value)
    case Le => col <= valueCol(value)

    case In | Ni =>
      val vs: Seq[Any] = value match {
        case s: Seq[_] => s
        case s: Set[_] => s.toSeq
        case x         => Seq(x)
      }
      val hasNull = vs.contains(null)
      val nonNull = vs.filter(_ != null)
      val base =
        if (nonNull.isEmpty) lit(false)
        else if (op == In) col.isin(nonNull: _*) // pushdown-friendly
        else falseIfNull(col.isin(nonNull: _*))
      val full = if (hasNull) base || col.isNull else base
      if (op == In) full else !full

    case Match  => col.rlike(value.toString) // NULL drops, like re.search(None) falsy
    case NMatch => !falseIfNull(col.rlike(value.toString)) // Python: not falsy -> True

    // ---- set algebra over ArrayType columns -------------------------
    case HasAll       => setCmp(col, value)((a, b) => size(array_except(b, a)) === 0)
    case HasNotAll    => !compile(HasAll, col, value)
    case HasAny       => setCmp(col, value)((a, b) => arrays_overlap(a, b))
    case HasNone      => !compile(HasAny, col, value)
    case HasOnly      => setCmp(col, value)(setEq)
    case Equals       => setCmp(col, value)(setEq)
    case NotEquals    => !compile(Equals, col, value)
    case SubsetOf     => setCmp(col, value)((a, b) => size(array_except(a, b)) === 0)
    case NotSubsetOf  => !compile(SubsetOf, col, value)
    case SupersetOf   => setCmp(col, value)((a, b) => size(array_except(b, a)) === 0)
    case NotSupersetOf => !compile(SupersetOf, col, value)
    case DisjointFrom => !compile(HasAny, col, value)
    case Intersects   => setCmp(col, value)((a, b) => arrays_overlap(a, b))

    case other => throw new IllegalArgumentException(s"unknown operator: '$other'")
  }

  private def setEq(a: Column, b: Column): Column =
    size(array_except(a, b)) === 0 && size(array_except(b, a)) === 0

  private def setCmp(col: Column, value: Any)(f: (Column, Column) => Column): Column = {
    val stringy = valuesAreStrings(value)
    f(asSet(col, stringy), asSet(arrayLit(value), stringy))
  }
}
