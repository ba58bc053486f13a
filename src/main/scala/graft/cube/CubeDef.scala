package graft.cube

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Typed URL-token codec for a label — the reference's `Label.parse` /
  * `Label.unparse` (bacon/cubedef.py:345,348) that every URL filter token
  * passes through (bacon/builders/url.py:114) and every rendered value
  * passes out of (url.py:184). Without it a date filter like
  * `f:o_orderdate_month:-6` ("six months ago") would be compared as the
  * raw string "-6" and silently match nothing.
  *
  * `today` is an explicit parameter (not the wall clock) so parses are
  * reproducible in tests and cacheable by the slice cache.
  */
trait ValueCodec {
  def parse(s: String, today: java.time.LocalDate): Any
  def unparse(v: Any): String
}

object ValueCodec {
  import java.time.LocalDate
  import java.time.format.DateTimeFormatter

  /** Relative tokens: the reference treats ANY integer-looking token as
    * "N periods from now" (bacon/cubedef.py:725 `_re_delta = -?\d+$`).
    */
  private val Delta = "^-?\\d+$".r
  private def isDelta(s: String) = Delta.matches(s)

  /** reference IntTypeLabel (bacon/cubedef.py:621). */
  case object IntCodec extends ValueCodec {
    def parse(s: String, today: LocalDate): Any = s.toLong
    def unparse(v: Any): String = String.valueOf(v)
  }

  /** reference BoolTypeLabel (bacon/cubedef.py:630): "0"/"1"/""→null. */
  case object BoolCodec extends ValueCodec {
    def parse(s: String, today: LocalDate): Any = s match {
      case "0" => false; case "1" => true; case "" => null
      case other => throw new IllegalArgumentException(s"bad bool: '$other'")
    }
    def unparse(v: Any): String = v match {
      case true => "1"; case false => "0"; case null => ""
      case other => throw new IllegalArgumentException(s"bad bool: '$other'")
    }
  }

  /** reference DatetimePartLabel.parse (bacon/cubedef.py:773): a 1-based
    * integer date part, range-checked against the part's MAX_VALUE.
    */
  final case class PartCodec(max: Int) extends ValueCodec {
    def parse(s: String, today: LocalDate): Any = {
      val i = s.toInt
      require(i >= 1 && i <= max, s"date part out of range 1..$max: $i")
      i
    }
    def unparse(v: Any): String = String.valueOf(v)
  }

  /** Date-hierarchy codec for unit ∈ year/quarter/month/week/day.
    * Integer tokens are relative ("-6" = 6 periods ago, snapped to the
    * period start — bacon/cubedef.py:836,889,931,986); otherwise the
    * unit's absolute format ("%Y", "%Y-%m", "%Y-%m-%d"). Absolute values
    * are snapped to the period start too (the reference's quarter does;
    * its week doesn't — we snap both, since our filter compares against
    * the trunc'd column). Emits java.sql.Date for Catalyst DateType.
    */
  final case class DateUnitCodec(unit: String) extends ValueCodec {
    private val fmt = unit match {
      case "year"              => DateTimeFormatter.ofPattern("yyyy")
      case "quarter" | "month" => DateTimeFormatter.ofPattern("yyyy-MM")
      case _                   => DateTimeFormatter.ofPattern("yyyy-MM-dd")
    }
    private def snap(d: LocalDate): LocalDate = unit match {
      case "year"    => d.withDayOfYear(1)
      case "quarter" => d.withDayOfMonth(1).withMonth((d.getMonthValue - 1) / 3 * 3 + 1)
      case "month"   => d.withDayOfMonth(1)
      case "week"    => d.minusDays(d.getDayOfWeek.getValue - 1)
      case _         => d
    }
    def parse(s: String, today: LocalDate): Any = {
      // Year takes no relative form — a bare "1997" is the year itself
      // (reference YearLabelMixin has no _re_delta branch).
      val d =
        if (isDelta(s) && unit != "year") DateLabels.parseRelative(s, unit, today)
        else unit match {
          case "year"              => LocalDate.of(s.toInt, 1, 1)
          case "quarter" | "month" => java.time.YearMonth.parse(s, fmt).atDay(1)
          case _                   => LocalDate.parse(s, fmt)
        }
      java.sql.Date.valueOf(snap(d))
    }
    def unparse(v: Any): String = v match {
      case d: java.sql.Date      => snap(d.toLocalDate).format(fmt)
      case d: LocalDate          => snap(d).format(fmt)
      case s: String             => s
      case other                 => String.valueOf(other)
    }
  }

  /** reference HourLabel (bacon/cubedef.py:1029): "%Y-%m-%dT%H" absolute,
    * integer = hours from today midnight. Emits java.sql.Timestamp.
    */
  case object HourCodec extends ValueCodec {
    private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH")
    def parse(s: String, today: LocalDate): Any = {
      val t =
        if (isDelta(s)) today.atStartOfDay.plusHours(s.toLong)
        else java.time.LocalDateTime.parse(s, fmt)
      java.sql.Timestamp.valueOf(t)
    }
    def unparse(v: Any): String = v match {
      case t: java.sql.Timestamp => t.toLocalDateTime.format(fmt)
      case t: java.time.LocalDateTime => t.format(fmt)
      case other => String.valueOf(other)
    }
  }
}

/** A dimension/measure definition over a source DataFrame.
  *
  * Mirrors the reference Label (bacon/cubedef.py:236) but holds a Catalyst
  * Column expression instead of a Python extractor, so every label is
  * evaluated inside whole-stage codegen and can be pushed into the scan.
  *
  * @param name     query name of the label
  * @param expr     expression over the source DataFrame
  * @param title    human title (defaults from name)
  * @param childOf  hierarchy parents (coarser labels, e.g. month childOf year)
  * @param parentOf hierarchy children
  * @param dimension named dimension this label belongs to
  * @param isSet    set-valued (ArrayType) label — enables set filter ops
  * @param hidden   excluded from Navigator expansion lists
  * @param reverse  default sort direction for slice iteration
  */
final case class Label(
    name: String,
    expr: Column,
    title: Option[String] = None,
    childOf: Seq[String] = Nil,
    parentOf: Seq[String] = Nil,
    dimension: Option[String] = None,
    isSet: Boolean = false,
    hidden: Boolean = false,
    reverse: Boolean = false,
    allowPivot: Boolean = true,
    codec: Option[ValueCodec] = None,
) {
  /** Typed parse of a URL token (falls back to the raw string). */
  def parseValue(s: String, today: java.time.LocalDate): Any =
    codec.fold[Any](s)(_.parse(s, today))
  /** Typed render of a filter value back to URL-token form. */
  def unparseValue(v: Any): String =
    codec.fold(String.valueOf(v))(_.unparse(v))
  def prettyTitle: String =
    title.getOrElse(name.split('_').map(_.capitalize).mkString(" "))
  def named: Column = expr.as(name)
}

object Label {
  def apply(name: String): Label = Label(name, col(name))
}

/** An aggregatable value (bacon/cubedef.py:1047 Measure). */
final case class Measure(
    name: String,
    expr: Column,
    agg: Agg = Agg.Sum,
    title: Option[String] = None,
    showByDefault: Boolean = true,
) {
  def compiled: Column = agg.compile(expr).as(name)
}

object Measure {
  def apply(name: String): Measure = Measure(name, col(name))
  def apply(name: String, agg: Agg): Measure = Measure(name, col(name), agg)
}

/** Date hierarchy label factory — the reference's DateTruncLabel /
  * DatetimePartLabel family (bacon/cubedef.py:645-1040) as Spark exprs.
  * Truncations return DATE (comparable across engines); parts return INT.
  * The DOY label follows the reference's SQL path (`date_part('doy')`),
  * not its buggy Python path (SURVEY.md §3).
  */
object DateLabels {
  import ValueCodec.{DateUnitCodec, HourCodec, PartCodec, IntCodec}

  def year(field: String): Label =
    Label(s"${field}_year", trunc(col(field), "year"), childOf = Nil,
      codec = Some(DateUnitCodec("year")))
  def quarter(field: String): Label =
    Label(s"${field}_quarter", trunc(col(field), "quarter"), childOf = Seq(s"${field}_year"),
      codec = Some(DateUnitCodec("quarter")))
  def month(field: String): Label =
    Label(s"${field}_month", trunc(col(field), "month"), childOf = Seq(s"${field}_quarter"),
      codec = Some(DateUnitCodec("month")))
  def week(field: String): Label =  // ISO Monday trunc, own branch of the dimension
    Label(s"${field}_week", trunc(col(field), "week"), childOf = Seq(s"${field}_year"),
      codec = Some(DateUnitCodec("week")))
  def day(field: String): Label =
    Label(s"${field}_day", to_date(col(field)), childOf = Seq(s"${field}_month"),
      codec = Some(DateUnitCodec("day")))
  def hour(field: String): Label =
    Label(s"${field}_hour", date_trunc("hour", col(field)), childOf = Seq(s"${field}_day"),
      codec = Some(HourCodec))
  def weekday(field: String): Label = // ISO dow: 1=Mon..7=Sun
    Label(s"${field}_weekday", ((dayofweek(col(field)) + 5) % 7 + 1).cast("int"),
      codec = Some(PartCodec(7)))
  def monthOfYear(field: String): Label =
    Label(s"${field}_moy", org.apache.spark.sql.functions.month(col(field)),
      codec = Some(PartCodec(12)))
  def quarterNum(field: String): Label =
    Label(s"${field}_quarternum", org.apache.spark.sql.functions.quarter(col(field)),
      codec = Some(PartCodec(4)))
  def monthday(field: String): Label =
    Label(s"${field}_monthday", dayofmonth(col(field)),
      codec = Some(PartCodec(31)))
  def doy(field: String): Label =
    Label(s"${field}_doy", dayofyear(col(field)),
      codec = Some(PartCodec(366)))
  def isoWeekNum(field: String): Label =
    Label(s"${field}_isoweeknum", weekofyear(col(field)),
      codec = Some(PartCodec(53)))
  def isoYear(field: String): Label =
    Label(s"${field}_isoyear", expr(s"extract(YEAROFWEEK FROM $field)").cast("int"),
      codec = Some(IntCodec))

  /** Relative date parsing (bacon/cubedef.py:826,901,949,997 — the
    * MonthLabel/WeekLabel/DayLabel `parse` of "-6" as "6 periods ago").
    * `today` is passed explicitly so results are reproducible.
    */
  def parseRelative(s: String, unit: String, today: java.time.LocalDate): java.time.LocalDate = {
    val n = s.toInt
    unit match {
      case "day"     => today.plusDays(n)
      case "week"    => today.minusDays(today.getDayOfWeek.getValue - 1).plusWeeks(n)
      case "month"   => today.withDayOfMonth(1).plusMonths(n)
      case "quarter" =>
        val q0 = today.withDayOfMonth(1).withMonth((today.getMonthValue - 1) / 3 * 3 + 1)
        q0.plusMonths(3L * n)
      case "year"    => today.withDayOfYear(1).plusYears(n)
      case other     => throw new IllegalArgumentException(s"unknown unit: $other")
    }
  }

  /** Pretty formatters mirroring the reference's label rendering
    * (bacon/cubedef.py: MonthLabelMixin "%b %Y", QuarterLabelMixin
    * "Qn YYYY", WeekLabelMixin "dd Mon..dd Mon YYYY", DayLabelMixin
    * "Dow YYYY-MM-DD").
    */
  def prettyMonth(c: Column): Column = date_format(c, "MMM yyyy")
  def prettyQuarter(c: Column): Column =
    concat(lit("Q"), org.apache.spark.sql.functions.quarter(c), lit(" "),
      org.apache.spark.sql.functions.year(c))
  def prettyDay(c: Column): Column = date_format(c, "EEE yyyy-MM-dd")
  def prettyWeek(c: Column): Column =
    concat(date_format(trunc(c, "week"), "dd MMM"), lit(".."),
      date_format(date_add(trunc(c, "week"), 6), "dd MMM yyyy"))

  /** The full day→month→quarter→year chain plus part labels, wired as one
    * hierarchy dimension (bacon's add_hierarchy DAG).
    */
  def hierarchy(field: String, dim: String): Seq[Label] = Seq(
    year(field).copy(dimension = Some(dim)),
    quarter(field).copy(dimension = Some(dim)),
    month(field).copy(dimension = Some(dim)),
    week(field).copy(dimension = Some(dim)),
    day(field).copy(dimension = Some(dim)),
    weekday(field).copy(dimension = Some(dim)),
    monthOfYear(field).copy(dimension = Some(dim)),
    quarterNum(field).copy(dimension = Some(dim)),
    monthday(field).copy(dimension = Some(dim)),
    doy(field).copy(dimension = Some(dim)),
    isoWeekNum(field).copy(dimension = Some(dim)),
    isoYear(field).copy(dimension = Some(dim)),
  )
}

/** Schema of a cube: labels, measures and the hierarchy DAG between labels
  * (bacon/cubedef.py:61 CubeDef). Connected components of the (undirected)
  * hierarchy graph are "dimensions"; the Navigator uses ancestor/descendant
  * queries to decide which drill-downs are legal.
  */
final class CubeDef private (
    val labels: Vector[Label],
    val measures: Vector[Measure],
    edges: Vector[(String, String)], // parent -> child (coarse -> fine)
) {
  private val labelByName = labels.map(l => l.name -> l).toMap
  private val measureByName = measures.map(m => m.name -> m).toMap

  def label(name: String): Label =
    labelByName.getOrElse(name, throw new NoSuchElementException(s"label not defined: '$name'"))
  def measure(name: String): Measure =
    measureByName.getOrElse(name, throw new NoSuchElementException(s"measure not defined: '$name'"))
  def hasLabel(name: String): Boolean = labelByName.contains(name)
  def hasMeasure(name: String): Boolean = measureByName.contains(name)

  def withLabel(l: Label): CubeDef = {
    val newEdges = l.childOf.map(p => p -> l.name) ++ l.parentOf.map(c => l.name -> c)
    new CubeDef(labels :+ l, measures, edges ++ newEdges)
  }
  def withLabels(ls: Seq[Label]): CubeDef = ls.foldLeft(this)(_ withLabel _)
  def withMeasure(m: Measure): CubeDef = new CubeDef(labels, measures :+ m, edges)
  def withMeasures(ms: Seq[Measure]): CubeDef = ms.foldLeft(this)(_ withMeasure _)
  def withHierarchy(parent: String, child: String): CubeDef =
    new CubeDef(labels, measures, edges :+ (parent -> child))

  private lazy val children: Map[String, Set[String]] =
    edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
  private lazy val parents: Map[String, Set[String]] =
    edges.groupBy(_._2).map { case (k, v) => k -> v.map(_._1).toSet }

  private def reach(start: String, next: String => Set[String]): Set[String] = {
    var seen = Set.empty[String]
    var frontier = next(start)
    while (frontier.nonEmpty) {
      seen ++= frontier
      frontier = frontier.flatMap(next) -- seen
    }
    seen
  }

  def ancestors(name: String): Set[String] =
    reach(name, n => parents.getOrElse(n, Set.empty))
  def descendants(name: String): Set[String] =
    reach(name, n => children.getOrElse(n, Set.empty))
  /** All labels in the same connected component (= dimension). */
  def connected(name: String): Set[String] = {
    val und = (n: String) => children.getOrElse(n, Set.empty) ++ parents.getOrElse(n, Set.empty)
    reach(name, und) + name
  }

  /** Rank = depth in the hierarchy; used to order Navigator expansions. */
  def rank(name: String): Int = {
    val anc = ancestors(name)
    anc.size
  }
}

object CubeDef {
  val empty: CubeDef = new CubeDef(Vector.empty, Vector.empty, Vector.empty)
  def apply(labels: Seq[Label], measures: Seq[Measure]): CubeDef =
    empty.withLabels(labels).withMeasures(measures)
}
