package graft.cube

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Systematic truth table for the scalar filter operators, including the
  * NULL cases where the Python reference semantics differ from SQL
  * (bacon/cutting.py:846 _op_map; SURVEY.md §3).
  */
class FilterOpSpec extends SparkSpec {
  import spark.implicits._

  // rows: value 1, 5, 9, NULL
  private lazy val df = Seq(Some(1), Some(5), Some(9), None).toDF("x")
  private lazy val sdf = Seq(Some("apple"), Some("banana"), None).toDF("s")

  private def ids(op: String, v: Any): Set[Any] =
    df.where(FilterOp.compile(op, col("x"), v)).collect().map(r => r.get(0)).toSet

  private def sids(op: String, v: Any): Set[Any] =
    sdf.where(FilterOp.compile(op, col("s"), v)).collect().map(r => r.get(0)).toSet

  test("eq is null-safe (eq NULL matches only NULL)") {
    assert(ids(FilterOp.Eq, 5) == Set(5))
    assert(ids(FilterOp.Eq, null) == Set(null))
  }

  test("ne keeps NULL rows (Python None != x is True)") {
    assert(ids(FilterOp.Ne, 5) == Set(1, 9, null))
  }

  test("comparisons drop NULL rows (Python raises; SQL drops)") {
    assert(ids(FilterOp.Gt, 4) == Set(5, 9))
    assert(ids(FilterOp.Ge, 5) == Set(5, 9))
    assert(ids(FilterOp.Lt, 5) == Set(1))
    assert(ids(FilterOp.Le, 5) == Set(1, 5))
  }

  test("in drops NULLs unless NULL is in the filter set; ni is its complement") {
    assert(ids(FilterOp.In, Seq(1, 5)) == Set(1, 5))
    assert(ids(FilterOp.Ni, Seq(1, 5)) == Set(9, null))
    assert(ids(FilterOp.In, Seq(1, null)) == Set(1, null))
    assert(ids(FilterOp.Ni, Seq(1, null)) == Set(5, 9))
    assert(ids(FilterOp.In, Seq.empty[Int]) == Set.empty)
    assert(ids(FilterOp.Ni, Seq.empty[Int]) == Set(1, 5, 9, null))
  }

  test("match is re.search (substring); nmatch keeps NULLs") {
    assert(sids(FilterOp.Match, "an") == Set("banana"))
    assert(sids(FilterOp.NMatch, "an") == Set("apple", null))
    assert(sids(FilterOp.Match, "^a") == Set("apple"))
  }

  test("invert round-trips the antonym table for every operator") {
    val all = Seq(FilterOp.Eq, FilterOp.Ne, FilterOp.Gt, FilterOp.Ge, FilterOp.Lt,
      FilterOp.Le, FilterOp.In, FilterOp.Ni, FilterOp.Match, FilterOp.NMatch,
      FilterOp.HasAll, FilterOp.HasNotAll, FilterOp.HasNone, FilterOp.HasAny,
      FilterOp.SubsetOf, FilterOp.NotSubsetOf, FilterOp.SupersetOf,
      FilterOp.NotSupersetOf, FilterOp.DisjointFrom, FilterOp.Intersects,
      FilterOp.Equals, FilterOp.NotEquals)
    all.foreach(op => assert(FilterOp.invert(FilterOp.invert(op)) == op, op))
  }

  test("inverted predicate partitions the rows (p ∪ ¬p = all)") {
    // For gt/le NULL rows satisfy neither side (Python would raise on
    // both), so the partition property holds on the non-null rows.
    for (op <- Seq(FilterOp.Gt, FilterOp.Eq, FilterOp.In, FilterOp.Match)) {
      val v: Any = op match {
        case FilterOp.In => Seq(1, 5)
        case FilterOp.Match => "a"
        case _ => 5
      }
      val (c, data0) = if (op == FilterOp.Match) (col("s"), sdf) else (col("x"), df)
      val data = if (op == FilterOp.Gt) data0.na.drop() else data0
      val pos = data.where(FilterOp.compile(op, c, v)).count()
      val neg = data.where(FilterOp.compile(FilterOp.invert(op), c, v)).count()
      assert(pos + neg == data.count(), s"op=$op")
    }
  }
}
