package graft.cube

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.time.LocalDate

class DateLabelsSpec extends SparkSpec {
  import spark.implicits._

  test("date hierarchy label expressions") {
    val df = Seq(java.sql.Timestamp.valueOf("2024-02-29 13:45:00")).toDF("d")
    val labels = DateLabels.hierarchy("d", "t")
    val out = df.select(labels.map(_.named): _*).collect()(0)
    val byName = labels.map(_.name).zip(out.toSeq).toMap
    assert(byName("d_year").toString == "2024-01-01")
    assert(byName("d_quarter").toString == "2024-01-01")
    assert(byName("d_month").toString == "2024-02-01")
    assert(byName("d_week").toString == "2024-02-26") // ISO Monday
    assert(byName("d_day").toString == "2024-02-29")
    assert(byName("d_weekday") == 4) // Thursday, ISO
    assert(byName("d_moy") == 2)
    assert(byName("d_quarternum") == 1)
    assert(byName("d_monthday") == 29)
    assert(byName("d_doy") == 60)
    assert(byName("d_isoweeknum") == 9)
    assert(byName("d_isoyear") == 2024)
  }

  test("relative date parse (bacon '-N periods ago' syntax)") {
    val today = LocalDate.of(2024, 8, 15) // a Thursday
    assert(DateLabels.parseRelative("-30", "day", today) == LocalDate.of(2024, 7, 16))
    assert(DateLabels.parseRelative("-2", "week", today) == LocalDate.of(2024, 7, 29))
    assert(DateLabels.parseRelative("-6", "month", today) == LocalDate.of(2024, 2, 1))
    assert(DateLabels.parseRelative("-1", "quarter", today) == LocalDate.of(2024, 4, 1))
    assert(DateLabels.parseRelative("0", "year", today) == LocalDate.of(2024, 1, 1))
  }

  test("pretty formatters mirror the reference rendering") {
    val df = Seq(java.sql.Date.valueOf("2024-02-29")).toDF("d")
    val r = df.select(
      DateLabels.prettyMonth(col("d")), DateLabels.prettyQuarter(col("d")),
      DateLabels.prettyDay(col("d")), DateLabels.prettyWeek(col("d"))).collect()(0)
    assert(r.getString(0) == "Feb 2024")
    assert(r.getString(1) == "Q1 2024")
    assert(r.getString(2) == "Thu 2024-02-29")
    assert(r.getString(3) == "26 Feb..03 Mar 2024")
  }
}
