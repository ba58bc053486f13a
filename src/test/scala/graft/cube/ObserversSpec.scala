package graft.cube

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ObserversSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("A", "x", 1.0), ("A", "y", 2.0), ("B", "x", 3.0),
  ).toDF("k", "s", "v")

  private val cube = CubeDef(
    labels = Seq(Label("k"), Label("s")),
    measures = Seq(Measure("sum_v", col("v"), Agg.Sum)))

  test("csv render with escaping") {
    val slice = Slicer.slice(df, cube,
      CubeQuery().addAxis("k").addValue("sum_v").orderBy("k"))
    val csv = Observers.toCsv(slice)
    assert(csv.startsWith("k,sum_v"))
    assert(csv.contains("A,3.0") && csv.contains("B,3.0"))
    val tricky = Seq(("a,b", 1.0)).toDF("k", "sum_v")
    assert(Observers.toCsv(tricky).contains("\"a,b\""))
  }

  test("json rows render") {
    val slice = Slicer.slice(df, cube, CubeQuery().addAxis("k").addValue("sum_v"))
    val json = Observers.toJsonRows(slice)
    assert(json.startsWith("[") && json.contains("\"sum_v\""))
  }

  test("pivot table computes cells, row/col totals and grand total in one pass") {
    val t = Observers.pivotTable(df, cube, "k", "s", "sum_v")
    assert(t.colKeys == Vector("x", "y"))
    val rowA = t.rows.find(_._1 == "A").get
    assert(rowA._2 == Vector(Some(1.0), Some(2.0)) && rowA._3.contains(3.0))
    val rowB = t.rows.find(_._1 == "B").get
    assert(rowB._2 == Vector(Some(3.0), None) && rowB._3.contains(3.0))
    assert(t.colTotals == Vector(Some(4.0), Some(2.0)))
    assert(t.grandTotal.contains(6.0))
    assert(Observers.render(t).contains("TOTAL"))
  }

  test("excel XML export is well-formed with typed cells") {
    val slice = Slicer.slice(df, cube,
      CubeQuery().addAxis("k").addValue("sum_v").orderBy("k"))
    val xml = Observers.toExcelXml(slice.withColumnRenamed("k", "k<&>"))
    // well-formedness via the JDK parser
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    val doc = f.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    assert(doc.getElementsByTagName("Row").getLength == 3) // header + 2 rows
    assert(xml.contains("""ss:Type="Number">3.0"""))
    assert(xml.contains("k&lt;&amp;&gt;"))
  }

  test("pivot table keeps genuinely-NULL axis values distinct from totals rows") {
    val dfn = Seq(("A", "x", 1.0), ("A", null.asInstanceOf[String], 2.0), ("B", "x", 4.0))
      .toDF("k", "s", "v")
    val t = Observers.pivotTable(dfn, cube, "k", "s", "sum_v")
    assert(t.colKeys == Vector("(none)", "x"))
    val rowA = t.rows.find(_._1 == "A").get
    assert(rowA._2 == Vector(Some(2.0), Some(1.0)))
    assert(rowA._3.contains(3.0)) // row total includes the null-keyed cell
    assert(t.grandTotal.contains(7.0))
  }
}
