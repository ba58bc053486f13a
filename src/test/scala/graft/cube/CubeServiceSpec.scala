package graft.cube

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CubeServiceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("A", "x", 1.0), ("A", "y", 2.0), ("B", "x", 3.0),
  ).toDF("k", "s", "v")

  private val cube = CubeDef(
    labels = Seq(Label("k"), Label("s")),
    measures = Seq(Measure("sum_v", col("v"), Agg.Sum)))

  private def get(port: Int, path: String): (Int, String) = {
    val conn = java.net.URI.create(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = scala.io.Source.fromInputStream(is, "UTF-8").mkString
    conn.disconnect()
    (code, body)
  }

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")

  test("GET serves the observers end-to-end: json equals the direct render") {
    val board = new CuttingBoard(df, cube)
    val svc = new CubeService(Map("demo" -> board))
    val port = svc.start()
    try {
      val qs = "a:k/v:sum_v/o:k"
      // rows: HTTP payload equals Observers.toJsonRows over the same board
      val (c1, rows) = get(port, s"/cube/demo/rows?q=${enc(qs)}")
      assert(c1 == 200)
      val direct = Observers.toJsonRows(
        board.slice(UrlQueryBuilder.parse(qs, cube)))
      assert(rows == direct)
      assert(rows.contains("\"sum_v\""))

      // csv
      val (c2, csv) = get(port, s"/cube/demo/csv?q=${enc(qs)}")
      assert(c2 == 200 && csv.startsWith("k,sum_v"))

      // linked table json: equals the direct tableJson for the same query
      val (c3, tj) = get(port, s"/cube/demo/table?q=${enc("a:k/a:s/v:sum_v")}&row=k&col=s&m=sum_v")
      assert(c3 == 200)
      val t = Observers.pivotTable(df, cube, "k", "s", "sum_v")
      val expected = Observers.tableJson(t,
        new Navigator(cube, UrlQueryBuilder.parse("a:k/a:s/v:sum_v", cube)))
      assert(tj == expected)

      // nav + plot respond with the frontend payloads
      val (c4, nav) = get(port, s"/cube/demo/nav?q=${enc("a:k/v:sum_v/f:s:x")}")
      assert(c4 == 200 && nav.contains("\"filters\""))
      val (c5, plot) = get(port, s"/cube/demo/plot?q=${enc("a:k/v:sum_v")}")
      assert(c5 == 200 && plot.contains("\"series\""))

      // excel is well-formed XML
      val (c6, xml) = get(port, s"/cube/demo/excel?q=${enc(qs)}")
      assert(c6 == 200)
      javax.xml.parsers.DocumentBuilderFactory.newInstance().newDocumentBuilder()
        .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))

      // details: the raw records behind a filtered row, paged
      val (c7, det) = get(port,
        s"/cube/demo/details?q=${enc("f:k:A")}&cols=k,s,v&order=s&size=10")
      assert(c7 == 200)
      val expectedDet = Observers.recordListingJson(Observers.recordListing(
        df, cube, UrlQueryBuilder.parse("f:k:A", cube), Seq("k", "s", "v"), Seq("s"),
        pageSize = 10, page = 0))
      assert(det == expectedDet)
      assert(det.contains("\"total_rows\":2"))

      // html: the rendered-template path — well-formed, has the nav
      // affordances, and the grand-total footer from the 0-dim slice
      val (c8, html) = get(port, s"/cube/demo/html?q=${enc("a:k/v:sum_v")}")
      assert(c8 == 200)
      assert(html.contains("""<table class="bacon bacon-values">"""))
      assert(html.contains("""<tr class="totals">""") && html.contains("6.00"))
      javax.xml.parsers.DocumentBuilderFactory.newInstance().newDocumentBuilder()
        .parse(new java.io.ByteArrayInputStream(s"<root>$html</root>".getBytes("UTF-8")))
      val (c9, phtml) = get(port,
        s"/cube/demo/html?q=${enc("a:k/a:s/v:sum_v")}&row=k&col=s&m=sum_v")
      assert(c9 == 200 && phtml.contains("""<table class="bacon bacon-pivot">"""))

      // unknown cube → 404; bad query string → 400; missing param → 400
      assert(get(port, s"/cube/nope/rows?q=${enc(qs)}")._1 == 404)
      assert(get(port, s"/cube/demo/rows?q=${enc("zz:bad")}")._1 == 400)
      assert(get(port, s"/cube/demo/table?q=${enc(qs)}")._1 == 400)

      // malformed paging params are client errors (400), never a 500;
      // negatives clamp to 0 and serve
      assert(get(port, s"/cube/demo/html?q=${enc("a:k/v:sum_v")}&size=abc")._1 == 400)
      assert(get(port, s"/cube/demo/details?q=${enc("f:k:A")}&cols=k&page=9e9")._1 == 400)
      val (cNeg, negHtml) = get(port, s"/cube/demo/html?q=${enc("a:k/v:sum_v")}&size=-3")
      assert(cNeg == 200 && negHtml.contains("""<tr class="values">"""))

      // a paged html render serves one row + a pager (LIMIT in the plan)
      val (cPg, pgHtml) = get(port, s"/cube/demo/html?q=${enc("a:k/v:sum_v")}&size=1&page=1")
      assert(cPg == 200 && pgHtml.contains("""<div class="bacon-pager">"""))
    } finally {
      svc.stop()
      board.clear()
    }
  }

  test("served slices hit the board's cache on repeat requests") {
    val board = new CuttingBoard(df, cube)
    val svc = new CubeService(Map("demo" -> board))
    val port = svc.start()
    try {
      val path = s"/cube/demo/rows?q=${enc("a:k/v:sum_v")}"
      val first = get(port, path)._2
      val second = get(port, path)._2
      assert(first == second)
      assert(board.stats == (1L, 1L), "second GET must be a slice-cache hit")
    } finally {
      svc.stop()
      board.clear()
    }
  }
}
