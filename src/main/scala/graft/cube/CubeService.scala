package graft.cube

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Minimal HTTP consumption layer over the observers — the reference's
  * primary consumption path is its web glue (bacon/flask/, bacon/django/
  * middleware.py:1-40, the observer wrappers): URL-builder query strings
  * in, rendered observer payloads out. JDK `com.sun.net.httpserver`, no
  * new dependencies.
  *
  * Routes (all GET; `q` is a URL-encoded UrlQueryBuilder string, parsed
  * through the cube's typed codecs so date/relative filters work):
  *
  *   /cube/<name>/rows?q=…                     slice rows as JSON
  *   /cube/<name>/csv?q=…                      slice as CSV
  *   /cube/<name>/excel?q=…                    SpreadsheetML workbook
  *   /cube/<name>/nav?q=…                      navigation JSON (navJson)
  *   /cube/<name>/table?q=…&row=a&col=b&m=v    linked pivot-table JSON
  *   /cube/<name>/html?q=…[&row=&col=&m=]      rendered HTML table (1-D, or
  *                                             pivot when row/col/m given)
  *   /cube/<name>/plot?q=…                     plot descriptor JSON
  *
  * Scale note: every route goes through the CuttingBoard (slice cache +
  * persisted materializations) or the one-pass pivot/rollup — the server
  * only ever renders post-aggregation frames; nothing here scans base
  * data beyond what a cold slice computes once.
  */
final class CubeService(boards: Map[String, CuttingBoard],
                        host: String = "127.0.0.1", port: Int = 0) {

  private val server = HttpServer.create(new java.net.InetSocketAddress(host, port), 0)
  server.createContext("/cube", new Handler)
  // driver-side rendering serializes on the board lock anyway; a thread
  // pool would only queue on it
  server.setExecutor(null)

  /** Start serving; returns the bound port (useful with port = 0). */
  def start(): Int = { server.start(); boundPort }
  def boundPort: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)

  private def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("")
      .split('&').filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) kv -> ""
        else kv.substring(0, i) -> java.net.URLDecoder.decode(kv.substring(i + 1), "UTF-8")
      }.toMap

  private final class Handler extends HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try {
        val parts = ex.getRequestURI.getPath.split('/').filter(_.nonEmpty).toList
        (parts, parts.lift(1).flatMap(boards.get)) match {
          case (_ :: _ :: verb :: Nil, Some(board)) => serve(ex, board, verb)
          case _ => respond(ex, 404, "text/plain", "not found")
        }
      } catch {
        case e: IllegalArgumentException =>
          respond(ex, 400, "text/plain", s"bad request: ${e.getMessage}")
        case scala.util.control.NonFatal(e) =>
          respond(ex, 500, "text/plain", s"error: $e")
      }

    private def serve(ex: HttpExchange, board: CuttingBoard, verb: String): Unit = {
      val p = params(ex)
      def need(k: String): String =
        p.getOrElse(k, throw new IllegalArgumentException(s"missing param '$k'"))
      // IllegalArgumentException maps to 400 in handle() — malformed
      // client input must never surface as a 500; negatives clamp to 0
      def intParam(k: String, default: Int): Int = p.get(k) match {
        case None => default
        case Some(raw) => raw.toIntOption.map(_ max 0).getOrElse(
          throw new IllegalArgumentException(s"param '$k' must be an integer, got '$raw'"))
      }
      val q = UrlQueryBuilder.parse(p.getOrElse("q", ""), board.cubedef)
      verb match {
        case "rows" =>
          respond(ex, 200, "application/json", Observers.toJsonRows(board.slice(q)))
        case "csv" =>
          respond(ex, 200, "text/csv", Observers.toCsv(board.slice(q)))
        case "excel" =>
          respond(ex, 200, "application/vnd.ms-excel", Observers.toExcelXml(board.slice(q)))
        case "nav" =>
          respond(ex, 200, "application/json",
            Observers.navJson(new Navigator(board.cubedef, q)))
        case "plot" =>
          respond(ex, 200, "application/json",
            Observers.plotJson(Observers.plotDescriptor(board.dataset, board.cubedef, q)))
        case "table" =>
          val t = Observers.pivotTable(board.dataset, board.cubedef,
            need("row"), need("col"), need("m"), q.filters)
          respond(ex, 200, "application/json",
            Observers.tableJson(t, new Navigator(board.cubedef, q)))
        case "html" => // the reference's rendered-template path (bacon_tags.table)
          val nav = new Navigator(board.cubedef, q)
          val pageSize = intParam("size", 0)
          val page = intParam("page", 0)
          val html =
            if (p.contains("row") && p.contains("col") && p.contains("m")) {
              val t = Observers.pivotTable(board.dataset, board.cubedef,
                need("row"), need("col"), need("m"), q.filters)
              Observers.htmlTablePivot(t, nav, pageSize = pageSize, curPage = page)
            } else {
              // grand-total footer from the 0-dim slice of the same query —
              // another board hit, so repeats serve from the cache
              val totalsQ = q.copy(axes = Vector.empty, pivots = Set.empty,
                order = Vector.empty, limit = None, offset = None)
              Observers.htmlTable1d(board.slice(q), nav,
                pageSize = pageSize, curPage = page,
                totals = if (q.values.nonEmpty) Some(board.slice(totalsQ)) else None)
            }
          respond(ex, 200, "text/html", html)
        case "details" => // raw records behind a rendered row (TableDetails)
          val cols = need("cols").split(',').toSeq.filter(_.nonEmpty)
          val order = p.getOrElse("order", "").split(',').toSeq.filter(_.nonEmpty)
          respond(ex, 200, "application/json",
            Observers.recordListingJson(Observers.recordListing(
              board.dataset, board.cubedef, q, cols, order,
              pageSize = intParam("size", 50),
              page = intParam("page", 0))))
        case other =>
          respond(ex, 404, "text/plain", s"unknown view '$other'")
      }
    }
  }

  private def respond(ex: HttpExchange, code: Int, ctype: String, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.add("Content-Type", s"$ctype; charset=utf-8")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}
