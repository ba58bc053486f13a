package graft.cube

/** URL syntax ⇄ CubeQuery, mirroring the reference's UrlQueryBuilder
  * (bacon/builders/url.py:31): commands separated by '/', tokens by ':',
  * both backslash-escapable inside values.
  *
  *   a:axis            add axis          p:axis   pivot axis
  *   v:value           add value         hv:value hide value
  *   f:label:value     eq filter         f:label:op:v1[:v2...] other ops
  *   o:[-]value[:pivotvals...]  order    l:n[:offset] limit
  */
object UrlQueryBuilder {

  /** bacon/utils/strings.py:6 bssplit — split on sep except \-escaped. */
  def bssplit(s: String, sep: Char): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length && (s.charAt(i + 1) == sep || s.charAt(i + 1) == '\\')) {
        cur.append(s.charAt(i + 1)); i += 2
      } else if (c == sep) { out += cur.result(); cur.clear(); i += 1 }
      else { cur.append(c); i += 1 }
    }
    out += cur.result()
    out.result()
  }

  def bsescape(s: String, unsafe: String): String =
    s.flatMap(c => if (unsafe.contains(c) || c == '\\') s"\\$c" else c.toString)

  /** Parse a query string into a CubeQuery. Values stay Strings; the
    * CubeDef's label expressions compare against string literals (Spark
    * casts as needed), matching the reference's parse-on-label behavior.
    */
  def parse(s: String): CubeQuery = {
    var q = CubeQuery()
    for (chunk <- bssplit(s, '/') if chunk.nonEmpty) {
      val tokens = bssplit(chunk, ':')
      val cmd = tokens.head
      val args = tokens.tail
      cmd match {
        case "a"  => q = q.addAxis(args.head)
        case "p"  => q = q.setPivot(args.head)
        case "v"  => q = q.addValue(args.head)
        case "hv" => q = q.hideValue(args.head)
        case "o"  => q = q.orderBy(args.head, args.tail)
        case "l"  => q = args match {
          case Vector(n)    => q.setLimit(n.toInt)
          case Vector(n, o) => q.setLimit(n.toInt).setOffset(o.toInt)
          case _            => q
        }
        case "f" => args match {
          case Vector(name, value) => q = q.addFilter(name, value, FilterOp.Eq)
          case Vector(name, op, value) if !FilterOp.multiArg.contains(op) =>
            q = q.addFilter(name, value, op)
          case name +: op +: values if FilterOp.multiArg.contains(op) =>
            q = q.addFilter(name, values, op)
          case _ => throw new IllegalArgumentException(s"bad filter: '$chunk'")
        }
        case other => throw new IllegalArgumentException(s"unknown command: '$other'")
      }
    }
    q
  }

  private def enc(s: String): String = bsescape(s, "/:")

  /** Serialize a CubeQuery back to the URL syntax (round-trips parse). */
  def toUrlString(q: CubeQuery): String = {
    val parts = Vector.newBuilder[String]
    for (f <- q.filters) {
      val v = f.value match {
        case vs: Seq[_] => vs.map(x => enc(String.valueOf(x))).mkString(":")
        case null       => ""
        case x          => enc(String.valueOf(x))
      }
      if (f.op == FilterOp.Eq) parts += s"f:${f.name}:$v"
      else parts += s"f:${f.name}:${f.op}:$v"
    }
    val piv = q.pivot.toSet
    for (a <- q.axes) parts += (if (piv.contains(a)) s"p:$a" else s"a:$a")
    for (v <- q.values) parts += s"v:$v"
    for (h <- q.hiddenValues) parts += s"hv:$h"
    for (o <- q.order) {
      val head = if (o.ascending) o.name else "-" + o.name
      parts += (("o" +: head +: o.pivotKey.map(enc)).mkString(":"))
    }
    for (n <- q.limit) parts += (q.offset match {
      case Some(off) => s"l:$n:$off"
      case None      => s"l:$n"
    })
    parts.result().mkString("/")
  }
}
