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

  /** Parse a query string into a CubeQuery. Values stay Strings (Spark
    * casts literals as needed); use the CubeDef overload for typed parsing.
    */
  def parse(s: String): CubeQuery = parseWith(s, (_, raw) => raw)

  /** Typed parse: every filter token runs through its label's ValueCodec
    * — the reference's `label.parse(value)` on each URL token
    * (bacon/builders/url.py:114). This is what makes relative-date
    * filters (`f:o_orderdate_month:-6` = six months ago) slice correctly
    * instead of string-comparing "-6" against a DATE column. Labels not
    * in the cubedef, or without a codec, stay raw strings.
    */
  def parse(s: String, cubedef: CubeDef,
            today: java.time.LocalDate = java.time.LocalDate.now): CubeQuery =
    parseWith(s, (name, raw) =>
      if (cubedef.hasLabel(name)) cubedef.label(name).parseValue(raw, today) else raw)

  private def parseWith(s: String, parseValue: (String, String) => Any): CubeQuery = {
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
          case Vector(name, value) => q = q.addFilter(name, parseValue(name, value), FilterOp.Eq)
          case Vector(name, op, value) if !FilterOp.multiArg.contains(op) =>
            q = q.addFilter(name, parseValue(name, value), op)
          case name +: op +: values if FilterOp.multiArg.contains(op) =>
            q = q.addFilter(name, values.map(parseValue(name, _)), op)
          case _ => throw new IllegalArgumentException(s"bad filter: '$chunk'")
        }
        case other => throw new IllegalArgumentException(s"unknown command: '$other'")
      }
    }
    q
  }

  private def enc(s: String): String = bsescape(s, "/:")

  /** Serialize a CubeQuery back to the URL syntax (round-trips parse). */
  def toUrlString(q: CubeQuery): String =
    toUrlStringWith(q, (_, v) => String.valueOf(v))

  /** Typed serialize: filter values run through their label's ValueCodec
    * unparse — the reference's `label.unparse(v)` on render
    * (bacon/builders/url.py:184). Round-trips `parse(s, cubedef)` for
    * absolute values (relative tokens intentionally resolve to the
    * concrete period on parse, as in the reference).
    */
  def toUrlString(q: CubeQuery, cubedef: CubeDef): String =
    toUrlStringWith(q, (name, v) =>
      if (cubedef.hasLabel(name)) cubedef.label(name).unparseValue(v) else String.valueOf(v))

  private def toUrlStringWith(q: CubeQuery, unparse: (String, Any) => String): String = {
    val parts = Vector.newBuilder[String]
    for (f <- q.filters) {
      val v = f.value match {
        case vs: Seq[_] => vs.map(x => enc(unparse(f.name, x))).mkString(":")
        case null       => ""
        case x          => enc(unparse(f.name, x))
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
