package graft.cube

/** Value formatting for table cells — the reference's
  * bacon/utils/commas.py (thousands separators applied to the integer
  * part of an already-formatted number, sign and any prefix preserved).
  */
object Format {

  /** Insert thousands separators into the FIRST digit run of a formatted
    * string: "$-1234567.5678" → "$-1,234,567.5678" (commas.py
    * FormatWithCommas: only the integer part gets grouped, the fraction
    * digits are left alone).
    */
  def withCommas(formatted: String): String = {
    val m = "\\d+".r.findFirstMatchIn(formatted)
    m match {
      case None => formatted
      case Some(hit) =>
        val grouped = hit.matched.reverse.grouped(3).mkString(",").reverse
        formatted.substring(0, hit.start) + grouped + formatted.substring(hit.end)
    }
  }

  /** printf-style format + commas, e.g. withCommas("%.2f", 1234567.891)
    * → "1,234,567.89" (the commas.py entry point).
    */
  def withCommas(format: String, value: Any): String =
    withCommas(format.format(value))

  /** Integer with separators (the common table-cell case). */
  def int(v: Long): String = withCommas(v.toString)
}
