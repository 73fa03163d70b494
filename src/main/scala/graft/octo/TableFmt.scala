package graft.octo

/** Replica of the table rendering the reference gets from
  * olekukonko/tablewriter with `SetColWidth(24)`, `SetRowLine(false)`,
  * `SetAutoFormatHeaders(false)` (outputs/formats/table_format.go):
  *
  *  - headers centered; cells right-aligned when the text parses as a
  *    number, left-aligned otherwise (tablewriter ALIGN_DEFAULT)
  *  - column width = widest of header/cells, with cells wrapped on
  *    spaces at 24 display columns
  *  - `+---+` separators above the header, below it, and at the bottom
  */
object TableFmt {

  private val ColWidth = 24

  // tablewriter's decimal regex (util.go isNumerical): plain decimals
  // only — scientific notation, NaN and ±Inf are NOT right-aligned
  private val Decimal = """^-?(?:\d{1,3}(?:,\d{3})*|\d+)(?:\.\d+)?$""".r
  private def isNumeric(s: String): Boolean =
    s.nonEmpty && Decimal.matches(s)

  /** tablewriter WrapString: greedy word wrap on single spaces; a word
    * longer than the limit stays whole.
    */
  private def wrap(s: String, lim: Int): Seq[String] = {
    if (s.length <= lim && !s.contains('\n')) return Seq(s)
    val words = s.replace("\n", " ").split(" ", -1).toSeq
    val max = math.max(lim, if (words.isEmpty) 0 else words.map(_.length).max)
    val lines = Seq.newBuilder[String]
    var line = ""
    words.foreach { w =>
      if (line.isEmpty) line = w
      else if (line.length + 1 + w.length <= max) line = line + " " + w
      else { lines += line; line = w }
    }
    if (line.nonEmpty || words.isEmpty) lines += line
    lines.result()
  }

  def render(header: Seq[String], rows: Seq[Seq[String]]): String = {
    val n = header.length
    val wrapped = rows.map(_.map(c => wrap(c, ColWidth)))
    val widths = Array.tabulate(n) { i =>
      val cellMax = wrapped.flatMap(r => r.applyOrElse(i, (_: Int) => Seq("")).map(_.length))
      (header(i).length +: cellMax).max
    }
    val sb = new StringBuilder
    def sep(): Unit = {
      sb += '+'
      widths.foreach { w => sb ++= "-" * (w + 2); sb += '+' }
      sb += '\n'
    }
    def center(s: String, w: Int): String = {
      val pad = w - s.length
      val left = pad / 2
      " " * left + s + " " * (pad - left)
    }
    def cellLine(cells: Seq[String]): Unit = {
      sb += '|'
      var i = 0
      while (i < n) {
        val c = cells.applyOrElse(i, (_: Int) => "")
        val w = widths(i)
        sb += ' '
        if (isNumeric(c)) { sb ++= " " * (w - c.length); sb ++= c }
        else { sb ++= c; sb ++= " " * (w - c.length) }
        sb ++= " |"
        i += 1
      }
      sb += '\n'
    }
    sep()
    sb += '|'
    header.zipWithIndex.foreach { case (h, i) => sb += ' '; sb ++= center(h, widths(i)); sb ++= " |" }
    sb += '\n'
    sep()
    wrapped.foreach { r =>
      val lines = r.map(_.length).maxOption.getOrElse(1)
      (0 until lines).foreach { li =>
        cellLine(r.map(c => c.applyOrElse(li, (_: Int) => "")))
      }
    }
    sep()
    sb.toString
  }
}
