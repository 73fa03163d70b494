package graft.octo

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Row
import org.apache.spark.unsafe.types.VariantVal

/** Driver-side rendering of collected Spark row values in the reference
  * engine's display formats (octosql/values.go:357-424 `String()`,
  * outputs/formats/csv_format.go `FormatCSVValue`,
  * outputs/formats/json_format.go `ValueToJson`) plus its cross-value
  * ordering (values.go `Compare`) used by the live-table sort.
  *
  * Only output printers call this — per-row work inside queries stays in
  * codegen'd Catalyst expressions.
  */
object OValue {

  private val mapper = new ObjectMapper()
  private val Utc = java.time.ZoneOffset.UTC

  /** Unwrap a variant to the plain JVM value matching its RUNTIME JSON
    * type, so union values compare by type id like the reference
    * (values.go Compare on the concrete instance type).
    */
  private def unwrapVariant(vv: VariantVal): Any = {
    val n = parseVariant(vv)
    if (n == null || n.isNull) null
    else if (n.isNumber) n.asDouble // JSON numbers are octosql Float
    else if (n.isBoolean) n.asBoolean
    else if (n.isTextual) {
      val s = n.asText
      if (OType.isRfc3339(s)) java.time.OffsetDateTime.parse(s).toInstant else s
    }
    else if (n.isArray) (0 until n.size).map(i => nodeValue(n.get(i)))
    else Row.fromSeq(jsonFieldNames(n).sorted.map(k => nodeValue(n.get(k))))
  }

  private def nodeValue(n: JsonNode): Any =
    if (n == null || n.isNull) null
    else if (n.isNumber) n.asDouble
    else if (n.isBoolean) n.asBoolean
    else if (n.isTextual) n.asText
    else if (n.isArray) (0 until n.size).map(i => nodeValue(n.get(i)))
    else Row.fromSeq(jsonFieldNames(n).sorted.map(k => nodeValue(n.get(k))))

  /** Runtime octosql type id of a collected value (for Compare). */
  private def typeIdOf(v: Any): Int = v match {
    case null => 0
    case _: Long | _: Int | _: Short | _: Byte => 1
    case _: Double | _: Float => 2
    case _: Boolean => 3
    case _: String => 4
    case _: java.sql.Timestamp | _: java.time.Instant => 5
    case _: java.math.BigDecimal | _: BigDecimal | _: java.time.Duration => 6
    case _: scala.collection.Seq[_] => 7
    case _: Row => 8
    case vv: VariantVal => typeIdOf(unwrapVariant(vv)) // runtime union type
    case _ => 4
  }

  private def nanosOf(v: Any): Long = v match {
    case d: java.math.BigDecimal =>
      val n = d.movePointRight(9).setScale(0, java.math.RoundingMode.DOWN)
      // saturate like Go's int64 duration bounds instead of crashing
      if (n.compareTo(java.math.BigDecimal.valueOf(Long.MaxValue)) > 0) Long.MaxValue
      else if (n.compareTo(java.math.BigDecimal.valueOf(Long.MinValue)) < 0) Long.MinValue
      else n.longValue()
    case d: BigDecimal => nanosOf(d.bigDecimal)
    case d: java.time.Duration => d.toNanos
    case _ => 0L
  }

  private def instantOf(v: Any): java.time.Instant = v match {
    case t: java.sql.Timestamp => t.toInstant
    case i: java.time.Instant => i
    case _ => java.time.Instant.EPOCH
  }

  private def doubleOf(v: Any): Double = v match {
    case d: Double => d; case f: Float => f.toDouble
    case l: Long => l.toDouble; case i: Int => i.toDouble
    case s: Short => s.toDouble; case b: Byte => b.toDouble
    case _ => 0.0
  }

  private def longOf(v: Any): Long = v match {
    case l: Long => l; case i: Int => i.toLong
    case s: Short => s.toLong; case b: Byte => b.toLong
    case _ => 0L
  }

  // ---- display (values.go String()) ---------------------------------

  /** Table-cell / stream_native display. `t` refines rendering for
    * variant (union) values and struct field completion; pass None for
    * computed columns (Spark runtime class decides).
    */
  def display(v: Any, t: Option[OType]): String = v match {
    case null => "<null>"
    case _: Long | _: Int | _: Short | _: Byte => longOf(v).toString
    case _: Double | _: Float => GoFmt.goFloat(doubleOf(v))
    case b: Boolean => if (b) "true" else "false"
    case s: String => s"'$s'"
    case _: java.sql.Timestamp | _: java.time.Instant => GoFmt.rfc3339(instantOf(v))
    case _: java.math.BigDecimal | _: BigDecimal | _: java.time.Duration =>
      GoFmt.goDuration(nanosOf(v))
    case seq: scala.collection.Seq[_] =>
      val et = t.collect { case OList(Some(e)) => e }
      seq.map(display(_, et)).mkString("[", ", ", "]")
    case r: Row =>
      val fts = t.collect { case OStruct(fs) => fs.map(f => Some(f._2)) }
        .getOrElse(Seq.fill(r.length)(None))
      (0 until r.length).map(i => display(r.get(i), fts.applyOrElse(i, (_: Int) => None)))
        .mkString("{ ", ", ", " }")
    case vv: VariantVal => displayJson(parseVariant(vv), t)
    case other => s"'${other.toString}'"
  }

  private[octo] def parseVariant(v: VariantVal): JsonNode = mapper.readTree(v.toJson(Utc))

  /** Display of a runtime-typed (variant) value from its JSON view,
    * applying the ingest typing rules (numbers → Float, RFC3339 strings
    * → Time) and completing struct fields from the declared type.
    */
  def displayJson(n: JsonNode, t: Option[OType]): String = {
    if (n == null || n.isNull) "<null>"
    else if (n.isNumber) GoFmt.goFloat(n.asDouble)
    else if (n.isTextual) {
      val s = n.asText
      val timey = t match {
        case Some(tt) => tt.nonNullAlts.contains(OTime)
        case None     => OType.isRfc3339(s)
      }
      if (timey && OType.isRfc3339(s))
        // Go time.Parse(RFC3339) keeps the parsed offset and prints it
        // back — format at the value's own offset, not normalized UTC
        GoFmt.rfc3339Offset(java.time.OffsetDateTime.parse(s))
      else s"'$s'"
    }
    else if (n.isBoolean) { if (n.asBoolean) "true" else "false" }
    else if (n.isArray) {
      val et = elemType(t)
      (0 until n.size).map(i => displayJson(n.get(i), et)).mkString("[", ", ", "]")
    }
    else if (n.isObject) {
      structFields(t, n) match {
        case Some(fs) =>
          fs.map { case (name, ft) => displayJson(n.get(name), Some(ft)) }
            .mkString("{ ", ", ", " }")
        case None =>
          val names = jsonFieldNames(n).sorted
          names.map(name => displayJson(n.get(name), None)).mkString("{ ", ", ", " }")
      }
    }
    else "<null>"
  }

  private def elemType(t: Option[OType]): Option[OType] = t.flatMap {
    case OList(e) => e
    case OUnion(as) => as.collectFirst { case OList(e) => e }.flatten
    case _ => None
  }

  private def structFields(t: Option[OType], n: JsonNode): Option[Seq[(String, OType)]] =
    t.flatMap {
      case OStruct(fs) => Some(fs)
      case OUnion(as) => as.collectFirst { case OStruct(fs) => fs }
      case _ => None
    }

  private def jsonFieldNames(n: JsonNode): Seq[String] = {
    val it = n.fieldNames(); val b = Seq.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }

  // ---- CSV (csv_format.go FormatCSVValue) ---------------------------

  def csv(v: Any, t: Option[OType]): String = v match {
    case null => ""
    case d: java.sql.Date => d.toString          // inferred dates print bare
    case d: java.time.LocalDate => d.toString
    case _: Long | _: Int | _: Short | _: Byte => longOf(v).toString
    case _: Double | _: Float => goFloatF(doubleOf(v))
    case b: Boolean => b.toString
    case s: String => s
    case _: java.sql.Timestamp | _: java.time.Instant => GoFmt.rfc3339(instantOf(v))
    case _: java.math.BigDecimal | _: BigDecimal | _: java.time.Duration =>
      GoFmt.goDuration(nanosOf(v))
    case vv: VariantVal =>
      val n = parseVariant(vv)
      if (n.isTextual) n.asText
      else if (n.isNumber) goFloatF(n.asDouble)
      else if (n.isBoolean) n.asBoolean.toString
      else if (n.isNull) ""
      else display(v, t)
    case other => display(other, t) // reference panics; we render
  }

  /** Go strconv.FormatFloat(f, 'f', -1, 64): shortest digits, never
    * scientific (csv_format.go:57).
    */
  def goFloatF(d: Double): String = GoFmt.goFloatPlain(d)

  // ---- JSON (json_format.go ValueToJson) ----------------------------

  /** Append `v` as a JSON value. Numbers follow Go float formatting,
    * struct values complete missing fields from the declared type.
    */
  def json(sb: StringBuilder, v: Any, t: Option[OType]): Unit = v match {
    case null => sb ++= "null"
    case _: Long | _: Int | _: Short | _: Byte => sb.append(longOf(v))
    case _: Double | _: Float => sb ++= GoFmt.goFloat(doubleOf(v))
    case b: Boolean => sb.append(b)
    case s: String => jsonString(sb, s)
    case _: java.sql.Timestamp | _: java.time.Instant =>
      jsonString(sb, GoFmt.rfc3339(instantOf(v)))
    case _: java.math.BigDecimal | _: BigDecimal | _: java.time.Duration =>
      jsonString(sb, GoFmt.goDuration(nanosOf(v)))
    case seq: scala.collection.Seq[_] =>
      sb += '['
      var first = true
      seq.foreach { e => if (!first) sb += ','; first = false; json(sb, e, elemType(t)) }
      sb += ']'
    case r: Row =>
      sb += '{'
      val fields = t.collect { case OStruct(fs) => fs }
      val names = fields.map(_.map(_._1)).getOrElse(r.schema.fieldNames.toSeq)
      val fts = fields.map(_.map(f => Some(f._2))).getOrElse(Seq.fill(r.length)(None))
      var first = true
      names.zipWithIndex.foreach { case (name, i) =>
        if (!first) sb += ','; first = false
        jsonString(sb, name); sb += ':'
        json(sb, r.get(i), fts(i))
      }
      sb += '}'
    case vv: VariantVal => jsonNode(sb, parseVariant(vv), t)
    case other => jsonString(sb, other.toString)
  }

  private def jsonNode(sb: StringBuilder, n: JsonNode, t: Option[OType]): Unit = {
    if (n == null || n.isNull) sb ++= "null"
    else if (n.isNumber) {
      // integers stay integral in the variant view; fractions follow Go
      if (n.isIntegralNumber && n.canConvertToLong) sb.append(n.asLong)
      else sb ++= GoFmt.goFloat(n.asDouble)
    }
    else if (n.isTextual) jsonString(sb, n.asText)
    else if (n.isBoolean) sb.append(n.asBoolean)
    else if (n.isArray) {
      sb += '['
      val et = elemType(t)
      var i = 0
      while (i < n.size) { if (i > 0) sb += ','; jsonNode(sb, n.get(i), et); i += 1 }
      sb += ']'
    }
    else if (n.isObject) {
      sb += '{'
      val fs = structFields(t, n).getOrElse(jsonFieldNames(n).sorted.map(_ -> (null: OType)))
      var first = true
      fs.foreach { case (name, ft) =>
        if (!first) sb += ','; first = false
        jsonString(sb, name); sb += ':'
        jsonNode(sb, n.get(name), Option(ft))
      }
      sb += '}'
    }
    else sb ++= "null"
  }

  def jsonString(sb: StringBuilder, s: String): Unit = {
    sb += '"'
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb ++= "\\\""
        case '\\' => sb ++= "\\\\"
        case '\n' => sb ++= "\\n"
        case '\r' => sb ++= "\\r"
        case '\t' => sb ++= "\\t"
        case '\b' => sb ++= "\\b"
        case '\f' => sb ++= "\\f"
        case c if c < 0x20 => sb ++= f"\\u${c.toInt}%04x"
        case c => sb += c
      }
      i += 1
    }
    sb += '"'
  }

  // ---- ordering (values.go Compare) ---------------------------------

  /** octosql Value.Compare: type id first, then value. Drives the
    * live/batch table's sorted final render (outputs/batch/
    * live_output.go Ascend).
    */
  def compare(a0: Any, b0: Any): Int = {
    // union values compare by runtime type first (values.go Compare)
    val a = a0 match { case v: VariantVal => unwrapVariant(v); case x => x }
    val b = b0 match { case v: VariantVal => unwrapVariant(v); case x => x }
    val (ta, tb) = (typeIdOf(a), typeIdOf(b))
    if (ta != tb) return Integer.compare(ta, tb)
    ta match {
      case 0 => 0
      case 1 => java.lang.Long.compare(longOf(a), longOf(b))
      case 2 => java.lang.Double.compare(doubleOf(a), doubleOf(b))
      case 3 => java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
      case 4 =>
        val (sa, sb) = (a match { case s: String => s; case o => o.toString },
          b match { case s: String => s; case o => o.toString })
        sa.compareTo(sb)
      case 5 => instantOf(a).compareTo(instantOf(b))
      case 6 => java.lang.Long.compare(nanosOf(a), nanosOf(b))
      case 7 =>
        val (la, lb) = (a.asInstanceOf[scala.collection.Seq[Any]], b.asInstanceOf[scala.collection.Seq[Any]])
        var i = 0
        while (i < math.max(la.length, lb.length)) {
          if (i == la.length) return -1
          if (i == lb.length) return 1
          val c = compare(la(i), lb(i)); if (c != 0) return c
          i += 1
        }
        0
      case 8 =>
        val (ra, rb) = (a.asInstanceOf[Row], b.asInstanceOf[Row])
        var i = 0
        while (i < math.max(ra.length, rb.length)) {
          if (i == ra.length) return -1
          if (i == rb.length) return 1
          val c = compare(ra.get(i), rb.get(i)); if (c != 0) return c
          i += 1
        }
        0
      case _ => 0
    }
  }

  /** Row ordering for the live-table final render. */
  def rowCompare(a: Seq[Any], b: Seq[Any]): Int = {
    var i = 0
    while (i < math.max(a.length, b.length)) {
      if (i == a.length) return -1
      if (i == b.length) return 1
      val c = compare(a(i), b(i)); if (c != 0) return c
      i += 1
    }
    0
  }
}
