package graft.octo

/** Byte-parity replicas of the Go formatting the reference relies on for
  * its output surface:
  *
  *  - `fmt.Sprint(float64)` — strconv's shortest 'g' formatting with the
  *    shortest-mode exponent threshold (`eprec = 6`), so `42.0` renders
  *    as `42` and `18248328.0` as `1.8248328e+07`
  *    (reference: octosql/values.go:371 Float display).
  *  - `time.Duration.String()` — `3s`, `2.333333333s`, `5h32m42s`, `-3s`
  *    (values.go:383 Duration display; durations carry nanosecond
  *    precision in the reference).
  *  - `time.Time.Format(time.RFC3339)` — second precision, `Z` for UTC
  *    (values.go:380).
  *
  * Pure JVM string code: only the driver-side output printers use these;
  * nothing here runs per-row inside a distributed operator.
  */
object GoFmt {

  /** Go `fmt.Sprint(f)` for a float64. Uses Java's shortest-unique
    * decimal digits (Double.toString) re-assembled with Go's 'g'
    * formatting rules.
    */
  /** Shortest round-tripping decimal digits of `d` with the decimal
    * point position, computed by rounding the EXACT binary value to
    * increasing precision until it round-trips. JDK 17's
    * Double.toString is NOT shortest (fixed only in JDK 19,
    * JDK-4511638: e.g. 1.0E23 prints 9.999999999999999E22), so the
    * Go-parity contract needs this search.
    */
  private def shortestDigits(d: Double): (String, Int) = {
    val exact = new java.math.BigDecimal(d) // exact binary expansion
    var p = 1
    while (p <= 17) {
      val r = exact.round(new java.math.MathContext(p, java.math.RoundingMode.HALF_EVEN))
      if (r.doubleValue() == d) {
        val digits0 = r.unscaledValue.abs.toString
        val dp = digits0.length - r.scale
        val digits = digits0.reverse.dropWhile(_ == '0').reverse
        return (if (digits.isEmpty) "0" else digits, dp)
      }
      p += 1
    }
    val digits0 = exact.unscaledValue.abs.toString
    (digits0, digits0.length - exact.scale)
  }

  def goFloat(d: Double): String = {
    if (d.isNaN) return "NaN"
    if (d == Double.PositiveInfinity) return "+Inf"
    if (d == Double.NegativeInfinity) return "-Inf"
    val neg = java.lang.Double.doubleToRawLongBits(d) < 0
    if (d == 0.0) return if (neg) "-0" else "0"
    val (digits, dp) = shortestDigits(math.abs(d))
    val sb = new StringBuilder
    if (neg) sb += '-'
    val exp = dp - 1
    if (exp < -4 || exp >= 6) {
      // %e form: d[.ddd]e±XX (exponent at least two digits)
      sb += digits(0)
      if (digits.length > 1) { sb += '.'; sb ++= digits.substring(1) }
      sb += 'e'
      sb += (if (exp < 0) '-' else '+')
      val ae = math.abs(exp)
      if (ae < 10) sb += '0'
      sb.append(ae)
    } else if (exp >= 0) {
      // %f form, point inside or after digits
      if (digits.length > dp) {
        sb ++= digits.substring(0, dp); sb += '.'; sb ++= digits.substring(dp)
      } else {
        sb ++= digits
        var i = digits.length
        while (i < dp) { sb += '0'; i += 1 }
      }
    } else {
      sb ++= "0."
      var i = 0
      while (i < -dp) { sb += '0'; i += 1 }
      sb ++= digits
    }
    sb.toString
  }

  /** Go `strconv.FormatFloat(f, 'f', -1, 64)`: shortest digits, never
    * scientific (csv output, csv_format.go:57).
    */
  def goFloatPlain(d: Double): String = {
    if (d.isNaN || d.isInfinite) return goFloat(d)
    val neg = java.lang.Double.doubleToRawLongBits(d) < 0
    if (d == 0.0) return if (neg) "-0" else "0"
    val (digits, dp) = shortestDigits(math.abs(d))
    val sb = new StringBuilder
    if (neg) sb += '-'
    if (dp <= 0) { sb ++= "0."; sb ++= "0" * (-dp); sb ++= digits }
    else if (digits.length > dp) {
      sb ++= digits.substring(0, dp); sb += '.'; sb ++= digits.substring(dp)
    } else { sb ++= digits; sb ++= "0" * (dp - digits.length) }
    sb.toString
  }

  /** Go `time.Duration.String()` over nanoseconds. */
  def goDuration(nanos: Long): String = {
    if (nanos == 0L) return "0s"
    // Long.MinValue cannot be |·|'d in two's complement (Go negates in
    // uint64 space); it IS reachable — nanosOf and goDurationU saturate
    // to MinValue on underflow — so pin Go's exact rendering for it
    if (nanos == Long.MinValue) return "-2562047h47m16.854775808s"
    val neg = nanos < 0
    var u: Long = math.abs(nanos)
    val sb = new StringBuilder
    if (u < 1000000000L) {
      // sub-second: ns / µs / ms with trimmed fraction
      val (prec, unit) =
        if (u < 1000L) (0, "ns")
        else if (u < 1000000L) (3, "µs")
        else (6, "ms")
      val (frac, whole) = fmtFrac(u, prec)
      sb.append(whole); sb ++= frac; sb ++= unit
    } else {
      val (frac, rest) = fmtFrac(u, 9)
      u = rest
      sb.append(u % 60); sb ++= frac; sb += 's'
      u /= 60
      if (u > 0) {
        sb.insert(0, (u % 60).toString + "m")
        u /= 60
        if (u > 0) sb.insert(0, u.toString + "h")
      }
    }
    (if (neg) "-" else "") + sb.toString
  }

  /** Split `v` into (trimmed ".fraction" over `prec` digits, remainder). */
  private def fmtFrac(v: Long, prec: Int): (String, Long) = {
    var u = v
    var print = false
    val buf = new StringBuilder
    var i = 0
    while (i < prec) {
      val digit = u % 10
      print = print || digit != 0
      if (print) buf.insert(0, ('0' + digit).toChar)
      u /= 10
      i += 1
    }
    (if (print) "." + buf.toString else "", u)
  }

  private val Utc = java.time.ZoneOffset.UTC
  private val Rfc3339 =
    java.time.format.DateTimeFormatter.ofPattern("uuuu-MM-dd'T'HH:mm:ssXXX")

  /** Go `t.Format(time.RFC3339)` (second precision, Z for UTC). */
  def rfc3339(instant: java.time.Instant): String =
    Rfc3339.format(instant.atOffset(Utc))

  /** Same, but at the value's own offset — Go keeps the offset parsed
    * by `time.Parse(RFC3339)` and prints it back.
    */
  def rfc3339Offset(odt: java.time.OffsetDateTime): String = Rfc3339.format(odt)

  /** The Go zero time `time.Time{}` rendered via RFC3339 — the event
    * time every batch record carries (execution/execution.go:73-91).
    */
  val ZeroTime: String = "0001-01-01T00:00:00Z"
}

/** Codegen-facing static entry points for the Go formatters: the
  * `string(x)` dialect conversion returns the octosql display string
  * (values.go:357-424) and calls these from a Catalyst `StaticInvoke`,
  * so the expression stays inside whole-stage codegen.
  */
object GoFmtJ {
  import org.apache.spark.unsafe.types.UTF8String

  def goFloatU(d: Double): UTF8String = UTF8String.fromString(GoFmt.goFloat(d))

  /** Duration from the dialect's DECIMAL(38,9)-seconds representation;
    * saturates at int64 nanosecond bounds like Go durations.
    */
  def goDurationU(secs: org.apache.spark.sql.types.Decimal): UTF8String = {
    val n = secs.toJavaBigDecimal.movePointRight(9)
      .setScale(0, java.math.RoundingMode.DOWN)
    val nanos =
      if (n.compareTo(java.math.BigDecimal.valueOf(Long.MaxValue)) > 0) Long.MaxValue
      else if (n.compareTo(java.math.BigDecimal.valueOf(Long.MinValue)) < 0) Long.MinValue
      else n.longValue()
    UTF8String.fromString(GoFmt.goDuration(nanos))
  }

  def rfc3339U(micros: Long): UTF8String = {
    val secs = Math.floorDiv(micros, 1000000L)
    val ns = Math.floorMod(micros, 1000000L) * 1000L
    UTF8String.fromString(GoFmt.rfc3339(java.time.Instant.ofEpochSecond(secs, ns)))
  }
}
