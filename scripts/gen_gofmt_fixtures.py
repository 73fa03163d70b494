#!/usr/bin/env python3
"""Generate committed differential-test vectors for graft.octo.GoFmt.

Ground truth is computed INDEPENDENTLY of the JVM implementation:
CPython's float repr supplies the shortest round-tripping decimal
digits (David Gay / Ryu machinery, not BigDecimal rounding searches),
and the formatting rules re-assemble them per Go's public documentation:

 - fmt.Sprint(float64): strconv shortest 'g' with the shortest-mode
   exponent threshold eprec=6 -> scientific iff exp < -4 or exp >= 6
 - strconv.FormatFloat(f, 'f', -1, 64): positional always
 - time.Duration.String(): h/m/s with 9-digit trimmed fraction,
   ns/us/ms sub-second forms (algorithm from Go's public time.go docs)

The TSV outputs are committed under src/test/resources and replayed by
GoFmtVectorsSpec, locking byte parity against JDK updates (JDK 17's
Double.toString is not shortest, JDK-4511638 — the Scala side carries
its own digit search whose behavior these vectors pin down).

Regeneration: python3 scripts/gen_gofmt_fixtures.py  (deterministic).
"""
import math
import random
import struct
import os

SEED = 20260814
N_RANDOM_BITS = 4000
N_UNIFORM = 2000
N_EXP10 = 2000
N_INT = 1000
N_DECIMAL = 1000
OUT_DIR = os.path.join(os.path.dirname(__file__), "..",
                       "src", "test", "resources")


def shortest_digits(x: float):
    """(digits, dp): value = 0.digits * 10^dp, digits has no trailing 0."""
    r = repr(abs(x))
    if "e" in r or "E" in r:
        mant, _, exp = r.lower().partition("e")
        e = int(exp)
    else:
        mant, e = r, 0
    if "." in mant:
        ip, _, fp = mant.partition(".")
    else:
        ip, fp = mant, ""
    digits = (ip + fp).lstrip("0")
    dp = len(ip.lstrip("0")) + e if ip.lstrip("0") else e - (
        len(fp) - len(fp.lstrip("0")))
    digits = digits.rstrip("0")
    if not digits:
        digits = "0"
    return digits, dp


def go_g(x: float) -> str:
    if math.isnan(x):
        return "NaN"
    if math.isinf(x):
        return "+Inf" if x > 0 else "-Inf"
    neg = math.copysign(1.0, x) < 0
    if x == 0.0:
        return "-0" if neg else "0"
    digits, dp = shortest_digits(x)
    exp = dp - 1
    sb = "-" if neg else ""
    if exp < -4 or exp >= 6:
        sb += digits[0]
        if len(digits) > 1:
            sb += "." + digits[1:]
        sb += "e" + ("-" if exp < 0 else "+")
        ae = abs(exp)
        sb += ("0" + str(ae)) if ae < 10 else str(ae)
    elif exp >= 0:
        if len(digits) > dp:
            sb += digits[:dp] + "." + digits[dp:]
        else:
            sb += digits + "0" * (dp - len(digits))
    else:
        sb += "0." + "0" * (-dp) + digits
    return sb


def go_f_plain(x: float) -> str:
    if math.isnan(x) or math.isinf(x):
        return go_g(x)
    neg = math.copysign(1.0, x) < 0
    if x == 0.0:
        return "-0" if neg else "0"
    digits, dp = shortest_digits(x)
    sb = "-" if neg else ""
    if dp <= 0:
        sb += "0." + "0" * (-dp) + digits
    elif len(digits) > dp:
        sb += digits[:dp] + "." + digits[dp:]
    else:
        sb += digits + "0" * (dp - len(digits))
    return sb


def fmt_frac(v: int, prec: int):
    buf = ""
    printing = False
    for _ in range(prec):
        digit = v % 10
        printing = printing or digit != 0
        if printing:
            buf = chr(ord("0") + digit) + buf
        v //= 10
    return (("." + buf) if printing else ""), v


def go_duration(ns: int) -> str:
    if ns == 0:
        return "0s"
    neg = ns < 0
    u = -ns if neg else ns
    if u < 1_000_000_000:
        if u < 1000:
            prec, unit = 0, "ns"
        elif u < 1_000_000:
            prec, unit = 3, "µs"
        else:
            prec, unit = 6, "ms"
        frac, whole = fmt_frac(u, prec)
        s = str(whole) + frac + unit
    else:
        frac, u = fmt_frac(u, 9)
        s = str(u % 60) + frac + "s"
        u //= 60
        if u > 0:
            s = str(u % 60) + "m" + s
            u //= 60
            if u > 0:
                s = str(u) + "h" + s
    return ("-" if neg else "") + s


def main():
    rng = random.Random(SEED)
    floats = []
    # hand-picked boundary cases (thresholds, JDK-4511638 shapes,
    # signed zero, denormals, extremes)
    for v in [0.0, -0.0, 1.0, -1.0, 0.5, 1.5, 42.0, 100000.0, 999999.0,
              1000000.0, 999999.5, 1e-4, 9.999e-5, 1e-5, 1e6, 1e7, 1e20,
              1e21, 1e22, 1e23, 9.999999999999999e22, 123456.0, 1234567.0,
              0.1, 0.2, 0.30000000000000004, 2.0 ** -1074, 2.0 ** -1022,
              (2.0 - 2.0 ** -52) * 2.0 ** 1023, 1.7976931348623157e308,
              5e-324, 18248328.0, 3.141592653589793, 2.718281828459045,
              6.02214076e23, 1.602176634e-19, float("inf"), float("-inf"),
              float("nan")]:
        floats.append(v)
    # random bit patterns: the whole double space incl. denormals
    for _ in range(N_RANDOM_BITS):
        bits = rng.getrandbits(64)
        (v,) = struct.unpack("<d", struct.pack("<Q", bits))
        floats.append(v)  # NaN/Inf kept: specials must stay locked too
    for _ in range(N_UNIFORM):
        floats.append(rng.uniform(-1e6, 1e6))
    for _ in range(N_EXP10):
        floats.append(rng.uniform(-1, 1) * 10.0 ** rng.randint(-320, 308))
    for _ in range(N_INT):
        floats.append(float(rng.randint(-10**15, 10**15)))
    for _ in range(N_DECIMAL):
        floats.append(round(rng.uniform(-1e4, 1e4), rng.randint(0, 6)))

    os.makedirs(OUT_DIR, exist_ok=True)
    fpath = os.path.join(OUT_DIR, "gofmt_float_vectors.tsv")
    with open(fpath, "w") as f:
        for v in floats:
            (bits,) = struct.unpack("<Q", struct.pack("<d", v))
            f.write(f"{bits:016x}\t{go_g(v)}\t{go_f_plain(v)}\n")
    print(f"{fpath}: {len(floats)} vectors")

    durations = [0, 1, -1, 999, 1000, 1001, 999999, 1_000_000, 1_000_001,
                 999_999_999, 1_000_000_000, 1_000_000_001, 1_500_000_000,
                 59_999_999_999, 60_000_000_000, 61_000_000_000,
                 3_599_000_000_000, 3_600_000_000_000, 3_661_000_000_000,
                 86_400_000_000_000, 2**63 - 1, -(2**63 - 1), -(2**63),
                 2_333_333_333, -2_333_333_333]
    for _ in range(2000):
        durations.append(rng.getrandbits(rng.randint(1, 63)) *
                         rng.choice([1, -1]))
    for _ in range(2000):
        # second-ish and hour-ish magnitudes where the h/m/s split lives
        durations.append(rng.randint(-10**15, 10**15))
    dpath = os.path.join(OUT_DIR, "gofmt_duration_vectors.tsv")
    with open(dpath, "w") as f:
        for ns in durations:
            f.write(f"{ns}\t{go_duration(ns)}\n")
    print(f"{dpath}: {len(durations)} vectors")


if __name__ == "__main__":
    main()
