#!/usr/bin/env python3
"""Generate Jaro / Jaro-Winkler differential fixtures from DuckDB.

Writes src/test/resources/jaro_vectors.tsv: one `a<TAB>b<TAB>jaro<TAB>jw`
line per pair, doubles rendered with repr (shortest round-trip). The
ground truth is DuckDB's implementation — the engine the driver's
oracle runs — so JaroWinklerSpec locks graft's kernel to it.

Deterministic: seeded RNG, fixed edge-case list first.
"""
import random
import duckdb

OUT = "src/test/resources/jaro_vectors.tsv"

edge = [
    ("", ""), ("a", ""), ("", "a"), ("a", "a"), ("ab", "ba"),
    ("abc", "abc"), ("ABC", "abc"), ("martha", "marhta"),
    ("dwayne", "duane"), ("dixon", "dicksonx"), ("crate", "trace"),
    ("arnab", "raanb"), ("aaaa", "aaaaaaaaaaaaaaaaaaaa"),
    ("axxxxxxx", "ayyyyyyy"), ("ab", "abcdefghijklmnop"),
    ("prefix_same", "prefix_diff"), ("abcd", "abdc"),
    ("x" * 64, "x" * 63 + "y"), ("x" * 64, "y" + "x" * 63),
]

rng = random.Random(20260815)
alpha = "abcdefghij"  # small alphabet -> frequent partial matches
pairs = list(edge)
for _ in range(12000):
    la = rng.randint(0, 24)
    lb = rng.randint(0, 24)
    a = "".join(rng.choice(alpha) for _ in range(la))
    if rng.random() < 0.5:
        # perturb a: delete/swap/replace a few chars (near-dup regime)
        b = list(a)
        for _ in range(rng.randint(0, 3)):
            if not b:
                break
            op = rng.randint(0, 2)
            i = rng.randrange(len(b))
            if op == 0:
                del b[i]
            elif op == 1 and i + 1 < len(b):
                b[i], b[i + 1] = b[i + 1], b[i]
            else:
                b[i] = rng.choice(alpha)
        b = "".join(b)
    else:
        b = "".join(rng.choice(alpha) for _ in range(lb))
    pairs.append((a, b))

con = duckdb.connect()
with open(OUT, "w") as f:
    for a, b in pairs:
        j, jw = con.execute(
            "SELECT jaro_similarity(?, ?), jaro_winkler_similarity(?, ?)",
            [a, b, a, b]).fetchone()
        f.write(f"{a}\t{b}\t{j!r}\t{jw!r}\n")
print(f"wrote {len(pairs)} vectors to {OUT}")
