"""Property-fuzz the IPv6 textual normalization against the stdlib.

p53's '::'-expansion + fixed-width-hex key derivation is hand-rolled
SQL string surgery; its 16 fixture cases can't cover the grammar's
corner space (group counts, zero-run positions, letter case, leading
zeros, malformed colon runs). This harness generates a seeded corpus of
valid and mutated colon-form addresses and pins the EXACT production
expression (`ipv6_hex32_sql`, the same template _p53 renders) against
`ipaddress.IPv6Address` in BOTH dialects: valid text must normalize to
the stdlib's 128-bit value as 32 hex digits, invalid text must yield
NULL. The generator stays inside p53's closed alphabet — no dotted
embeds (v4-mapped routes to the v4 lane before this expression), no
'%zone' scopes (documented out of scope).
"""
from __future__ import annotations

import ipaddress
import random

import duckdb
import pytest

from zg_etl_spark.operators.domain import DUCK, SPARK
from zg_etl_spark.plans.pipeline import ipv6_hex32_sql


def _corpus(seed: int = 20260815, n_valid: int = 150, n_bad: int = 120):
    rng = random.Random(seed)
    cases = []

    def group(maxlen=4):
        return format(rng.randrange(16 ** rng.randint(1, maxlen)), "x")

    for _ in range(n_valid):
        groups = [group() for _ in range(8)]
        form = rng.random()
        if form < 0.45:
            # compress a random zero run (possibly length 8)
            start = rng.randrange(8)
            length = rng.randint(1, 8 - start)
            for i in range(start, start + length):
                groups[i] = "0"
            text = ":".join(groups[:start]) + "::" + \
                ":".join(groups[start + length:])
        elif form < 0.6:
            # full form with random zero-padding
            text = ":".join(
                g.zfill(rng.randint(len(g), 4)) for g in groups)
        else:
            text = ":".join(groups)
        if rng.random() < 0.3:
            text = text.upper()
        cases.append(text)

    base = "1:2:3:4:5:6:7:8"
    mutations = [
        lambda s, r: s + ":" + group(),              # 9 groups
        lambda s, r: s.replace(":", "::", 1) + "::1",  # two '::'
        lambda s, r: s.replace("1", "g", 1),          # bad hex digit
        lambda s, r: ":::".join(s.split(":", 1)),     # ':::' run
        lambda s, r: ":" + s,                          # leading lone colon
        lambda s, r: s + ":",                          # trailing lone colon
        lambda s, r: s.replace(":", "", 1),           # 7 groups
        lambda s, r: s.replace("4", "12345", 1),      # 5-digit group
        lambda s, r: "::" + s,                         # ':: + 8 groups' (no room)
        lambda s, r: s.replace(":", ": ", 1),         # stray space
    ]
    for _ in range(n_bad):
        m = rng.choice(mutations)
        cases.append(m(base, rng))
    cases += ["::", "::1", "1::", ":", "::::", "abcd", ""]
    return cases


def _expected(text: str):
    try:
        return format(int(ipaddress.IPv6Address(text.lower())), "032x")
    except (ipaddress.AddressValueError, ValueError):
        return None


@pytest.fixture(scope="module")
def corpus():
    return _corpus()


def test_duckdb_normalization_matches_stdlib(corpus):
    rows = ", ".join(
        "(%d, '%s')" % (i, c.replace("'", "''")) for i, c in enumerate(corpus)
    )
    inner = (f"SELECT i, lower(t) AS low "
             f"FROM (VALUES {rows}) AS f(i, t)")
    sql = ipv6_hex32_sql(DUCK, inner, "i")
    got = {r[0]: r[2] for r in duckdb.sql(sql).fetchall()}
    bad = []
    for i, c in enumerate(corpus):
        exp = _expected(c)
        if got[i] != exp:
            bad.append((c, got[i], exp))
    assert not bad, bad[:10]
    assert sum(1 for c in corpus if _expected(c)) >= 150  # corpus sanity
    assert sum(1 for c in corpus if _expected(c) is None) >= 100


def test_spark_normalization_matches_stdlib(spark, corpus):
    rows = ", ".join(
        "(%d, '%s')" % (i, c.replace("'", "''")) for i, c in enumerate(corpus)
    )
    inner = (f"SELECT i, lower(t) AS low "
             f"FROM (VALUES {rows}) AS f(i, t)")
    sql = ipv6_hex32_sql(SPARK, inner, "i")
    got = {r["i"]: r["hex32"] for r in spark.sql(sql).collect()}
    bad = []
    for i, c in enumerate(corpus):
        exp = _expected(c)
        if got[i] != exp:
            bad.append((c, got[i], exp))
    assert not bad, bad[:10]
