"""UA parser (E2) — hand-computed expectations per rule-order edge:
Edge before Chrome, WeChat before Chrome, Safari with tokens between
Version and Safari, Android-without-Mobile = TABLET, iOS 16_6 → 16.6."""

from __future__ import annotations

from zg_etl_spark.functions import ua_parser as UP
from zg_etl_spark.operators.domain import SPARK

CASES = [
    (
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36"
        " (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91",
        ("Windows", "10.0", "Edge", "120", "COMPUTER", None),
    ),
    (
        "Mozilla/5.0 (iPhone; CPU iPhone OS 16_6 like Mac OS X)"
        " AppleWebKit/605.1.15 (KHTML, like Gecko) Version/16.6"
        " Mobile/15E148 Safari/604.1",
        ("iOS", "16.6", "Safari", "16", "MOBILE", "Apple"),
    ),
    (
        "Mozilla/5.0 (Linux; Android 12; HUAWEI MatePad) AppleWebKit/537.36"
        " (KHTML, like Gecko) Chrome/99.0.4844.88 Safari/537.36"
        " MicroMessenger/8.0.47",
        ("Android", "12", "WeChat", "8", "TABLET", "Huawei"),
    ),
    (
        "Mozilla/5.0 (Linux; Android 13; SM-G991B) AppleWebKit/537.36"
        " (KHTML, like Gecko) Chrome/119.0.6045.163 Mobile Safari/537.36",
        ("Android", "13", "Chrome", "119", "MOBILE", "Samsung"),
    ),
    ("curl/8.4.0", ("UNKNOWN", None, "UNKNOWN", None, "UNKNOWN", None)),
]


def test_ua_parser_cases(spark):
    df = spark.createDataFrame([(ua,) for ua, _ in CASES], "ua string")
    out = df.selectExpr(
        "ua",
        f"{UP.os_family(SPARK, 'ua')} AS fam",
        f"{UP.os_version(SPARK, 'ua')} AS ver",
        f"{UP.browser(SPARK, 'ua')} AS br",
        f"{UP.browser_major(SPARK, 'ua')} AS bv",
        f"{UP.device_type(SPARK, 'ua')} AS dev",
        f"{UP.brand(SPARK, 'ua')} AS brand",
    ).collect()
    got = {r.ua: (r.fam, r.ver, r.br, r.bv, r.dev, r.brand) for r in out}
    for ua, expect in CASES:
        assert got[ua] == expect, f"{ua}: {got[ua]} != {expect}"


def test_ua_analysis_conformance_both_dialects(spark):
    """ToolUtil.uaAnalysis (ToolUtil.java:145-179) re-expressed as SQL:
    both dialects must agree with an independent pure-Python port of the
    Java — Android branch (case-SENSITIVE contains, case-insensitive
    regex), iPhone/iPad capture with original casing, '_'→'.' version
    cleanup, the version-less Opera alternative, and the no-match ''."""
    import re

    import duckdb

    from zg_etl_spark.operators.domain import DUCK

    def ref(ua):
        if ua is None:
            return ":"
        if "Android" in ua:
            m = re.search(r"linux;.*(android).([\w.,/\-]+)", ua, re.I)
        else:
            m = re.search(
                r"(ip[honead]+)(?:.*os.([\w.,/\-]+).like|;\sopera)", ua, re.I
            )
        name, ver = "", ""
        if m:
            name = m.group(1)
            # Java: version = matcher.group(2); null skips the cleanup
            # and `name + ":" + version` renders the LITERAL 'null'
            # (ToolUtil.java:171-177, the version-less Opera alternative)
            if m.group(2) is None:
                ver = "null"
            else:
                ver = re.sub(r"[^a-zA-Z0-9 ]", ".", m.group(2))
        return f"{name}:{ver}"

    cases = [ua for ua, _ in CASES] + ["iPhone; Opera Mini", "curl/8.4.0"]
    con = duckdb.connect()
    for ua in cases:
        lit = "'" + ua.replace("'", "''") + "'"
        s = spark.sql(
            f"SELECT {UP.ua_analysis_name(SPARK, lit)}, "
            f"{UP.ua_analysis_version(SPARK, lit)}"
        ).collect()[0]
        k = con.execute(
            f"SELECT {UP.ua_analysis_name(DUCK, lit)}, "
            f"{UP.ua_analysis_version(DUCK, lit)}"
        ).fetchone()
        want = ref(ua)
        assert f"{s[0]}:{s[1]}" == want, f"spark {ua!r}: {s} != {want}"
        assert f"{k[0]}:{k[1]}" == want, f"duckdb {ua!r}: {k} != {want}"


# ---------------------------------------------------------------------------
# Per-round FRESH-SEED UA sweep (the SURVEY.md §5 ritual): random
# fragment-composed UA strings each round, both dialects against the
# Java port above — stressing the seams the fixed cases cannot: the
# case-SENSITIVE contains("Android") branch gate vs case-insensitive
# regexes ('ANDROID' routes to the iOS pattern), the version-less Opera
# alternative's literal-'null' rendering, '_'/','/'/'-heavy versions,
# decoy 'ipad'-letter runs (ip[honead]+ matches 'ipod'/'iphone'/'ipad'
# but also 'ipand'...), and missing '.like' tails.
# ---------------------------------------------------------------------------
def test_ua_analysis_fresh_seed_sweep(spark):
    import random
    import re

    import duckdb

    from zg_etl_spark.buildinfo import BUILD_ROUND
    from zg_etl_spark.operators.domain import DUCK

    def ref(ua):
        if ua is None:
            return ":"
        if "Android" in ua:
            m = re.search(r"linux;.*(android).([\w.,/\-]+)", ua, re.I)
        else:
            m = re.search(
                r"(ip[honead]+)(?:.*os.([\w.,/\-]+).like|;\sopera)", ua, re.I
            )
        name, ver = "", ""
        if m:
            name = m.group(1)
            if m.group(2) is None:
                ver = "null"
            else:
                ver = re.sub(r"[^a-zA-Z0-9 ]", ".", m.group(2))
        return f"{name}:{ver}"

    rng = random.Random(59_000_000 + BUILD_ROUND)
    prefixes = ["Mozilla/5.0 ", "", "Opera/9.80 ", "mozilla/4.0 "]
    bodies = [
        "(Linux; U; Android {v}; zh-cn; X) ",
        "(Linux; Android {v}) ",
        "(linux; android {v}) ",
        "(LINUX; ANDROID {v}) ",
        "(Android {v}; Mobile) ",          # no 'linux;' -> android no-match
        "(iPhone; CPU iPhone OS {v} like Mac OS X) ",
        "(iPad; CPU OS {v} like Mac OS X) ",
        "(ipod touch; cpu os {v} like) ",
        "(iPhone; Opera", "(iPad;  Opera",  # double space: \s matches once
        "(iphone; opera Mini) ", "(IPAD; OPERA) ",
        "(iPhone; CPU OS {v}) ",            # no 'like' tail
        "(Windows NT 10.0; Win64) ",
        "(Macintosh; Intel Mac OS X 10.15) ",
        "ipand os {v} like ",               # decoy [honead]+ run
        "shipone os {v} like ",             # 'ip' mid-word
    ]
    tails = ["AppleWebKit/537.36", "Safari/604.1", "", "like Gecko"]
    vers = ["13", "16_6", "17.2.1", "4.2,1", "a-b/c", "10_0_1", "X",
            "1__2", "9-", "..", "16 6"]

    def rand_ua():
        body = rng.choice(bodies).replace("{v}", rng.choice(vers))
        return (rng.choice(prefixes) + body + rng.choice(tails)).strip()

    uas = sorted({rand_ua() for _ in range(400)})

    from zg_etl_spark.functions.ua_parser import (
        ua_analysis_name,
        ua_analysis_version,
    )

    got_spark = {
        r.ua: f"{r.n}:{r.v}"
        for r in spark.createDataFrame([(u,) for u in uas], "ua string")
        .selectExpr(
            "ua",
            f"{ua_analysis_name(SPARK, 'ua')} AS n",
            f"{ua_analysis_version(SPARK, 'ua')} AS v",
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (ua VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in uas])
    got_duck = {
        r[0]: f"{r[1]}:{r[2]}"
        for r in con.execute(
            f"SELECT ua, {ua_analysis_name(DUCK, 'ua')}, "
            f"{ua_analysis_version(DUCK, 'ua')} FROM t").fetchall()
    }

    bad = []
    for u in uas:
        want = ref(u)
        for dial, got in (("spark", got_spark[u]), ("duckdb", got_duck[u])):
            if got != want:
                bad.append((dial, u, got, want))
    assert not bad, (
        f"round-{BUILD_ROUND} ua sweep: {len(bad)} divergences, "
        f"first 5: {bad[:5]}"
    )
