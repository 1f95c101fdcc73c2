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
            if m.lastindex and m.lastindex > 1 and m.group(2):
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
