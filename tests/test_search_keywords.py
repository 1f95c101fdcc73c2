"""Search-keyword extraction (E3/E4) — unit tests for the parts the
dual-dialect oracle cannot check: the multi-charset percent-decode
(UrlDecoder.java:48-71) and the Spark DataFrame helper. Fixtures are
byte-level: expected values computed by hand from the charset tables,
not by running the implementation."""

from __future__ import annotations

from zg_etl_spark.functions.search_keywords import (
    ENGINES,
    decode_multi_charset,
    url_decode_utf8,
    with_search_keyword,
)

# 中文 is U+4E2D U+6587: UTF-8 e4 b8 ad e6 96 87, GBK d6 d0 ce c4
UTF8_ZH = "%E4%B8%AD%E6%96%87"
GBK_ZH = "%D6%D0%CE%C4"


def test_decode_utf8_chinese():
    assert decode_multi_charset(UTF8_ZH + "_7") == "中文_7"


def test_decode_gbk_chinese():
    # not valid UTF-8 (0xD6 0xD0 is a bad sequence) -> falls through to GBK
    assert decode_multi_charset(GBK_ZH) == "中文"


def test_decode_ascii_stays_encoded():
    # no charset yields a CJK char -> reference returns the ORIGINAL
    assert decode_multi_charset("kw%20space") == "kw%20space"
    assert decode_multi_charset("plain") == "plain"


def test_decode_empty_and_none():
    assert decode_multi_charset(None) is None
    assert decode_multi_charset("") == ""


def test_url_decode_utf8_double_encoded():
    assert url_decode_utf8("kw%2520x") == "kw x"
    assert url_decode_utf8("a%20b") == "a b"


def test_engine_table_matches_reference():
    # SearchKeywordParser.java:38-57 — 8 engines, exact param priority
    table = {e: params for e, _, params in ENGINES}
    assert table == {
        "baidu": ["wd", "word", "kw"],
        "google": ["q", "query"],
        "sogou": ["query", "keyword"],
        "360": ["q"],
        "bing": ["q"],
        "shenma": ["q"],
        "toutiao": ["keyword"],
        "yahoo": ["p"],
    }


def test_with_search_keyword_dataframe(spark):
    rows = [
        ("https://www.baidu.com/s?word=" + UTF8_ZH,),  # 2nd-priority param
        ("https://www.sogou.com/web?query=" + GBK_ZH,),  # GBK fallback
        ("https://www.so.com/s?Q=kw_1",),  # case-insensitive param
        ("https://search.yahoo.com/search?p=%22quoted%22",),
        ("https://example.com/page?q=notasearch",),
        (None,),
    ]
    df = with_search_keyword(
        spark.createDataFrame(rows, "ref string"), "ref"
    )
    got = {r.ref: (r.search_engine, r.search_keyword) for r in df.collect()}
    assert got[rows[0][0]] == ("baidu", "中文")
    assert got[rows[1][0]] == ("sogou", "中文")
    assert got[rows[2][0]] == ("360", "kw_1")
    # ascii keyword stays percent-encoded; quote stripping applies to the
    # raw value's edges only (the %22 are mid-string after extraction)
    assert got[rows[3][0]] == ("yahoo", "%22quoted%22")
    assert got[rows[4][0]][0] is None
    assert got[None] == (None, None)


# ---------------------------------------------------------------------------
# Independent oracle: a direct Python transliteration of the REFERENCE
# algorithm (SearchKeywordParser.java:60-143 — find engine by pattern,
# split the query string on '&', first case-insensitive param match) run
# against the SQL fragments over a generated URL corpus. The two
# implementations share no code or dialect template.
# ---------------------------------------------------------------------------
def _reference_parse(url):
    import re

    if not url:
        return (None, None)
    engine = None
    for eng, pat, _ in ENGINES:
        if re.search(pat, url, re.IGNORECASE):
            engine = eng
            break
    if engine is None:
        return (None, None)
    params = dict(ENGINES_PARAMS)[engine]
    q = url.find("?")
    keyword = None
    if q != -1:
        for part in url[q + 1:].split("&"):
            eq = part.find("=")
            if eq == -1:
                continue
            name, value = part[:eq], part[eq + 1:]
            if any(name.lower() == p.lower() for p in params) and value:
                keyword = value
                break
    if keyword:
        keyword = keyword.strip()
        for ch in ('"', "'"):
            if keyword.startswith(ch):
                keyword = keyword[1:]
            if keyword.endswith(ch):
                keyword = keyword[:-1]
    return (engine, keyword or None)


ENGINES_PARAMS = [(e, p) for e, _, p in ENGINES]


def test_sql_extraction_matches_reference_model(spark):
    hosts = [
        "www.baidu.com/s", "www.google.com.hk/search", "www.sogou.com/web",
        "www.so.com/s", "cn.bing.com/search", "m.sm.cn/s",
        "so.toutiao.com/search", "search.yahoo.com/search",
        "example.org/page", "news.site.net/a",
    ]
    qsets = [
        "", "?wd=alpha", "?word=beta&x=1", "?kw=gamma", "?q=delta",
        "?QUERY=epsilon", "?keyword=zeta", "?p=eta", "?x=1&q=theta",
        "?q=", "?q='quoted'&y=2", "?noise", "?Q=%E4%B8%AD",
    ]
    urls = [f"https://{h}{q}" for h in hosts for q in qsets]
    from zg_etl_spark.functions.search_keywords import (
        clean_keyword,
        engine_case,
        term_case,
    )
    from zg_etl_spark.operators.domain import SPARK

    df = spark.createDataFrame([(u,) for u in urls], "ref string")
    out = df.selectExpr(
        "ref",
        f"{engine_case(SPARK, 'ref')} AS eng",
        f"NULLIF({clean_keyword(SPARK, term_case(SPARK, 'ref', engine_case(SPARK, 'ref')))}, '') AS kw",
    ).collect()
    for r in out:
        expect = _reference_parse(r.ref)
        assert (r.eng, r.kw) == expect, f"{r.ref}: sql={(r.eng, r.kw)} ref={expect}"
