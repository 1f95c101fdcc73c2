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
