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


def test_java_decoder_quirks():
    """java.net.URLDecoder fidelity (the decoder both UrlDecoder entry
    points delegate to): '+' is a space, malformed %-patterns throw (so
    decodeMultiCharset skips that charset and UrlDecoder.decode returns
    the ORIGINAL), undecodable bytes become U+FFFD instead of raising,
    and parseInt's sign tolerance makes '%+f' byte 0x0f and '%-0' byte
    0x00 while '%-1' throws on the v < 0 check."""
    import pytest

    from zg_etl_spark.functions.search_keywords import (
        _JavaDecodeError,
        java_url_decode,
    )

    # '+' -> ' ' in every charset pass ('a+%D6%D0': UTF-8 replaces the
    # bad bytes with U+FFFD (no CJK), GBK decodes them to CJK and wins)
    assert decode_multi_charset("a+%D6%D0") == "a 中"
    # bad UTF-8 tail byte is REPLACED, not raised — UTF-8 still wins
    assert decode_multi_charset("%E4%B8%AD%FF") == "中�"
    # malformed %-pattern throws in every charset -> original survives
    assert decode_multi_charset("%zz%E4%B8%AD") == "%zz%E4%B8%AD"
    assert decode_multi_charset("%E4%B8%AD%E") == "%E4%B8%AD%E"
    assert url_decode_utf8("a%zz") == "a%zz"
    assert url_decode_utf8("50%+off") == "50%+off"
    # parseInt sign tolerance
    assert java_url_decode("%+f", "utf-8") == "\x0f"
    assert java_url_decode("%-0", "utf-8") == "\x00"
    with pytest.raises(_JavaDecodeError):
        java_url_decode("%-1", "utf-8")
    with pytest.raises(_JavaDecodeError):
        java_url_decode("% 1", "utf-8")  # int() strips space; Java throws


def test_engine_table_matches_reference():
    # SearchKeywordParser.java:38-57 — 8 engines, exact param name sets
    # (membership, walked in URL part order — see term_case)
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
    """extractKeyword walks query parts in URL order and returns the
    FIRST part whose name is in the engine's param set — even when that
    part's value is empty ('?wd=&word=x' → '', SearchKeywordParser.java
    :125-140); '' renders as no-keyword downstream, exactly like
    no-match. Engine attribution uses our deterministic list order (the
    reference's HashMap order is JVM-undefined for multi-match URLs)."""
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
            if any(name.lower() == p.lower() for p in params):
                keyword = value  # may be '' — the walk STOPS regardless
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


# ---------------------------------------------------------------------------
# Per-round FRESH-SEED URL sweep (the ritual from SURVEY.md §5): the
# fixed corpus above is regression armor; this leg triangulates
# never-before-seen URLs each round — both dialects against
# _reference_parse — stressing exactly the seams the fixed corpus
# cannot: part-order vs param-list order ('?word=x&wd=y' → x), the
# empty-value name-match STOP ('?wd=&word=x' → none), path ampersands
# before '?' ('/a&wd=evil?word=x' → x), decoy names (awd/wdx), repeated
# '?', fragments, and no-query URLs. A divergence found here gets fixed
# or documented, then pinned in the fixed corpus.
# ---------------------------------------------------------------------------
def test_fresh_seed_url_sweep(spark):
    import random

    import duckdb

    from zg_etl_spark.buildinfo import BUILD_ROUND
    from zg_etl_spark.functions.search_keywords import (
        clean_keyword,
        engine_case,
        term_case,
    )
    from zg_etl_spark.operators.domain import DUCK, SPARK

    rng = random.Random(61_000_000 + BUILD_ROUND)
    hosts = (
        ["www.baidu.com/s", "tieba.baidu.com/f", "www.google.com.hk/search",
         "google.cn/m", "www.sogou.com/web", "wap.sogou.com/x",
         "www.so.com/s", "m.so.com/index", "cn.bing.com/search",
         "m.sm.cn/s", "so.toutiao.com/search", "search.yahoo.com/search",
         "notbaidu.com/s", "example.org/page", "sogou.com.evil.net/a",
         "BAIDU.COM/S", "a.b/c&wd=pathamp", "x.soGou.Com/w"]
    )
    all_params = sorted({p for _, _, ps in ENGINES for p in ps})
    names = all_params + [p.upper() for p in all_params] + [
        "awd", "wdx", "xq", "qq", "keywords", "WORD", "KeyWord", "x", "y", ""]
    values = ["", "kw1", "a=b", '"q1"', "'q2'", " sp ", "%E4%B8%AD",
              "multi word", "'", '"', "v_1-2.3", "=",]

    def rand_url():
        host = rng.choice(hosts)
        n = rng.randrange(0, 6)
        parts = []
        for _ in range(n):
            name = rng.choice(names)
            if rng.random() < 0.12:
                parts.append(name)  # no '=' at all — skipped by the walk
            else:
                parts.append(f"{name}={rng.choice(values)}")
        q = "?" + "&".join(parts) if (parts or rng.random() < 0.3) else ""
        frag = "#frag?wd=infrag" if rng.random() < 0.15 else ""
        extra_q = "?wd=second" if rng.random() < 0.1 else ""
        return f"https://{host}{q}{extra_q}{frag}"

    urls = sorted({rand_url() for _ in range(450)})

    eng_s = engine_case(SPARK, "ref")
    kw_s = f"NULLIF({clean_keyword(SPARK, term_case(SPARK, 'ref', eng_s))}, '')"
    df = spark.createDataFrame([(u,) for u in urls], "ref string")
    got_spark = {
        r.ref: (r.eng, r.kw)
        for r in df.selectExpr("ref", f"{eng_s} AS eng", f"{kw_s} AS kw").collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t (ref VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in urls])
    eng_d = engine_case(DUCK, "ref")
    kw_d = f"NULLIF({clean_keyword(DUCK, term_case(DUCK, 'ref', eng_d))}, '')"
    got_duck = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"SELECT ref, {eng_d}, {kw_d} FROM t").fetchall()
    }

    bad = []
    for u in urls:
        want = _reference_parse(u)
        for dial, got in (("spark", got_spark[u]), ("duckdb", got_duck[u])):
            if got != want:
                bad.append((dial, u, got, want))
    assert not bad, (
        f"round-{BUILD_ROUND} url sweep: {len(bad)} divergences, "
        f"first 5: {bad[:5]}"
    )


# ---------------------------------------------------------------------------
# The wide-table UTM fallback (EventAttrTransfer.getUtmTermFromRef
# :429-457 + isSearchEngine :421-427): an independent Python port built
# on java.net.URI/URLDecoder semantics (via java_url_decode), compared
# against the dual-dialect SQL on a closed-alphabet corpus — pinning the
# host set (toutiao/yahoo excluded, google.co included), the exact-case
# param name, LAST-duplicate-wins, decode-before-split (%26 in a value
# splits a bogus pair), the two decode layers, and the '='-split rules.
# ---------------------------------------------------------------------------
def _ref_utm_fallback(url):
    """The exact getUtmTermFromRef port (JVM-fixture-pinned, mode 'ut'),
    rendered at the SQL contract: \\N and '' both → None (the caller's
    ensureLength turns '' into \\N; the SQL NULLIFs)."""
    from zg_etl_spark.functions.search_keywords import ref_utm_term_from_ref

    got = ref_utm_term_from_ref(url)
    return None if got in ("\\N", "") else got


def test_utm_fallback_sql_matches_java_port(spark):
    import duckdb

    from zg_etl_spark.buildinfo import BUILD_ROUND
    from zg_etl_spark.functions.search_keywords import utm_term_fallback
    from zg_etl_spark.operators.domain import DUCK, SPARK

    import random
    rng = random.Random(67_000_000 + BUILD_ROUND)
    # scheme-ful refs only, values within the closed decode alphabet —
    # the SQL model's documented scope (utm_term_fallback docstring);
    # the Python port itself is held to FULL java.net.URI fidelity by
    # the JVM fixture (mode 'ut'), so within-scope agreement here means
    # SQL ≡ port ≡ reference
    rawhosts = ["www.sogou.com", "wap.sogou.com", "cn.bing.com",
                "www.so.com", "m.sm.cn", "www.google.com",
                "www.google.co.jp", "www.baidu.com", "so.toutiao.com",
                "search.yahoo.com", "example.org",
                # server-parse failures → getHost() null → \N
                "www_x.sogou.com", "-a.sogou.com", "a-.bing.com",
                "www.sogou.com.123", "www.SOGOU.com",
                # userinfo / ports
                "u@www.sogou.com", "u:p@cn.bing.com",
                "www.sogou.com:8080", "www.so.com:", "m.sm.cn:8a",
                "www.sogou.com."]
    names = ["q", "query", "Q", "QUERY", "wd", "x", ""]
    vals = ["", "kw1", "a%26b", "%E4%B8%AD", "x+y", "%2520z", "v-1",
            # URI-illegal → whole ref \N; layer-2 throw → \N
            "a b", "a\"b", "a%zz", "a%2", "100%25", "a%3Db", "a|b"]

    def rand_url():
        host = rng.choice(rawhosts) + rng.choice(["/web", "/s/x", ""])
        parts = []
        for _ in range(rng.randrange(0, 4)):
            n = rng.choice(names)
            parts.append(n if rng.random() < 0.15
                         else f"{n}={rng.choice(vals)}")
        q = "?" + "&".join(parts) if parts or rng.random() < 0.3 else ""
        r = rng.random()
        frag = ("#f?q=infrag" if r < 0.12        # '#' before any '?'
                else "#frag" if r < 0.2 else "")
        if r < 0.12 and q:
            q, frag = "", frag + q               # move query behind '#'
        return f"https://{host}{q}{frag}"

    urls = sorted({rand_url() for _ in range(450)})

    got_spark = {
        r.ref: r.kw
        for r in spark.createDataFrame([(u,) for u in urls], "ref string")
        .selectExpr("ref", f"{utm_term_fallback(SPARK, 'ref')} AS kw")
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (ref VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in urls])
    got_duck = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT ref, {utm_term_fallback(DUCK, 'ref')} FROM t"
        ).fetchall()
    }

    bad = []
    for u in urls:
        want = _ref_utm_fallback(u)
        for dial, got in (("spark", got_spark[u]), ("duckdb", got_duck[u])):
            if got != want:
                bad.append((dial, u, got, want))
    assert not bad, (
        f"round-{BUILD_ROUND} utm-fallback sweep: {len(bad)} divergences, "
        f"first 5: {bad[:5]}"
    )
