"""Search-engine keyword extraction (E3/E4).

Re-expresses the reference's ``SearchKeywordParser`` + ``UrlDecoder``
(reference: etl-flink-common/src/main/java/com/zhugeio/etl/common/util/
SearchKeywordParser.java:36-143, UrlDecoder.java:20-60) Spark-first:

- engine identification and per-engine keyword-param priority are pure
  SQL fragments rendered for BOTH dialects (Spark SQL engine / DuckDB
  oracle) from the single ``ENGINES`` table below, so they run JVM-side
  inside whole-stage codegen — no Python in the hot path;
- the multi-charset percent-decode (UTF-8 → GBK → GB2312 → ISO-8859-1
  with accept-on-Chinese, UrlDecoder.java:48-71) has no SQL equivalent
  in either dialect, so it ships as an Arrow-batched pandas UDF applied
  AFTER the SQL extraction, unit-tested against byte-level fixtures.

The reference keeps its engine patterns in a ``HashMap`` (iteration
order unspecified, SearchKeywordParser.java:38-47); we fix the
declaration order below so results are deterministic — ambiguity only
arises for URLs matching two engine domains, which real referrers don't.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas-UDF type hints resolve by name

# (engine, host regex, keyword param names) — SearchKeywordParser.java:
# 38-57. Patterns are case-insensitive (Pattern.CASE_INSENSITIVE) and
# unanchored (Matcher.find). The param list is a MEMBERSHIP set, not a
# priority order — extractKeyword walks the URL's query parts in URL
# order and returns the first part whose name is in the set (:125-140).
# The reference stores its patterns in a HashMap, so when a URL matches
# MORE THAN ONE engine pattern the reference's attribution order is
# JVM-identity-hash order (undefined across runs); this deterministic
# list order is our modeling choice for that degenerate class.
ENGINES: list[tuple[str, str, list[str]]] = [
    ("baidu", r"baidu\.com", ["wd", "word", "kw"]),
    ("google", r"google\.(com|cn|com\.hk)", ["q", "query"]),
    ("sogou", r"sogou\.com", ["query", "keyword"]),
    ("360", r"so\.com", ["q"]),
    ("bing", r"bing\.com", ["q"]),
    ("shenma", r"sm\.cn", ["q"]),
    ("toutiao", r"toutiao\.com", ["keyword"]),
    ("yahoo", r"yahoo\.com", ["p"]),
]


def engine_case(d, ref: str) -> str:
    """CASE chain yielding the engine name or NULL (reference 'unknown')."""
    whens = " ".join(
        f"WHEN {d.rlike(ref, '(?i)' + pat)} THEN '{eng}'" for eng, pat, _ in ENGINES
    )
    return f"CASE {whens} END"


def term_case(d, ref: str, engine: str) -> str:
    """Raw (undecoded) keyword for the identified engine. The reference's
    extractKeyword (SearchKeywordParser.java:107-143) splits the query
    string (after the FIRST '?'; no '?' → no keyword) on '&' and walks
    the parts IN URL ORDER, returning the first part whose NAME
    (everything before the part's first '=', equalsIgnoreCase) is one of
    the engine's keyword params — even when that part's VALUE is empty
    ('?wd=&word=x' yields '', not 'x'; the param list is a membership
    set, NOT a priority order). One leftmost-match regexp over the
    query substring encodes exactly that walk: the alternation matches
    whichever param name appears first, and an empty capture is the
    empty-value return (indistinguishable from no-match downstream,
    just as the reference's "" is)."""
    q = f"substring({ref}, instr({ref}, '?') + 1)"
    whens = []
    for eng, _, params in ENGINES:
        pat = d.re_lit("(?i)(^|&)(" + "|".join(params) + ")=([^&]*)")
        whens.append(
            f"WHEN '{eng}' THEN CASE WHEN instr({ref}, '?') > 0 "
            f"THEN NULLIF(regexp_extract({q}, {pat}, 3), '') END"
        )
    return f"CASE {engine} " + " ".join(whens) + " END"


def clean_keyword(d, kw: str) -> str:
    """cleanKeyword (SearchKeywordParser.java:150-163): trim, then strip
    one leading/trailing double quote, then one leading/trailing single
    quote (each replaceAll is anchored, so at most one char per edge)."""
    out = f"trim({kw})"
    for pat in ('^"', '"$', "^'", "'$"):
        out = f"regexp_replace({out}, {d.re_lit(pat)}, '')"
    return out


# --- EventAttrTransfer's wide-table UTM lane (R3/E4) -----------------------
# isSearchEngine + getUtmTermFromRef (EventAttrTransfer.java:421-465) —
# a SECOND, independent keyword parser the wide-table transfer applies,
# NOT SearchKeywordParser: the engine test is a case-SENSITIVE substring
# check on the $referrer_domain against a 7-host set (toutiao and yahoo
# are NOT search engines here — their rows take the 引荐 lane — while
# '.google.co' additionally covers google.co.jp etc.), and the keyword
# fallback reads 'query' (sogou) / 'q' (bing, so, sm, google) from a
# HashMap built over the URI's DECODED query (decode-before-split: a
# %26 inside a value splits a bogus pair) with LAST-duplicate-wins
# (map.put overwrites; SearchKeywordParser's walk is first-wins), exact
# param-name case, '='-split with limit 2 (a '='-less part is skipped,
# 'q=' keeps ''), then URLDecoder.decode on the value (second decode
# layer, '+'→' '). Baidu has NO fallback param — modern Baidu referrers
# carry eqid, not the keyword.
WIDE_UTM_HOSTS = (".baidu.com", ".sogou.com", ".bing.com", ".so.com",
                  "m.sm.cn", ".google.com", ".google.co")

# The SQL decode covers the closed fixture/corpus escape alphabet (the
# p51 precedent — there is no URL-decode builtin in both dialects);
# tests/test_search_keywords.py pins it against a full Python port of
# URI.getQuery + URLDecoder.decode on the same alphabet. '%25' decodes
# LAST within a layer so '%2520' correctly needs two layers for ' '.
_WIDE_DECODE = (("%20", " "), ("%22", '"'), ("%26", "&"), ("%3D", "="),
                ("%E4%B8%AD", "中"), ("%E6%96%87", "文"), ("%25", "%"))


def decode_layer_sql(expr: str, plus: bool) -> str:
    """One URLDecoder/URI decode layer over the closed escape alphabet;
    ``plus`` adds URLDecoder's '+'→' ' (java.net.URI's query decode does
    NOT convert '+')."""
    if plus:
        expr = f"replace({expr}, '+', ' ')"
    for k, v in _WIDE_DECODE:
        vv = v.replace("'", "''")
        expr = f"replace({expr}, '{k}', '{vv}')"
    return expr


def is_search_engine_website(d, website: str) -> str:
    """isSearchEngine (EventAttrTransfer.java:421-427): case-sensitive
    contains over the 7-host set; null/empty/\\N → false."""
    conds = " OR ".join(
        f"instr({website}, '{h}') > 0" for h in WIDE_UTM_HOSTS
    )
    return f"(COALESCE({website}, '') <> '' AND ({conds}))"


def utm_term_fallback(d, ref: str) -> str:
    """getUtmTermFromRef(null, ref) (EventAttrTransfer.java:429-457):
    host and query from java.net.URI (query = first '?' to '#', percent-
    DECODED — so the '&' split below sees decoded separators), engine by
    host-contains, the LAST occurrence of the exact-case param name
    ('query' for sogou, 'q' for the four q-engines), then one more
    URLDecoder layer on the value. Any parse failure → null (the
    reference catches around the whole body). An empty matched value
    returns '' which ensureLength renders \\N — NULLIF at the caller."""
    host = f"regexp_extract({ref}, {d.re_lit('^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)')}, 1)"
    raw_q = f"regexp_extract({ref}, {d.re_lit('[?]([^#]*)')}, 1)"
    q1 = decode_layer_sql(raw_q, plus=False)  # URI.getQuery decode

    def last_val(key: str) -> str:
        pat = d.re_lit(f"(?s).*(^|&){key}=([^&]*)")
        return f"regexp_extract({q1}, {pat}, 2)"

    def has_host(h: str) -> str:
        return f"instr({host}, '{h}') > 0"

    picked = (
        f"CASE WHEN {has_host('.sogou.com')} THEN {last_val('query')} "
        f"WHEN {has_host('.bing.com')} OR {has_host('.so.com')} OR "
        f"{has_host('m.sm.cn')} OR {has_host('.google.com')} OR "
        f"{has_host('.google.co')} THEN {last_val('q')} END"
    )
    return decode_layer_sql(f"NULLIF({picked}, '')", plus=True)


class _JavaDecodeError(ValueError):
    """java.net.URLDecoder's IllegalArgumentException (malformed or
    truncated %-pattern)."""


def java_url_decode(s: str, enc: str) -> str:
    """Literal port of java.net.URLDecoder.decode(s, enc) — the decoder
    both UrlDecoder entry points delegate to. Python's urllib.unquote is
    NOT equivalent on three counts this port restores:

    - '+' decodes to ' ' (application/x-www-form-urlencoded, not URI
      percent-decoding);
    - a malformed or truncated %-pattern THROWS (IllegalArgumentException
      — unquote silently leaves it verbatim). The two hex chars go
      through Integer.parseInt(_, 16), which accepts a sign: '%+f' is
      byte 0x0f, '%-1' parses to -1 and throws on the v < 0 check, and
      '%-0' is byte 0x00;
    - undecodable byte runs never throw — Java builds the result with
      String(bytes, enc), whose decoder REPLACES bad sequences with
      U+FFFD (unquote(errors='strict') would raise).
    """
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "+":
            out.append(" ")
            i += 1
        elif c == "%":
            buf = bytearray()
            while i < n and s[i] == "%":
                pair = s[i + 1:i + 3]
                if len(pair) < 2:
                    raise _JavaDecodeError(f"incomplete trailing escape: {s!r}")
                try:
                    v = int(pair, 16)  # parseInt: sign-tolerant, like Java
                except ValueError:
                    raise _JavaDecodeError(f"illegal hex in escape: {pair!r}")
                if pair.strip() != pair or "_" in pair:
                    # Python's int() is laxer than parseInt: it strips
                    # whitespace and allows '_' separators; Java throws
                    raise _JavaDecodeError(f"illegal hex in escape: {pair!r}")
                if v < 0:
                    raise _JavaDecodeError(f"negative escape value: {pair!r}")
                buf.append(v)
                i += 3
            out.append(buf.decode(enc, errors="replace"))
        else:
            out.append(c)
            i += 1
    return "".join(out)


def decode_multi_charset(s: str | None) -> str | None:
    """UrlDecoder.decodeMultiCharset (UrlDecoder.java:48-71): try
    percent-decoding as UTF-8, GBK, GB2312, ISO-8859-1 (each via the
    java_url_decode port — '+'→' ', strict %-patterns, U+FFFD byte
    replacement); return the first result containing a CJK char
    (U+4E00..U+9FA5, containsChinese :75-86), else the ORIGINAL
    undecoded string — ASCII keywords intentionally stay percent-encoded,
    exactly as the reference stores them."""
    if not s:
        return s
    for cs in ("utf-8", "gbk", "gb2312", "iso-8859-1"):
        try:
            decoded = java_url_decode(s, cs)
        except Exception:  # noqa: BLE001 — mirror the Java catch-and-try-next
            continue
        if any("一" <= c <= "龥" for c in decoded):
            return decoded
    return s


def url_decode_utf8(s: str | None) -> str | None:
    """UrlDecoder.decode (UrlDecoder.java:20-45): UTF-8 percent-decode,
    applied twice when the first pass still contains '%' (double-encoded
    referrers). BOTH passes sit inside the reference's try — a malformed
    %-pattern in either pass returns the ORIGINAL input, never the
    intermediate."""
    if not s:
        return s
    try:
        decoded = java_url_decode(s, "utf-8")
        if "%" in decoded:
            decoded = java_url_decode(decoded, "utf-8")
        return decoded
    except _JavaDecodeError:
        return s


def with_search_keyword(df, ref_col: str = "ref"):
    """DataFrame helper: adds ``search_engine`` + ``search_keyword``
    (decoded per decode_multi_charset, cleaned) from a referrer column.
    Extraction is JVM-side; only the decode crosses to Python, Arrow-batched."""
    from pyspark.sql import functions as F

    from zg_etl_spark.operators.domain import SPARK

    @F.pandas_udf("string")
    def _decode(col: pd.Series) -> pd.Series:
        return col.map(decode_multi_charset, na_action="ignore")

    eng = F.expr(engine_case(SPARK, ref_col))
    raw = F.expr(
        clean_keyword(SPARK, term_case(SPARK, ref_col, engine_case(SPARK, ref_col)))
    )
    return df.withColumn("search_engine", eng).withColumn(
        "search_keyword", _decode(raw)
    )
