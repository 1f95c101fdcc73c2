"""Ground-truth layer for the keyword/UA/URL-decode models: the
reference's SearchKeywordParser.parse, ToolUtil.uaAnalysis, and both
UrlDecoder entry points, compiled unmodified and executed on this
container's JDK (generator: tests/tools/gen_refkw_fixture.py), results
committed as tests/data/refkw_jvm_fixture.jsonl.gz. The Python models —
the part-walk + decodeMultiCharset + cleanKeyword composite, the
uaAnalysis port (incl. Java's literal-'null' unmatched-group
rendering), and the java_url_decode-based decoders — must reproduce
every cell. This empirically seals the round-9 line-reading fixes
(URL-order param walk, empty-value stop, '+'→' ', strict %-patterns,
U+FFFD byte replacement, the Opera 'null')."""

from __future__ import annotations

import gzip
import json
import os
import re

from zg_etl_spark.functions.search_keywords import (
    ENGINES,
    decode_multi_charset,
    url_decode_utf8,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                       "refkw_jvm_fixture.jsonl.gz")


def _py_kw(u):
    """SearchKeywordParser.parse: engine by pattern (our deterministic
    list order — single-match inputs only in the corpus; the reference's
    HashMap order is JVM-undefined for multi-match), keyword = first
    URL-ordered part whose name is in the param set (may be ''), then
    decodeMultiCharset + cleanKeyword."""
    eng = None
    for e2, pat, _ in ENGINES:
        if re.search(pat, u, re.IGNORECASE):
            eng = e2
            break
    if eng is None:
        return "unknown|"
    params = dict((e2, ps) for e2, _, ps in ENGINES)[eng]
    q = u.find("?")
    kw = None
    if q != -1:
        for part in u[q + 1:].split("&"):
            i = part.find("=")
            if i == -1:
                continue
            if any(part[:i].lower() == p.lower() for p in params):
                kw = part[i + 1:]
                break
    if not kw:
        return f"{eng}|"
    kw = decode_multi_charset(kw)
    kw = kw.strip()
    kw = re.sub(r'^"|"$', "", kw)
    kw = re.sub(r"^'|'$", "", kw)
    return f"{eng}|{kw}"


def _py_ua(ua):
    if ua is None:
        return ":"
    if "Android" in ua:
        m = re.search(r"linux;.*(android).([\w.,/\-]+)", ua, re.I)
    else:
        m = re.search(r"(ip[honead]+)(?:.*os.([\w.,/\-]+).like|;\sopera)",
                      ua, re.I)
    name, ver = "", ""
    if m:
        name = m.group(1)
        if m.group(2) is None:
            ver = "null"  # Java string concat of the unmatched group
        else:
            ver = re.sub(r"[^a-zA-Z0-9 ]", ".", m.group(2))
    return f"{name}:{ver}"


SEP1, SEP2 = chr(1), chr(2)


def _java_split_eq(kv):
    """String.split("=") with Java's trailing-empty drop."""
    parts = kv.split("=")
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def _py_um(url):
    """Exact port of ToolUtil.urlParseToMap (:101-135): URLDecoder FIRST
    (malformed % → empty map), split on '?' keeping ONLY fields[1] (a
    second '?' truncates), '&'-split parts needing '=', key/value from a
    plain split('=') — the value is the segment between the first and
    second '=' — map.put last-duplicate-wins. Rendered sorted for the
    fixture compare."""
    from zg_etl_spark.functions.search_keywords import java_url_decode

    try:
        decoded = java_url_decode(url, "utf-8")
    except Exception:
        return {}
    mp = {}
    if "?" in decoded:
        fields = decoded.split("?")
        if len(fields) > 1:
            key_values = fields[1]
            parts = (key_values.split("&") if "&" in key_values
                     else ([key_values] if "=" in key_values else []))
            for kv in parts:
                if "=" not in kv:
                    continue
                arr = _java_split_eq(kv)
                if not arr:
                    # a bare '='/'==' part splits to an EMPTY array:
                    # keyValueArr[0] throws inside the reference's try
                    # and the catch returns a NEW map (ToolUtil.java:
                    # 131-134) — the WHOLE result is empty, the part is
                    # not just skipped (round-10 um mega-sweep find)
                    return {}
                mp[arr[0]] = arr[1] if len(arr) > 1 else ""
    return mp


def _py_dt(v):
    """Exact port of ToolUtil.dateUsStrToTimestamp (:45-70): length>17
    dispatches seconds-vs-minutes "yyyy-MM-dd'T'HH:mm[:ss]'Z'" — an
    ofPattern, so ResolverStyle.SMART applies (day clamps to the month,
    exactly 24:00[:00] is next-day midnight); failure → 0."""
    import calendar

    if v is None or v.strip() == "":
        return 0
    if len(v) > 17:
        m = re.fullmatch(
            r"(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})Z", v)
    else:
        m = re.fullmatch(r"(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2})Z", v)
    if not m:
        return 0
    y, mo, dd, h, mi, *rest = [int(x) for x in m.groups()] + [0]
    ss = rest[0] if len(m.groups()) == 6 else 0
    if not (1 <= y <= 9999 and 1 <= mo <= 12 and 1 <= dd <= 31):
        # year 0000: SMART's era-based 'yyyy' rejects year-of-era 0
        # (JVM-pinned → 0)
        return 0
    dd = min(dd, calendar.monthrange(y, mo)[1])
    if not ((h == 24 and mi == 0 and ss == 0)
            or (h <= 23 and mi <= 59 and ss <= 59)):
        return 0
    # ordinal arithmetic, not datetime(): hour 24 on 9999-12-31 rolls
    # into year 10000, which Java represents and datetime cannot
    from datetime import date
    days = date(y, mo, dd).toordinal() - date(1970, 1, 1).toordinal()
    return (((days * 24 + h) * 60 + mi) * 60 + ss) * 1000


def _py_dp(v):
    """DevicePropertyParser.parse rendered at the fixture contract:
    brand U+0001 model in, 7 fields U+0002-joined out, U+0000 = null.
    The port itself (incl. the HashMap-order contains-scan) lives with
    the p45 oracle in test_independent_oracles."""
    from test_independent_oracles import py_device_parse

    b, m = v.split("\x01")
    t = py_device_parse(None if b == "\x00" else b,
                        None if m == "\x00" else m)
    return "\x02".join("\x00" if x is None else str(x) for x in t)


def test_python_models_reproduce_kw_jvm_fixture():
    from zg_etl_spark.functions.search_keywords import ref_utm_term_from_ref

    with gzip.open(FIXTURE, "rt", encoding="utf-8") as fh:
        header = json.loads(fh.readline())
        cells = [json.loads(l) for l in fh]
    assert len(cells) == header["n_cells"]
    counts = {"kw": 0, "ua": 0, "dm": 0, "du": 0, "um": 0, "dt": 0,
              "ut": 0, "dp": 0}
    bad = []
    for m, v, jvm in cells:
        if m == "kw":
            want = _py_kw(v)
        elif m == "ua":
            want = _py_ua(v)
        elif m == "um":
            mp = _py_um(v)
            want = SEP1.join(f"{k}{SEP2}{mp[k]}" for k in sorted(mp))
        elif m == "dt":
            want = str(_py_dt(v))
        elif m == "ut":
            # getUtmTermFromRef: the java.net.URI host/query subset port
            want = ref_utm_term_from_ref(v)
        elif m == "dp":
            want = _py_dp(v)
        elif m == "dm":
            want = decode_multi_charset(v)
            want = " NULL" if want is None else want
        else:
            want = url_decode_utf8(v)
            want = " NULL" if want is None else want
        counts[m] += 1
        if want != jvm:
            bad.append((m, v, jvm, want))
    assert counts["ut"] > 400 and counts["dp"] > 250, counts
    assert not bad, f"{len(bad)} divergences, first 5: {bad[:5]}"
    assert counts["kw"] >= 400 and counts["ua"] >= 200, counts
