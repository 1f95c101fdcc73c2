"""Generate tests/data/refkw_jvm_fixture.jsonl.gz — ground truth from
the reference's SearchKeywordParser / ToolUtil.uaAnalysis / UrlDecoder /
EventAttrTransfer.getUtmTermFromRef, executed on this container's JDK.

Recipe (repo root; requires /root/reference and a JDK on PATH) — fully
automated since round 10:

    python tests/tools/gen_refkw_fixture.py

This copies UNMODIFIED into a scratch src tree (never committed here):
    SearchKeywordParser.java, UrlDecoder.java, ToolUtil.java
                                (etl-flink-common …/util/)
    BaiduKeyword.java           (etl-flink-common …/model/)
    EventAttrTransfer.java      (etl-flink-pipeline …/transfer/)
    DevicePropertyParser.java, DeviceProperty.java (…/util, …/model)
writes the no-op compile stubs (org.slf4j Logger/LoggerFactory, an
empty ConfigCacheService, an all-Object-setter EventAttrRow — the
reference classes' only non-JDK deps, none on the measured paths),
javacs them with tests/tools/KwMain.java, and runs the corpora through
KwMain. Pass an existing <classes-dir> to skip the build step.

Corpora: the same fresh-seed generators the sweep tests use (URL corpus
seed 61M+round, UA corpus seed 59M+round, both widened), a hand-picked
byte-dirty decode alphabet, and the 'ut' URI-semantics corpus
(fragment-before-query, URI-illegal characters, malformed escapes,
userinfo/ports, registry authorities, opaque and relative refs), and
the 'dp' DevicePropertyParser corpus (p45 fixture rows + fresh-seed
brand×model sweep incl. fuzzy-match collisions and trim probes).
tests/test_kw_jvm_fixture.py verifies the Python models against the
result fixture."""

from __future__ import annotations

import gzip
import json
import os
import random
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from zg_etl_spark.buildinfo import BUILD_ROUND  # noqa: E402
from zg_etl_spark.functions.search_keywords import ENGINES  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "data",
                   "refkw_jvm_fixture.jsonl.gz")

DEC_VALS = ["", "plain", "kw%20space", "a+b", "50%+off", "%E4%B8%AD",
            "%D6%D0%CE%C4", "%E4%B8%AD%FF", "%zz%E4%B8%AD", "%E4%B8%AD%E",
            "a%zz", "kw%2520x", "a%20b", "%+f", "%-0", "%-1", "% 1",
            "%41%42", "%c3%a9", "%E4%B8%ADx+y", "100%", "%", "%%41",
            "%GG", "a%%20b", "%e4%b8%ad",
            # JDK UTF-8 decoder malformed-length pins (java_utf8_decode:
            # Java consumes a complete surrogate triple as ONE unit;
            # overlong/out-of-range second bytes reset after one byte)
            "%ED%A0%80", "%ED%A0%80%ED%B0%80", "%ED%A0%41", "%ED%9F%BF",
            "%E0%80%80", "%E0%80%41", "%E0%9F%BF", "%F0%80%80%80",
            "%F4%90%80%80", "%F4%8F%BF%BF", "%F5%80%80%80", "%F0%9F%98%80",
            "%F0%9F%98", "%F0%28%8C%BC", "%E2%28%A1", "%C0%AF", "%80",
            "%F8%88%80%80%80", "%FE%80", "%E4%B8", "%DF%C0", "%ED%ED%A0%80"]


def du_soup():
    """Fresh-seed random %XX byte soups — the discovery leg that found
    the JDK-vs-Python malformed-length split (round 10: '%ED%A0%80' is
    ONE U+FFFD in Java, three in Python's maximal-subpart 'replace')."""
    rng = random.Random(77_000_000 + BUILD_ROUND)
    leads = [0xC2, 0xC0, 0xDF, 0xE0, 0xE4, 0xED, 0xEE, 0xF0, 0xF4,
             0xF5, 0xF8, 0xFF, 0x80]
    out = set()
    for _ in range(120):
        k = rng.randrange(1, 9)
        out.add("".join(f"%{rng.randrange(256):02X}" for _ in range(k)))
    for _ in range(120):
        bs = [rng.choice(leads)]
        for _ in range(rng.randrange(0, 5)):
            bs.append(rng.choice([0x80, 0x9F, 0xA0, 0xBF, 0x41, 0xC0,
                                  rng.randrange(256)]))
        out.add("".join(f"%{b:02X}" for b in bs))
    return sorted(out)


def dm_soup():
    """Fresh-seed GBK-leaning byte soups for decodeMultiCharset — the
    leg that exercises the table-driven Java DBCS decoder (round 10:
    133 of 1,161 dirty soups diverged before java_dbcs_decode; Java
    maps user-defined GBK rows to PUA and consumes structural pairs as
    ONE unit where Python's codec re-synchronizes per byte)."""
    rng = random.Random(79_000_000 + BUILD_ROUND)
    pool = [0xD6, 0xD0, 0xCE, 0xC4, 0x81, 0xFE, 0x40, 0x7F, 0x80, 0xA1,
            0x41]
    out = set()
    for _ in range(200):
        k = rng.randrange(1, 7)
        out.add("".join(
            f"%{rng.choice(pool + [rng.randrange(0x30, 0xFF)]):02X}"
            for _ in range(k)))
    return sorted(out)


# ToolUtil.urlParseToMap (mode um) and dateUsStrToTimestamp (mode dt)
UM_VALS = [
    "https://x.cn/l?lid=11&lname=bdsearch&channel_type=4",
    "https://x.cn/l?lid=12&lname=a%26b&channel_type=1",
    "https://x.cn/l?valid=1", "https://x.cn/l?k=a=b&z=1",
    "https://x.cn/l?k=a==b", "https://x.cn/l?k=", "https://x.cn/l?k",
    "https://x.cn/l?a=1?b=2", "https://x.cn/l?a=1?b=2&c=3",
    "https://x.cn/l", "https://x.cn/l?", "https://x.cn/l?&",
    "https://x.cn/l?a=1&a=2", "https://x.cn/l?a+b=c+d",
    "https://x.cn/l?%6b=%76", "https://x.cn/l?bad=%zz&k=v",
    "https://x.cn/l?only=pair", "?k=v", "k=v", "??a=b",
    "https://x.cn/l?a%3Db=c", "https://x.cn/l?x=%E4%B8%AD",
    "https://x.cn/l?=v", "https://x.cn/l?a=1&&b=2",
    "https://x.cn/l?a=1#f?c=3", "https://x.cn/l?a==",
    # a bare '='/'==' part: split("=") → empty array → keyValueArr[0]
    # throws → the catch returns a NEW empty map (round-10 um sweep)
    "https://x.cn/l?lid=1&=&k=a%26b", "https://x.cn/l?=",
    "https://x.cn/l?==", "?b=a%26b&=&a+b=c+d&lid=c+d",
]
DT_VALS = [
    "2023-01-04T08:11:23Z", "2023-01-04T08:11Z", "not-a-date", "",
    " ", "2023-01-04T08:11:23.5Z", "2023-01-04 08:11:23Z",
    "2023-01-04T08:11:23", "2023-01-04T8:11:23Z", "2023-13-04T08:11:23Z",
    "2023-01-04T08:11:60Z", "2024-02-29T00:00:00Z", "2023-02-29T00:00:00Z",
    "9999-12-31T23:59:59Z", "2023-01-04T08:11:2Z", "20230104T081123Z",
    "2023-01-04T24:00:00Z", "2023-01-04T24:00Z", "2023-04-31T08:11:23Z",
    "2024-02-30T08:11:23Z", "2023-01-32T08:11:23Z", "2023-00-04T08:11:23Z",
    "2023-01-00T08:11:23Z", "2023-01-04T23:60:00Z", "2023-12-32T00:00:00Z",
    "0000-01-04T08:11:23Z", "0000-01-04T08:11Z",      # year-of-era 0 → 0
    "9999-12-31T24:00:00Z", "9999-12-31T24:00Z",      # rolls to year 10000
    "1969-12-31T23:59:59Z",                           # negative epoch
]


# getUtmTermFromRef: hand-picked java.net.URI edge cases — every way the
# constructor can throw, every way getHost()/getQuery() can be null, and
# the second URLDecoder layer's throw channel
UT_FIXED = [
    "http://www.sogou.com/web?query=hello",
    "http://www.sogou.com/web#frag?query=hello",      # query after '#'
    "http://www.sogou.com/web?query=hello#frag",
    "http://www.sogou.com/web?query=a b",             # space → throws
    "http://www.sogou.com/web?query=a%zzb",           # bad escape → throws
    "http://www.sogou.com/web?query=a%2",             # truncated escape
    "http://www.sogou.com/web?query=100%25",          # layer-2 throw
    "http://www.sogou.com/web?query=%2520z",          # two layers
    "http://www.sogou.com/web?query=%E4%B8%AD",
    "http://www.sogou.com/web?query=中文",             # raw CJK: URI-legal
    "http://www.sogou.com/web?query=a\"b",            # '"' → throws
    "http://www.sogou.com/web?query=a<b",
    "http://www.sogou.com/web?query=a{b}",
    "http://www.sogou.com/web?query=a^b",
    "http://www.sogou.com/web?query=a\\b",
    "http://www.sogou.com/web?query=a|b",
    "http://www.sogou.com/web?query=a`b",
    "http://www.sogou.com/web?query=a[1]",            # '[]' legal in query
    "http://www.sogou.com/a[1]/w?query=x",            # '[]' illegal in path
    "http://user@www.sogou.com/web?query=ui",         # userinfo stripped
    "http://user:pw@www.sogou.com/w?query=ui2",
    "http://www.sogou.com:8080/web?query=port",
    "http://www.sogou.com:/web?query=emptyport",      # empty port: legal
    "http://www.sogou.com:8a/web?query=badport",      # registry → null host
    "http://www_x.sogou.com/web?query=underscore",    # registry → null host
    "http://-www.sogou.com/web?query=hyphenedge",     # label edge → registry
    "http://www.sogou.com./web?query=trailingdot",    # legal hostname
    "http://www.sogou.com.123/w?query=digitlabel",    # last label digit
    "http://www.soGou.com/web?query=case",            # contains: case-sens
    "//www.sogou.com/web?query=schemeless",           # relative w/ authority
    "www.sogou.com/web?query=nohost",                 # relative, null host
    "/web?query=relpath",
    "?query=relquery",
    "mailto:x@www.sogou.com?query=opaque",            # opaque: null query
    "1http://www.sogou.com/w?query=badscheme",        # ':' after digit head
    "ht~tp://www.sogou.com/w?query=badscheme2",
    "http://www.sogou.com/web?query",                 # no '=': skipped
    "http://www.sogou.com/web?query=",                # empty value → ''
    "http://www.sogou.com/web?query=a&query=b",       # last wins
    "http://www.sogou.com/web?q=notparam",
    "http://www.sogou.com/web?QUERY=upper",
    "http://www.sogou.com/web?query=x+y",             # '+' layer-2 only
    "http://www.sogou.com/web?query=a%26b=c",         # decoded '&' splits
    "http://www.sogou.com/web?query=a%3Db",           # decoded '=' in value
    "http://cn.bing.com/search?q=bingkw",
    "http://www.so.com/s?q=so360",
    "http://m.sm.cn/s?q=shenma",
    "http://www.google.com/search?q=ggl",
    "http://www.google.co.jp/search?q=ggljp",
    "http://www.baidu.com/s?wd=nofallback",           # baidu: no param here
    "http://a.bing.com.sogou.com/w?query=sg&q=bg",    # sogou checked first
    "http://[2001:db8::1]/w?q=v6",                    # IPv6: legal, no match
    # bracketed-authority lane (round-11 advisory): '[' forces the IPv6
    # parse — an invalid literal cannot fall back to registry ('[' is
    # not reg_name) so the WHOLE constructor throws
    "http://[a.sogou.com]/w?query=x",                 # invalid v6 → throws
    "http://[::1]/w?query=v6loop",
    "http://[::1]:8080/w?query=v6port",
    "http://[::1]:/w?query=v6emptyport",
    "http://[1:2:3:4:5:6:7:8]/w?query=v6full",
    "http://[1:2:3:4:5:6:7]/w?query=v6seven",         # 7 groups, no '::'
    "http://[1:2:3:4:5:6:7:8:9]/w?query=v6nine",
    "http://[::]/w?query=v6any",
    "http://[1::2::3]/w?query=v6twocomp",
    "http://[1:2:3:4:5:6:7:8::]/w?query=v6fullcomp",  # '::' after 8
    "http://[::ffff:1.2.3.4]/w?query=v6mapped",
    "http://[0:0:0:0:0:0:13.1.68.3]/w?query=v6tail",
    "http://[1.2.3.4]/w?query=v4inbrackets",
    "http://[::fffg]/w?query=v6badhex",
    "http://[12345::1]/w?query=v6longgroup",
    "http://[]/w?query=v6empty",
    "http://[::1/w?query=v6nobracket",
    "http://[fe80::1%eth0]/w?query=v6scope",
    "http://[fe80::1%25eth0]/w?query=v6scope25",
    "http://[fe80::1%]/w?query=v6emptyscope",
    "http://[fe80::1%a.sogou.com]/w?query=v6dotscope",
    "http://[fe80::1%25a.sogou.com]/w?query=v6dotscope25",
    "http://[fe80::1%a_b]/w?query=v6underscope",
    "http://[:2:3::]/w?query=v6leadcolon",
    "http://[1:2:]/w?query=v6trailcolon",
    "http://[1:2:3:4:5:6:1.2.3.4:7]/w?query=v6tailmid",
    "http://[::1.2.3.4.5]/w?query=v6badtail",
    "http://[::256.1.2.3]/w?query=v6badoctet",
    "http://u@[::1]/w?query=v6user",
    # scope-id probes with an ENGINE SUFFIX riding in the scope — the
    # only bracket forms whose validity is OBSERVABLE at this surface
    # (getHost() returns the literal incl. scope; contains() then
    # matches '.sogou.com' INSIDE the scope): each cell pins one
    # validator branch as keyword-vs-\N
    "http://[gggg::1%a.sogou.com]/w?query=badaddrscope",
    "http://[1:2:3:4:5:6:7:8%a.sogou.com]/w?query=fullscope",
    "http://[1:2:3:4:5:6:7%a.sogou.com]/w?query=sevenscope",
    "http://[::ffff:1.2.3.4%a.sogou.com]/w?query=mappedscope",
    "http://[1::2::3%a.sogou.com]/w?query=twocompscope",
    "http://[::%a.sogou.com]/w?query=anyscope",
    "http://[fe80::1%x-y.sogou.com]/w?query=hyphenscope",
    "http://[fe80::1%x~y.sogou.com]/w?query=tildescope",
    "http://[fe80::1%a:b.sogou.com]/w?query=colonscope",
    "http://[fe80::1%a%b.sogou.com]/w?query=pctscope",
    "http://[fe80::1%%61.sogou.com]/w?query=escscope",
    "http://[::1.2.3.4%a.sogou.com]/w?query=tailscope",
    "http://[::256.1.2.3%a.sogou.com]/w?query=badoctetscope",
    "http://[12345::1%a.sogou.com]/w?query=longgroupscope",
    "http://[1:2:3:4:5:6:1.2.3.4%a.sogou.com]/w?query=v4at7",
    "http://[1:2:3:4:5:1.2.3.4%a.sogou.com]/w?query=v4at6",
    "http://[1:2:3:4:5:6:7:1.2.3.4%a.sogou.com]/w?query=v4at8",
    "http://[::ffff:1.2.3%a.sogou.com]/w?query=shortv4",
    "http://[1:2::%a.sogou.com]/w?query=trailcomp",
    "http://[::0001.2.3.4%a.sogou.com]/w?query=padoctet",
    "http://[::1.2.3.04%a.sogou.com]/w?query=zerooctet",
    "http://[::1%0.sogou.com]/w?query=digitscope",
    "http://[::1% .sogou.com]/w?query=spacescope",
    "http://[::1%中.sogou.com]/w?query=cjkscope",
    "http://[0:0:0:0:0:0:0:1%a.sogou.com]/w?query=zeros",
    "http://[fe80::1%a.sogou.com]:8080/w?query=scopeport",
    "http://[1:2:3::4:5:6%a.sogou.com]/w?query=midcomp",
    "http://[a.sogou.com%x]/w?query=scopebadaddr",
    "http://1.2.3.4/w?q=ipv4",
    "http://x.com/w?q=%ED%A0%80",                     # bad UTF-8 → U+FFFD
    "http://x.com/w#only-frag",
    "",
    "\\N",
    "http://cn.bing.com/search?q=a%2Bb",              # layer-1 keeps %2B…
    # parseInt sign tolerance at layer 2 (round-11 advisory): layer-1
    # decode can mint '%+f'-style pairs that URLDecoder ACCEPTS
    "http://www.sogou.com/web?query=%25+f",           # layer-2 '%+f' → 0x0f
    "http://www.sogou.com/web?query=%25-0",           # '%-0' → 0x00
    "http://www.sogou.com/web?query=%25-1",           # '%-1' → negative, throws
    "http://cn.bing.com/search?q=%25%2Bf",            # via undecoded %2B text
    "http://www.sogou.com/web?query=%25+f0",          # pair '+f', literal '0'
    "http://www.sogou.com/web?query=x%25+fy",
    "http://cn.bing.com/search?q=%E6%96%87x",
    # JDK-decoder malformed lengths reaching a MATCHED host (the round-10
    # 9k-cell mega-sweep found these four before java_utf8_decode landed)
    "http://www.sogou.com/web?query=%ED%A0%80",       # 1 U+FFFD, not 3
    "http://www.sogou.com/web?query=%ED%A0%80%ED%B0%80",
    "http://cn.bing.com/search?q=%E0%80%41",
    "http://www.so.com/s?q=%F5%80%80%80",
]


def ut_corpus():
    """Fresh-seed structural sweep for getUtmTermFromRef on top of the
    fixed cells: random compositions of the failure axes."""
    rng = random.Random(71_000_000 + BUILD_ROUND)
    schemes = ["http://", "https://", "", "//", "ftp://", "1a://", "a+b://"]
    auths = ["www.sogou.com", "wap.sogou.com:80", "u@cn.bing.com",
             "u:p@www.so.com", "m.sm.cn", "x_y.sogou.com", "-a.bing.com",
             "www.google.com.", "www.google.co.kr", "a.so.com.9",
             "WWW.SOGOU.COM", "so.com", "1.2.3.4", "[::1]", "",
             "www.sogou.com:x1"]
    paths = ["/web", "/s/x", "", "/a b", "/a%zz", "/a[0]", "/中"]
    queries = ["query=kw", "q=kw", "query=", "q", "query=%E4%B8%AD",
               "query=100%25", "query=a+b", "q=a%26b&q=c", "query=x#y",
               "query=a b", "query=a%2", "QUERY=k", "query=中", ""]
    frags = ["", "#f", "#f?query=infrag", "#q=h"]

    out = set()
    for _ in range(400):
        u = (rng.choice(schemes) + rng.choice(auths) + rng.choice(paths))
        if rng.random() < 0.85:
            u += "?" + rng.choice(queries)
        u += rng.choice(frags)
        out.add(u)
    return sorted(out)


def dp_corpus():
    """DevicePropertyParser.parse cells: the p45 fixture rows plus a
    fresh-seed brand×model sweep. Deliberately includes fuzzy-match
    COLLISIONS ('redmi…' exact-misses contain both 'redmi' and 'mi',
    multi-brand strings) — the reference scans BRAND_MAPPING.entrySet()
    in HashMap order, the repo models longest-key-first; these cells
    decide whether the two orders ever disagree on real inputs — plus
    Java-trim-vs-Python-strip probes (U+3000 ideographic space)."""
    from zg_etl_spark.plans.pipeline import _P45_CASES

    rng = random.Random(83_000_000 + BUILD_ROUND)
    brands = ["huawei", "HUAWEI", " Huawei ", "honor", "荣耀", "xiaomi",
              "mi", "redmi", "红米", "oppo", "realme", "oneplus", "vivo",
              "iqoo", "apple", "iphone", "samsung", "meizu", "魅族",
              "lenovo", "联想", "zte", "中兴", "nubia", "努比亚", "黑鲨",
              "黑莓", "sony", "HTC", "nokia", "",
              # fuzzy-only hits and collisions
              "xiaomi-go", "redmi-go", "my-redmi", "huawei honor",
              "xiaomi redmi", "semi", "miX", "Mi 11", "iphone 15 pro",
              "BlackShark-黑鲨", "努比亚z50", "中兴axon",
              # trim/strip probes
              "　xiaomi　", " redmi\t", " apple"]
    models = [None, "", "Mate 60 Pro", "Mate X5", "Mix Fold 3", "K70",
              "Note 12", "iPhone 15 Pro Max", "iPhone SE", "Find X7",
              "GT Neo5", "Ace 2", "旗舰版", "折叠屏2023", "5G全网通",
              "5g", "全网通", "Y78 5G", "Galaxy Z Flip5", "Galaxy S24",
              "2022款", "A58 2023 5G", "平板Pad6", "X90s+", "~!@#2024",
              "  double  space  ", "Pro+", "flip", "FOLD", "se2"]
    cells = list(_P45_CASES)
    for _ in range(320):
        b = rng.choice(brands)
        m = rng.choice(models)
        cells.append((b, m))
    seen, out = set(), []
    for b, m in cells:
        key = (b, m)
        if key in seen:
            continue
        seen.add(key)
        out.append(("\x00" if b is None else b) + "\x01"
                   + ("\x00" if m is None else m))
    return out


def ea_corpus():
    """EventAttrTransfer kernel cells (mode 'ea'): the G8 sanitizers
    (ensureLength / ensureIntLength / ensureIntRange / ensureNetwork /
    ipToLong, EventAttrTransfer.java:497-534), the time-bucket builders
    (getTimeComponents → begin_day_id / begin_time_id, :374-386;
    timestampToDateString's tz gate, :367-372; getYearWeek, :388-396),
    and the st/se event-name rewrite (getEventNameFromMap, :360-365).
    Hand-picked edges + a fresh-seed soup leg per op. U+0001 joins args,
    U+0000 stands in for null."""
    S0, S1 = chr(0), chr(1)
    rng = random.Random(87_000_000 + BUILD_ROUND)
    cells = []

    # --- ensureLength: null/empty/\N sentinels, the replace-then-trim
    # channel, UTF-16 truncation (surrogate pairs!), Java-trim-vs-
    # Python/SQL-trim probes (control chars <= U+0020, U+3000, NBSP)
    el_vals = [
        S0, "", "\\N", "null", " ", "  ", "\t", "\t\n\r", "a",
        " a ", "\ta\t", "a\tb", 'a"b', "a\\b", "a\\\\b", "\ra\n",
        "\tx", "x\t", '""', "\\", '"', "a  b", "中 文", "　a　",
        " a ", "\x0ba", "a\x0b", "\x02a\x02",
        "\x1fa", "a\x1f", " \t a \t ", "\\N ", " \\N", "a\\Nb",
        "a" * 255, "a" * 256, "a" * 257, "a" * 300,
        "中" * 256, "中" * 257, "🎉" * 127, "🎉" * 128, "🎉" * 129,
        "a" + "🎉" * 128, "x" * 255 + "🎉", "x" * 255 + "🎉y",
        "\t" + "b" * 300, ("a " * 200).strip(), "👨‍👩‍👧‍👦" * 80,
    ]
    alpha = list("ab \t\n\r\"\\中文🎉") + ["\x00", "　", " ",
                                          "\x1f", "", "\ud83d"]
    for _ in range(150):
        k = rng.randrange(0, 16)
        el_vals.append("".join(rng.choice(alpha) for _ in range(k)))
    for v in el_vals:
        for ml in (256, 1088) if len(v) < 300 else (256, 258, 1088):
            cells.append(f"el{S1}{ml}{S1}{v}")
    for ml in (0, 1, 2, 6):
        for v in ("abcdef", " abc ", "🎉🎉", "", "\tab"):
            cells.append(f"el{S1}{ml}{S1}{v}")

    # --- ensureIntLength / ensureNetwork: the digits gate ([0-9]* is
    # ASCII-only and FULL-match; fullwidth digits, signs, whitespace)
    int_vals = [S0, "", "\\N", "null", "NULL", "-1", "0", "00", "000000",
                "0000000", "1", "123456", "1234567", "999999", "12a",
                "a12", "1 2", " 12", "12 ", "+12", "-12", "12.0", "1e3",
                "１２３", "۱۲۳", "12\n", "\t12", "²³", "12٣"]
    for _ in range(60):
        k = rng.randrange(0, 9)
        int_vals.append("".join(rng.choice("0123456789a +-.１٣") for _ in range(k)))
    for v in int_vals:
        cells.append(f"ei{S1}{v}")
        cells.append(f"en{S1}{v}")

    # --- ensureIntRange (the $dru duration gate 0..86400000): verbatim
    # returns ("007"/"+5" come back UNNORMALIZED), parseInt edges
    er_vals = [S0, "", "\\N", "0", "1", "007", "+5", "-0", "-1",
               "86400000", "86400001", "86399999", "2147483647",
               "2147483648", "-2147483648", "5.0", " 5", "5 ", "five",
               "0x10", "1_000", "+86400000", "00086400000"]
    for v in er_vals:
        cells.append(f"er{S1}0{S1}86400000{S1}{v}")
    for v in ("5", "-5", "0", "10"):
        cells.append(f"er{S1}-10{S1}10{S1}{v}")

    # --- ipToLong: 4-parts-or-null, Java split("\\.") trailing-empty
    # drop, UNVALIDATED parseInt values OR-folded into the shift
    il_vals = [S0, "", "\\N", "1.2.3.4", "255.255.255.255", "0.0.0.0",
               "01.02.03.04", "256.1.1.1", "1.2.3.256", "1.2.3.999",
               "-1.2.3.4", "1.2.3.-4", "+1.2.3.4", "1.2.3", "1.2.3.4.5",
               "1.2.3.", "1.2.3..", ".1.2.3", "..1.2", "1..2.3",
               "1.2.3.4 ", " 1.2.3.4", "a.b.c.d", "1.2.3.x",
               "2130706433.1.1.1", "4294967296.1.1.1", "1.2.3.2147483647",
               "1.2.3.2147483648", "....", "1,2,3,4", "1.2.3.4.", "10.0.0.1"]
    for _ in range(50):
        k = rng.randrange(1, 6)
        il_vals.append(".".join(str(rng.randrange(-5, 300))
                                for _ in range(k)))
    for v in il_vals:
        cells.append(f"il{S1}{v}")

    # --- getEventNameFromMap: the st/se rewrite keys off $zg_eid's
    # STRING form; $eid rides through raw (ensureLength is applied by
    # the caller, pinned separately above)
    for zg in (S0, "-1", "-2", "-3", "1", "0", " -1", "-1 ", "st", ""):
        for eid in (S0, "", "login", "-1", "se", "a\tb"):
            cells.append(f"em{S1}{zg}{S1}{eid}")

    # --- getTimeComponents: day/hour/mill under the UTC pin; negative
    # epoch (Calendar's floor semantics vs SQL %), ms boundaries
    tc_vals = [0, 1, 999, 1000, -1, -999, -1000, -1001, 86399999,
               86400000, -86400000, 1699999999999, 1705880272289,
               253402300799999, -62135596800000, 946684800000,
               1234567890123, -1234567890123]
    for _ in range(40):
        tc_vals.append(rng.randrange(-3_000_000_000_000, 3_000_000_000_000))
    for v in tc_vals:
        cells.append(f"tc{S1}{v}")

    # --- timestampToDateString: the |tz| <= 48h GATE (tz is validated,
    # never applied — the formatter still runs in the default zone)
    lim = 48 * 3600 * 1000
    for ct, tz in [(1705880272289, 0), (1705880272289, 28800000),
                   (1705880272289, lim), (1705880272289, lim + 1),
                   (1705880272289, -lim), (1705880272289, -lim - 1),
                   (0, 0), (-1, 0), (None, 0), (1705880272289, None),
                   (None, None), (86399999, 3600000),
                   (253402300799999, 0), (-62135596800000, 0)]:
        cells.append(f"ts{S1}{S0 if ct is None else ct}"
                     f"{S1}{S0 if tz is None else tz}")

    # --- getYearWeek: SimpleDateFormat("YYYYww") after a minus-1-day
    # shift, on DATE_FORMAT-parsed strings (lenient Calendar parse!)
    gy_vals = ["2023-01-01 00:00:00", "2023-01-02 00:00:00",
               "2024-12-29 00:00:00", "2024-12-30 00:00:00",
               "2024-12-31 23:59:59", "2025-01-01 00:00:00",
               "2026-01-01 00:00:00", "2020-02-29 12:00:00",
               "2023-06-15 08:30:00", "1970-01-01 00:00:00",
               "not-a-date", "", "2023-13-45 99:99:99",
               "2023-1-2 3:4:5", "2023-01-02", "2023/01/02 00:00:00"]
    for y in range(2019, 2027):
        for md in ("01-01", "01-07", "01-08", "12-25", "12-31"):
            gy_vals.append(f"{y}-{md} 12:00:00")
    for v in gy_vals:
        cells.append(f"gy{S1}{v}")

    seen, out = set(), []
    for c in cells:
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out


def cv_corpus():
    """OperatorUtil.compareValue cells (mode 'cv') — the p43/p50
    match_json comparator, previously pinned only by dual Python ports
    (SURVEY.md §5.3 BOUNDARY). fastjson2 is not in the sandbox (no jar,
    no maven cache — probed round 11), but the comparator's own
    semantics compile against an identity-typed stub because the
    harness stores exactly the types the getters return. Cell = value
    U+0001 type U+0001 operator U+0001 values (U+0002-joined; U+0000 =
    null/empty-list, U+0004 = omit key).

    Relative-date cells use only timestamps DECADES from any plausible
    'now' (far-future 99999999999 s / far-past -4000000000 s) so the
    recorded JVM truth — minted with real System.currentTimeMillis — is
    replay-stable for any test-time now between ~1990 and ~2090."""
    S0, S1, S2, OM = chr(0), chr(1), chr(2), chr(4)
    rng = random.Random(91_000_000 + BUILD_ROUND)
    cells = []

    def cell(value, typ, op, values):
        vs = (OM if values is None else S0 if values == []
              else S2.join(values))
        cells.append((S0 if value is None else value) + S1
                     + (OM if typ is None else str(typ)) + S1
                     + (OM if op is None else op) + S1 + vs)

    str_ops = ["equal", "not equal", "regexp", "not regexp", "contains",
               "not contains", "begin with", "end with", "not begin with",
               "not end with", "is not null", "is null", "bogus", ""]
    # --- string family: the full op list over a value×target grid
    for v in ["abc", "null", "NULL", " ", "aabca", "ABC", "中文a", "a"]:
        for t in ["abc", "", "a", "bc", "ABC", "null", "中"]:
            for op in str_ops:
                if rng.random() < 0.35:
                    cell(v, 1, op, [t])
    # --- regexp: Java Pattern + Matcher.find — dialect pins (anchors,
    # classes, quantifiers), PatternSyntaxException throws, and the
    # Java-only constructs kept for the Spark (JVM-regex) leg
    re_pats = ["a", "^a", "a$", "^abc$", "a+", "[ab]c", "\\d+", "(a|b)c",
               "a.c", "", "a{2}", "\\p{L}+", "中", "a\\b", "b?c", "^$",
               "a|", ".*", "x", "(", "[z-a]", "a{", "**", "a*+",
               "(?i)ABC", "(?=a)a", "(a)\\1", "\\Qa.c\\E", "[[:alpha:]]"]
    for v in ["abc", "aabca", "ABC", "a1b2", "中文a", "xay", "a.c"]:
        for t in re_pats:
            if rng.random() < 0.45:
                cell(v, 1, "regexp", [t])
                if rng.random() < 0.3:
                    cell(v, 1, "not regexp", [t])
    # --- numeric: Long.parseLong's REAL grammar (Character.digit —
    # Unicode Nd digits parse; supplementary-plane digits are surrogate
    # pairs and throw), 64-bit overflow, null-ish gate
    num_vals = ["12", "012", "+12", "-12", " 12", "12 ", "12.0", "1e3",
                "١٢", "١٢٣", "１２３", "1٢", "٠", "-١٢", "+١٢",
                "१२", "๑๒", "໑໒", "𝟏𝟐", "²³", "⑫", "〇", "一",
                "9223372036854775807", "9223372036854775808",
                "-9223372036854775808", "-9223372036854775809",
                "null", "NULL", "Null", "abc", "--5", "+-5", "+", "-",
                "0x10", "1_000", "0", "00", "-0"]
    num_tgts = ["12", "+12", "013", "١٢", "9223372036854775807", "0",
                "-12", "abc", "", "null", "１２"]
    for v in num_vals:
        for t in num_tgts:
            if rng.random() < 0.25:
                cell(v, 2, rng.choice(["gt", "lt", "ge", "le", "equal",
                                       "not equal", "bogus"]), [t])
    for op in ["gt", "lt", "ge", "le", "equal", "not equal"]:
        cell("١٢", 2, op, ["12"])
        cell("１２３", 2, op, ["123"])
        cell("𝟏𝟐", 2, op, ["12"])
        cell("12", 2, op, ["١٣"])
    # --- date 'absolute': LocalDate SMART resolution (Feb-30 clamps,
    # month/day range throws, sign-gated >4-digit years), the +08:00
    # midnights, inclusive end, IndexOutOfBounds on a 1-element list
    abs_rows = [
        ("1680000000", ["2023-01-01", "2023-12-31"]),
        ("1672502400", ["2023-01-01", "2023-12-31"]),   # lo midnight
        ("1672502399", ["2023-01-01", "2023-12-31"]),
        ("1703952000", ["2023-01-01", "2023-12-31"]),   # hi midnight
        ("1703952001", ["2023-01-01", "2023-12-31"]),   # past hi → false
        ("1677513600", ["2023-02-30", "2023-02-30"]),   # SMART → Feb 28
        ("1677513601", ["2023-02-30", "2023-02-30"]),
        ("1709136000", ["2024-02-30", "2024-02-30"]),   # leap → Feb 29
        ("1682784000", ["2023-04-31", "2023-04-31"]),   # → Apr 30
        ("1677513600", ["2023-02-31", "2023-02-28"]),
        ("1680000000", ["2023-13-01", "2023-12-31"]),   # month 13 THROW
        ("1680000000", ["2023-01-32", "2023-12-31"]),   # day 32 THROW
        ("1680000000", ["2023-01-00", "2023-12-31"]),   # day 0 THROW
        ("1680000000", ["0000-01-01", "2023-12-31"]),   # year 0 THROW
        ("1680000000", ["2023-1-2", "2023-12-31"]),     # width THROW
        ("1680000000", ["2023-01-01"]),                 # getString(1) THROW
        ("1680000000", ["2023-12-31", "2023-01-01"]),   # hi < lo
        ("327403353600", ["+12345-01-01", "+12345-01-02"]),  # signed year
        ("1680000000", ["12345-01-01", "2023-12-31"]),  # unsigned 5-digit
        ("1680000000", ["+2023-01-01", "2023-12-31"]),  # sign at width 4
        ("1680000000", ["2023-01-01", "+12345-01-02"]),
        ("١٦٨٠٠٠٠٠٠٠", ["2023-01-01", "2023-12-31"]),  # Nd seconds
        ("abc", ["2023-01-01", "2023-12-31"]),
        ("", ["2023-01-01", "2023-12-31"]),             # empty → null path
        ("null", ["2023-01-01", "2023-12-31"]),
        ("1680000000.5", ["2023-01-01", "2023-12-31"]),
        ("-62135596800", ["0001-01-01", "0001-01-02"]), # year 1 CE
        ("9223372036854776", ["2023-01-01", "9999-12-31"]),  # *1000 wraps
        ("1680000000", ["2023-02-29", "2023-03-01"]),   # non-leap Feb 29
    ]
    for v, vals in abs_rows:
        cell(v, 3, "absolute", vals)
    # --- date 'relative': the day*24*60*60 INT-overflow chain (wraps at
    # |day| >= 24856), Integer.parseInt's Nd digits, parse-throw → false
    for day in ["30", "-30", "0", "24855", "24856", "36500", "100000",
                "2147483647", "2147483648", "-2147483648", "٣٠",
                "30.0", "abc", "", "+30", "1000000", "89478486"]:
        cell("99999999999", 3, "relative", [day])   # far future: ~5138
        cell("-4000000000", 3, "relative", [day])   # far past: ~1843
    cell("abc", 3, "relative", ["30"])
    cell("9223372036854776", 3, "relative", ["30"])  # ts*1000 wraps neg
    cell("١٢٣٤٥٦٧٨٩٠٠", 3, "relative", ["30"])   # Nd seconds, far future
    # DISCRIMINATING wrap cells: a 2023 timestamp sits between the
    # wrapped threshold (now + decades, when day*86400 overflows int)
    # and the exact threshold (now - decades) — Java's int chain says
    # false where an unwrapped model says true. Each is now-invariant
    # for any replay between ~2025 and far past the fixture's life.
    for day in ["24855", "24856", "36500", "100000", "30", "-30", "٣٠"]:
        cell("1680000000", 3, "relative", [day])
    # --- null/empty routing: handleNullValue, the '业务'-less default,
    # NPE channels (missing operator/type/values), unknown types
    for v in ["", "null", "NULL", "nUlL", "abc", " "]:
        for op in ["is null", "is not null", "equal", "gt", "bogus"]:
            cell(v, 1, op, [])
    for op in ["is null", "is not null", "equal"]:
        cell("", 1, op, ["x"])
        cell("", 2, op, ["5"])
    cell("abc", None, "equal", ["abc"])      # type omitted → NPE THROW
    cell("abc", 1, None, ["abc"])            # operator null in switch
    cell("", 1, None, ["abc"])               # null op in handleNullValue
    cell("abc", 1, "equal", None)            # values omitted → NPE THROW
    cell("", 1, "is null", None)             # short-circuit: no NPE
    for t in [0, 4, -1, 99]:
        cell("abc", t, "equal", ["abc"])
    cell("abc", 1, "equal", ["abc", "zzz"])  # extra items ignored
    cell("abc", 1, "EQUAL", ["abc"])         # case-sensitive op switch
    # --- fresh-seed sweep: random value × rule compositions
    sweep_vals = ["", "a", "abc", "null", "12", "١٢", "-5", " ", "中",
                  "9999999999999999999", "0.5", "x y", "NULL", "True",
                  "𝟗", "۴۵", "acbd", "AAbb"]
    sweep_ops = str_ops + ["gt", "lt", "ge", "le", "relative", "absolute"]
    sweep_tgts = ["", "a", "abc", "12", "١٣", "0", "null", "^a+$", "[ab]",
                  "2023-01-01", "30", "-1", "99"]
    for _ in range(300):
        v = rng.choice(sweep_vals)
        typ = rng.choice([1, 1, 1, 2, 2, 3])
        op = rng.choice(sweep_ops)
        if typ == 3 and op == "relative":
            v = rng.choice(["99999999999", "-4000000000", "abc", "",
                            "٩٩٩٩٩٩٩٩٩٩٩", "9223372036854776000"])
            vals = [rng.choice(["30", "36500", "-7", "24856", "abc",
                                "٣٠", "2147483648"])]
        elif typ == 3 and op == "absolute":
            vals = [rng.choice(["2020-01-01", "2023-02-30", "2023-06-15",
                                "0001-01-01", "2023-13-05", "1969-12-31"]),
                    rng.choice(["2030-12-31", "2024-04-31", "2023-06-15",
                                "1969-01-01", "+99999-01-01"])]
        else:
            n = rng.choice([1, 1, 1, 1, 2, 0])
            vals = [rng.choice(sweep_tgts) for _ in range(n)]
        cell(v, typ, op, vals)

    seen, out = set(), []
    for c in cells:
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out


def corpora():
    rng = random.Random(61_000_000 + BUILD_ROUND)
    hosts = ["www.baidu.com/s", "tieba.baidu.com/f",
             "www.google.com.hk/search", "google.cn/m", "www.sogou.com/web",
             "wap.sogou.com/x", "www.so.com/s", "m.so.com/index",
             "cn.bing.com/search", "m.sm.cn/s", "so.toutiao.com/search",
             "search.yahoo.com/search", "notbaidu.com/s", "example.org/page",
             "BAIDU.COM/S", "a.b/c&wd=pathamp", "x.soGou.Com/w"]
    all_params = sorted({p for _, _, ps in ENGINES for p in ps})
    names = all_params + [p.upper() for p in all_params] + [
        "awd", "wdx", "xq", "qq", "keywords", "WORD", "KeyWord", "x", "y", ""]
    values = ["", "kw1", "a=b", '"q1"', "'q2'", " sp ", "%E4%B8%AD",
              "%D6%D0", "multi word", "'", '"', "v_1-2.3", "=", "kw+plus"]

    def rand_url():
        host = rng.choice(hosts)
        parts = []
        for _ in range(rng.randrange(0, 6)):
            name = rng.choice(names)
            parts.append(name if rng.random() < 0.12
                         else f"{name}={rng.choice(values)}")
        q = "?" + "&".join(parts) if (parts or rng.random() < 0.3) else ""
        return f"https://{host}{q}"

    urls = sorted({rand_url() for _ in range(600)})

    rng2 = random.Random(59_000_000 + BUILD_ROUND)
    prefixes = ["Mozilla/5.0 ", "", "Opera/9.80 ", "mozilla/4.0 "]
    bodies = ["(Linux; U; Android {v}; zh-cn; X) ", "(Linux; Android {v}) ",
              "(linux; android {v}) ", "(LINUX; ANDROID {v}) ",
              "(Android {v}; Mobile) ",
              "(iPhone; CPU iPhone OS {v} like Mac OS X) ",
              "(iPad; CPU OS {v} like Mac OS X) ",
              "(ipod touch; cpu os {v} like) ", "(iPhone; Opera",
              "(iPad;  Opera", "(iphone; opera Mini) ", "(IPAD; OPERA) ",
              "(iPhone; CPU OS {v}) ", "(Windows NT 10.0) ",
              "ipand os {v} like ", "shipone os {v} like "]
    tails = ["AppleWebKit/537.36", "Safari/604.1", "", "like Gecko"]
    vers = ["13", "16_6", "17.2.1", "4.2,1", "a-b/c", "10_0_1", "X",
            "1__2", "9-", "..", "16 6"]
    uas = sorted({(rng2.choice(prefixes)
                   + rng2.choice(bodies).replace("{v}", rng2.choice(vers))
                   + rng2.choice(tails)).strip() for _ in range(500)})
    return ([("kw", u) for u in urls] + [("ua", u) for u in uas]
            + [("dm", v) for v in DEC_VALS] + [("du", v) for v in DEC_VALS]
            + [("du", v) for v in du_soup()]
            + [("dm", v) for v in dm_soup()]
            + [("um", v) for v in UM_VALS] + [("dt", v) for v in DT_VALS]
            + [("ut", v) for v in UT_FIXED + ut_corpus()]
            + [("dp", v) for v in dp_corpus()]
            + [("ea", v) for v in ea_corpus()]
            + [("cv", v) for v in cv_corpus()])


_SLF4J_LOGGER = """package org.slf4j;
public interface Logger {
    void info(String s, Object... o);
    void debug(String s, Object... o);
    void warn(String s, Object... o);
    void error(String s, Object... o);
}
"""
_SLF4J_FACTORY = """package org.slf4j;
public class LoggerFactory {
    public static Logger getLogger(Class<?> c) {
        return new Logger() {
            public void info(String s, Object... o) {}
            public void debug(String s, Object... o) {}
            public void warn(String s, Object... o) {}
            public void error(String s, Object... o) {}
        };
    }
}
"""
_FJ_OBJ = """package com.alibaba.fastjson2;
// identity-typed compile stub for OperatorUtil (mode 'cv'): the harness
// stores EXACTLY the runtime types the getters cast to (Integer "type",
// String "operator", JSONArray of Strings "values"), so no fastjson2
// COERCION semantics are exercised — missing keys return null and a
// non-String element would ClassCastException, both matching the real
// library's typed-get behavior for these shapes. The semantics the
// fixture pins are the comparator's own (java.util.regex, parseLong,
// LocalDate SMART resolve), not the JSON library's.
public class JSONObject {
    private final java.util.Map<String, Object> m =
            new java.util.LinkedHashMap<>();
    public void put(String k, Object v) { m.put(k, v); }
    public String getString(String k) { return (String) m.get(k); }
    public Integer getInteger(String k) { return (Integer) m.get(k); }
    public JSONArray getJSONArray(String k) { return (JSONArray) m.get(k); }
}
"""
_FJ_ARR = """package com.alibaba.fastjson2;
// identity-typed compile stub — see JSONObject
public class JSONArray {
    private final java.util.List<Object> l = new java.util.ArrayList<>();
    public void add(Object v) { l.add(v); }
    public String getString(int i) { return (String) l.get(i); }
    public boolean isEmpty() { return l.isEmpty(); }
}
"""

_CCS_STUB = """package com.zhugeio.etl.common.cache;
// compile stub: EventAttrTransfer's constructor field only; the measured
// method (getUtmTermFromRef) never touches it
public class ConfigCacheService {
    public java.util.concurrent.CompletableFuture<
            java.util.Map<String, Integer>>
            batchGetEventAttrColumnIndex(String eid,
                                         java.util.List<String> ids) {
        return null;
    }
}
"""

_ROW_SETTERS = [
    "AppVersion", "Area", "Attr1", "Attr2", "Attr3", "Attr4", "Attr5",
    "BeginDate", "BeginDayId", "BeginTimeId", "Bs", "Bv", "Channel",
    "City", "Country", "CurrentUrl", "CustomProperty", "DeviceId",
    "Duration", "Eid", "EventIdColumn", "EventName", "Ip", "IpStr",
    "Mccmnc", "Network", "Os", "Ov", "Platform", "PropertyType",
    "ReferrerUrl", "SessionId", "UserId", "Useragent", "UtcDate",
    "UtmCampaign", "UtmContent", "UtmMedium", "UtmSource", "UtmTerm",
    "Uuid", "Website", "Yw", "ZgId",
]

_REF_FILES = {
    "com/zhugeio/etl/common/util/SearchKeywordParser.java":
        "etl-flink-common/src/main/java/com/zhugeio/etl/common/util/"
        "SearchKeywordParser.java",
    "com/zhugeio/etl/common/util/UrlDecoder.java":
        "etl-flink-common/src/main/java/com/zhugeio/etl/common/util/"
        "UrlDecoder.java",
    "com/zhugeio/etl/common/util/ToolUtil.java":
        "etl-flink-common/src/main/java/com/zhugeio/etl/common/util/"
        "ToolUtil.java",
    "com/zhugeio/etl/common/model/BaiduKeyword.java":
        "etl-flink-common/src/main/java/com/zhugeio/etl/common/model/"
        "BaiduKeyword.java",
    "com/zhugeio/etl/pipeline/transfer/EventAttrTransfer.java":
        "etl-flink-pipeline/src/main/java/com/zhugeio/etl/pipeline/"
        "transfer/EventAttrTransfer.java",
    "com/zhugeio/etl/common/util/DevicePropertyParser.java":
        "etl-flink-common/src/main/java/com/zhugeio/etl/common/util/"
        "DevicePropertyParser.java",
    "com/zhugeio/etl/common/model/DeviceProperty.java":
        "etl-flink-common/src/main/java/com/zhugeio/etl/common/model/"
        "DeviceProperty.java",
    "com/zhugeio/etl/pipeline/util/OperatorUtil.java":
        "etl-flink-pipeline/src/main/java/com/zhugeio/etl/pipeline/"
        "util/OperatorUtil.java",
}


def _lang3_jar() -> str:
    """The REAL commons-lang3 from the container's Spark distribution —
    OperatorUtil's StringUtils.isEmpty/isNotEmpty come from the genuine
    library, not a stub (the only other deps are the JDK and the
    identity fastjson2 stubs)."""
    import glob as _glob

    roots = [os.environ.get("SPARK_HOME", ""), "/opt"]
    for r in roots:
        if not r:
            continue
        hits = _glob.glob(os.path.join(r, "**", "commons-lang3-*.jar"),
                          recursive=True)
        if hits:
            return sorted(hits)[0]
    raise FileNotFoundError("commons-lang3 jar not found")


def build_classes(scratch: str, reference: str = "/root/reference") -> str:
    """Copy the reference sources UNMODIFIED into a scratch tree, write
    the no-op compile stubs, javac everything with KwMain; returns the
    classes dir."""
    import shutil

    src = os.path.join(scratch, "src")
    classes = os.path.join(scratch, "classes")
    os.makedirs(classes, exist_ok=True)
    for rel, refpath in _REF_FILES.items():
        dst = os.path.join(src, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(os.path.join(reference, refpath), dst)

    row = ["package com.zhugeio.etl.common.model;",
           "// compile stub: no-op setters (Object absorbs any arg type);",
           "// getUtmTermFromRef never reads a row",
           "public class EventAttrRow {",
           "    public EventAttrRow(Integer appId) {}",
           "    public static int getCustomColumns() { return 0; }"]
    row += [f"    public void set{n}(Object... v) {{}}" for n in _ROW_SETTERS]
    row.append("}")
    stubs = {
        "org/slf4j/Logger.java": _SLF4J_LOGGER,
        "org/slf4j/LoggerFactory.java": _SLF4J_FACTORY,
        "com/zhugeio/etl/common/cache/ConfigCacheService.java": _CCS_STUB,
        "com/zhugeio/etl/common/model/EventAttrRow.java": "\n".join(row),
        "com/alibaba/fastjson2/JSONObject.java": _FJ_OBJ,
        "com/alibaba/fastjson2/JSONArray.java": _FJ_ARR,
    }
    for rel, body in stubs.items():
        dst = os.path.join(src, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(dst, "w", encoding="utf-8") as fh:
            fh.write(body)

    javas = [os.path.join(src, rel) for rel in
             list(_REF_FILES) + list(stubs)]
    javas.append(os.path.join(os.path.dirname(__file__), "KwMain.java"))
    subprocess.run(["javac", "-encoding", "UTF-8", "-cp", _lang3_jar(),
                    "-d", classes, *javas], check=True)
    return classes


DBCS_MODULE = os.path.join(os.path.dirname(__file__), "..", "..",
                           "zg_etl_spark", "functions",
                           "java_dbcs_tables.py")


def _run_kwmain(classes, cells):
    lines = [json.dumps({"mode": m, "v": v}, separators=(",", ":"))
             for m, v in cells]
    proc = subprocess.run(
        # user.timezone pinned: mode 'ea' exercises Calendar /
        # SimpleDateFormat kernels that read the DEFAULT zone, and the
        # engine pins its session timezone to UTC (session.py) — the
        # fixture must be minted under the same deployment pin
        ["java", "-Dfile.encoding=UTF-8", "-Duser.timezone=UTC",
         "-cp", classes + os.pathsep + _lang3_jar(), "KwMain"],
        input="\n".join(lines) + "\n", capture_output=True, text=True)
    outs = [json.loads('"' + l + '"') for l in proc.stdout.splitlines()]
    assert len(outs) == len(cells), (len(outs), len(cells),
                                     proc.stderr[-500:])
    return outs


def gen_dbcs_tables(classes):
    """Dump Java's GBK and GB2312 decoders (the charsets
    String(bytes, cs) uses inside URLDecoder) into a generated runtime
    module. Per charset: singles = decode([b]) for every byte; pairs =
    decode([lead, trail, 0x41]) for lead 0x81-0xFE × trail 0x00-0xFF —
    a result of exactly two chars ending in 'A' means the pair was
    consumed as one unit (entry = its mapping, possibly U+FFFD for an
    unmappable-but-structural pair); anything else means the lead was
    malformed ALONE (entry = sentinel U+0000, trail reprocessed). The
    streaming decoder in search_keywords.java_dbcs_decode replays
    exactly these rules."""
    import base64
    import zlib

    tables = {}
    for mode, name in (("gb", "gbk"), ("g2", "gb2312")):
        cells = [(mode, f"{b:02X}") for b in range(256)]
        for lead in range(0x81, 0xFF):
            for trail in range(256):
                cells.append((mode, f"{lead:02X}{trail:02X}41"))
        outs = _run_kwmain(classes, cells)
        singles = "".join(outs[:256])
        assert len(singles) == 256
        pairs = {}
        i = 256
        for lead in range(0x81, 0xFF):
            row = []
            for trail in range(256):
                r = outs[i]
                i += 1
                row.append(r[0] if len(r) == 2 and r[1] == "A"
                           else "\x00")
            row_s = "".join(row)
            if row_s.strip("\x00"):
                pairs[str(lead)] = row_s
        tables[name] = {"singles": singles, "pairs": pairs}

    blob = base64.b64encode(zlib.compress(json.dumps(
        tables, ensure_ascii=False, separators=(",", ":"),
        sort_keys=True).encode("utf-8"), 9)).decode("ascii")
    body = '"""GENERATED by tests/tools/gen_refkw_fixture.py — Java\n'
    body += ("charset ground truth: the GBK / GB2312 decode tables of\n"
             "this container's JDK (sun.nio.cs DoubleByte decoders),\n"
             "dumped cell-by-cell via tests/tools/KwMain.java modes\n"
             "gb/g2. singles[b] = new String([b], cs); pairs[lead]\n"
             "[trail] = the pair's mapping, or U+0000 when the lead is\n"
             "malformed ALONE (trail reprocessed). Do not hand-edit.\n"
             '"""\n\n'
             "import base64 as _b64\nimport json as _json\n"
             "import zlib as _zlib\n\n")
    body += f"_BLOB = {blob!r}\n\n"
    body += ("TABLES = _json.loads(\n"
             "    _zlib.decompress(_b64.b64decode(_BLOB)).decode(\"utf-8\"))\n")
    with open(DBCS_MODULE, "w", encoding="utf-8") as fh:
        fh.write(body)
    print("wrote", DBCS_MODULE, {k: len(v["pairs"]) for k, v in
                                 tables.items()}, "pair rows")


DIGITS_MODULE = os.path.join(os.path.dirname(__file__), "..", "..",
                             "zg_etl_spark", "functions",
                             "java_digits.py")


def gen_java_digits(classes):
    """Dump Character.digit(c, 10) for every codepoint (KwMain mode
    'cd') into a generated runtime module — the table behind
    Long.parseLong / Integer.parseInt, which accept ANY Unicode decimal
    digit (Nd), not just ASCII (round-11 'cv' fixture find). BMP-only
    for the parse path: parseLong iterates UTF-16 chars, so a
    supplementary-plane digit arrives as two surrogates and throws."""
    outs = _run_kwmain(classes, [("cd", "all")])
    entries = {}
    for pair in outs[0].split(","):
        cp, d = pair.split(":")
        entries[int(cp, 16)] = int(d)
    assert entries[0x30] == 0 and entries[0x39] == 9
    assert len(entries) > 400, len(entries)
    body = '"""GENERATED by tests/tools/gen_refkw_fixture.py — Java\n'
    body += ("ground truth: every codepoint with Character.digit(c, 10)\n"
             ">= 0 on this container's JDK (KwMain mode 'cd'), i.e. the\n"
             "digit table Long.parseLong / Integer.parseInt consume.\n"
             "Do not hand-edit.\n"
             '"""\n\n'
             "# {codepoint: decimal value}\n")
    items = ", ".join(f"0x{cp:x}: {d}" for cp, d in sorted(entries.items()))
    body += f"DIGITS = {{{items}}}\n\n"
    body += ("# BMP-only translate map (SQL translate() source/target):\n"
             "# supplementary-plane digits are TWO UTF-16 chars to\n"
             "# parseLong and therefore throw — leaving them untranslated\n"
             "# makes the ASCII gate reject them, which matches.\n"
             "TRANSLATE_SRC = \"\".join(chr(cp) for cp in sorted(DIGITS)\n"
             "                         if cp <= 0xFFFF)\n"
             "TRANSLATE_DST = \"\".join(str(DIGITS[cp]) for cp in\n"
             "                         sorted(DIGITS) if cp <= 0xFFFF)\n")
    with open(DIGITS_MODULE, "w", encoding="utf-8") as fh:
        fh.write(body)
    print("wrote", DIGITS_MODULE, len(entries), "digit codepoints")


def main():
    if len(sys.argv) > 1:
        classes = sys.argv[1]
    else:
        import tempfile
        classes = build_classes(tempfile.mkdtemp(prefix="refkw_"))
    gen_dbcs_tables(classes)
    gen_java_digits(classes)
    cells = corpora()
    lines = [json.dumps({"mode": m, "v": v}, separators=(",", ":"))
             for m, v in cells]
    proc = subprocess.run(
        # user.timezone pinned: mode 'ea' exercises Calendar /
        # SimpleDateFormat kernels that read the DEFAULT zone, and the
        # engine pins its session timezone to UTC (session.py) — the
        # fixture must be minted under the same deployment pin
        ["java", "-Dfile.encoding=UTF-8", "-Duser.timezone=UTC",
         "-cp", classes + os.pathsep + _lang3_jar(), "KwMain"],
        input="\n".join(lines) + "\n", capture_output=True, text=True)
    outs = [json.loads('"' + l + '"') for l in proc.stdout.splitlines()]
    assert len(outs) == len(cells), (len(outs), len(cells),
                                     proc.stderr[-500:])
    with gzip.open(OUT, "wt", encoding="utf-8") as fh:
        fh.write(json.dumps({"n_cells": len(cells)}) + "\n")
        for (m, v), r in zip(cells, outs):
            # ensure_ascii: 'ea' ensureLength truncation outputs can hold
            # LONE surrogates, which a UTF-8 text stream cannot encode raw
            fh.write(json.dumps([m, v, r], ensure_ascii=True) + "\n")
    print("wrote", OUT, len(cells), "cells")


if __name__ == "__main__":
    main()
