"""Generate tests/data/refkw_jvm_fixture.jsonl.gz — ground truth from
the reference's SearchKeywordParser / ToolUtil.uaAnalysis / UrlDecoder,
executed on this container's JDK.

Recipe (repo root; requires /root/reference and JAVA_HOME):

1. Copy UNMODIFIED into a scratch src tree (never committed here):
       SearchKeywordParser.java, UrlDecoder.java, ToolUtil.java
                                   (etl-flink-common …/util/)
       BaiduKeyword.java           (etl-flink-common …/model/)
   plus a 10-line org.slf4j Logger/LoggerFactory no-op stub (their only
   non-JDK import).
2. javac -encoding UTF-8 them + tests/tools/KwMain.java.
3. python tests/tools/gen_refkw_fixture.py <classes-dir>

Corpora: the same fresh-seed generators the sweep tests use (URL corpus
seed 61M+round, UA corpus seed 59M+round, both widened) plus a
hand-picked byte-dirty decode alphabet. tests/test_kw_jvm_fixture.py
verifies the Python models against the result fixture."""

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
            "%GG", "a%%20b", "%e4%b8%ad"]

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
]


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
            + [("um", v) for v in UM_VALS] + [("dt", v) for v in DT_VALS])


def main():
    classes = sys.argv[1]
    cells = corpora()
    lines = [json.dumps({"mode": m, "v": v}, separators=(",", ":"))
             for m, v in cells]
    proc = subprocess.run(
        ["java", "-Dfile.encoding=UTF-8", "-cp", classes, "KwMain"],
        input="\n".join(lines) + "\n", capture_output=True, text=True)
    outs = [json.loads('"' + l + '"') for l in proc.stdout.splitlines()]
    assert len(outs) == len(cells), (len(outs), len(cells),
                                     proc.stderr[-500:])
    with gzip.open(OUT, "wt", encoding="utf-8") as fh:
        fh.write(json.dumps({"n_cells": len(cells)}) + "\n")
        for (m, v), r in zip(cells, outs):
            fh.write(json.dumps([m, v, r], ensure_ascii=False) + "\n")
    print("wrote", OUT, len(cells), "cells")


if __name__ == "__main__":
    main()
