"""Discovery ritual at SCALE (SURVEY.md §5.3): mint JVM ground truth
for tens of thousands of never-before-seen cells — far beyond the
committed fixture corpora — and verify every leg the committed tests
use. Round 10 ran this as uncommitted one-offs (~24k cells, four real
model gaps found); this commits the ritual so every later round can
re-arm it with one command.

    python tests/tools/mega_sweep.py [classes-dir] [--no-spark]
                                     [--scale N]

Modes swept (seed base = committed generator base + 7_777, rotated by
BUILD_ROUND, so the cells NEVER overlap the committed fixture):
  ea  EventAttrTransfer kernels (primary this round — newest surface):
      per-op fresh soups through the Python port AND the DUCK + SPARK
      dialect renderings (inside their documented SQL domain)
  ut  getUtmTermFromRef URI compositions
  kw / ua   SearchKeywordParser / uaAnalysis random URLs and UAs
  du / dm   URL-decode byte soups (UTF-8 + the table-driven DBCS lane)
  um / dt   urlParseToMap parts, dateUsStrToTimestamp strings
  dp  DevicePropertyParser brand x model combos

A divergence is a find: fix it or document it, pin it as a committed
fixture cell, and record the sweep in SURVEY.md. Exit code 1 on any
divergence; the summary prints per-mode cell counts either way."""

from __future__ import annotations

import importlib.util
import os
import random
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, ".."))
sys.path.insert(0, os.path.join(HERE, "..", ".."))

import gen_refkw_fixture as gen  # noqa: E402
from zg_etl_spark.buildinfo import BUILD_ROUND  # noqa: E402
from zg_etl_spark.functions.search_keywords import (  # noqa: E402
    ENGINES,
    decode_multi_charset,
    ref_utm_term_from_ref,
    url_decode_utf8,
)


def _load_kwfix():
    spec = importlib.util.spec_from_file_location(
        "kwfix", os.path.join(HERE, "..", "test_kw_jvm_fixture.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


S0, S1 = chr(0), chr(1)


def _seed(base: int) -> int:
    return base + 7_777 + BUILD_ROUND


def ea_mega(scale: int) -> list[str]:
    """Fresh soups per EventAttrTransfer op — same axes as the committed
    ea_corpus, two orders of magnitude more cells."""
    rng = random.Random(_seed(87_000_000))
    cells = []

    # el: wide alphabet incl. controls, CJK, astral, quotes/backslashes,
    # fullwidth space, lone surrogates, plus run-length stress near the
    # 256 UTF-16-unit truncation boundary
    alpha = (list("ab xy\t\n\r\x0b\x0c\"\\中文日本語🎉🚀𝒜") +
             ["\x00", "\u3000", "\u00a0", "\x1f", "\x02", "\\N",
              "\ud83d", "\udc00", "👨‍👩‍👧‍👦", ""])
    for _ in range(scale * 16):
        k = rng.randrange(0, 24)
        v = "".join(rng.choice(alpha) for _ in range(k))
        if rng.random() < 0.15:  # push past the truncation boundary
            v = v + rng.choice("aé中🎉") * rng.randrange(200, 300)
        ml = rng.choice([256, 256, 256, 1088, 0, 1, 2, 6, 255, 257,
                         rng.randrange(0, 300)])
        cells.append(f"el{S1}{ml}{S1}{v}")

    # ei / en: digit-gate soups (ASCII-only [0-9]* full-match)
    digits = "0123456789a +-.e_\u0660\uff11\u00b2\t\n"
    for _ in range(scale * 6):
        k = rng.randrange(0, 10)
        v = "".join(rng.choice(digits) for _ in range(k))
        cells.append(f"{rng.choice(['ei', 'en'])}{S1}{v}")

    # er: parseInt edges against random [mn, mx] windows
    for _ in range(scale * 3):
        mn, mx = sorted(rng.sample(range(-100, 90_000_000), 2))
        v = rng.choice([
            str(rng.randrange(-10, 90_000_000)),
            "0" * rng.randrange(1, 4) + str(rng.randrange(0, 99)),
            "+" + str(rng.randrange(0, 99)),
            str(rng.randrange(2**31 - 5, 2**31 + 5)),
            "".join(rng.choice("0123456789 .-+x_") for _ in
                    range(rng.randrange(0, 8)))])
        cells.append(f"er{S1}{mn}{S1}{mx}{S1}{v}")

    # il: dotted soups (split("\\.") trailing-empty drop, unvalidated
    # parseInt OR-folds)
    for _ in range(scale * 4):
        k = rng.randrange(0, 7)
        parts = [rng.choice([
            str(rng.randrange(-5, 300)), str(rng.randrange(2**31 - 3,
                                                           2**31 + 3)),
            "", "a", "+1", " 1", "07"]) for _ in range(k)]
        v = ".".join(parts) + ("." * rng.randrange(0, 3))
        cells.append(f"il{S1}{v}")

    # em: st/se rewrite key soup
    for _ in range(scale):
        zg = rng.choice([S0, "-1", "-2", "-3", "0", "1", "st", "",
                         " -1", "-1 ", str(rng.randrange(-9, 9))])
        eid = rng.choice([S0, "", "login", "se", "st", "-1", "a\tb",
                          "x" * rng.randrange(0, 5)])
        cells.append(f"em{S1}{zg}{S1}{eid}")

    # tc / ts: wide epochs, gate boundary jitter
    lim = 48 * 3600 * 1000
    for _ in range(scale * 4):
        ct = rng.randrange(-4_000_000_000_000, 4_000_000_000_000)
        cells.append(f"tc{S1}{ct}")
        tz = rng.choice([0, 28_800_000, lim, lim + 1, -lim, -lim - 1,
                         rng.randrange(-2 * lim, 2 * lim), None])
        cells.append(f"ts{S1}{ct}{S1}{S0 if tz is None else tz}")

    # gy: well-formed, lenient-roll, and garbage datetime strings
    for _ in range(scale * 4):
        kind = rng.random()
        if kind < 0.55:
            v = (f"{rng.randrange(1900, 2100):04d}-"
                 f"{rng.randrange(1, 13):02d}-{rng.randrange(1, 29):02d} "
                 f"{rng.randrange(0, 24):02d}:{rng.randrange(0, 60):02d}:"
                 f"{rng.randrange(0, 60):02d}")
        elif kind < 0.85:  # lenient Calendar rolls
            v = (f"{rng.randrange(1990, 2030):04d}-"
                 f"{rng.randrange(0, 20):02d}-{rng.randrange(0, 40):02d} "
                 f"{rng.randrange(0, 99):02d}:{rng.randrange(0, 99):02d}:"
                 f"{rng.randrange(0, 99):02d}")
        else:
            v = "".join(rng.choice("0123456789-: /Tabz") for _ in
                        range(rng.randrange(0, 22)))
        cells.append(f"gy{S1}{v}")

    return cells


def ut_mega(scale: int) -> list[str]:
    rng = random.Random(_seed(71_000_000))
    schemes = ["http://", "https://", "", "//", "ftp://", "1a://",
               "a+b://", "ht tp://", ":", "http:"]
    auth_bits = ["www.sogou.com", "wap.sogou.com:80", "u@cn.bing.com",
                 "u:p@www.so.com", "m.sm.cn", "x_y.sogou.com",
                 "-a.bing.com", "www.google.com.", "a.so.com.9",
                 "WWW.SOGOU.COM", "1.2.3.4", "[::1]", "[a.sogou.com]",
                 "[::zz]", "", "www.sogou.com:x1", "%73ogou.com",
                 "so\u4e2dgou.com", "m.baidu.com"]
    paths = ["/web", "/s/x", "", "/a b", "/a%zz", "/a[0]", "/\u4e2d",
             "/\x7f", "/a?b"]
    qnames = ["query", "q", "wd", "word", "keyword", "QUERY", "x", ""]
    qvals = ["kw", "", "%E4%B8%AD", "100%25", "100%", "a+b", "a%2",
             "a b", "\u4e2d", "a%26b", "%zz", "%ED%A0%80"]
    frags = ["", "#f", "#f?query=infrag", "#q=h", "#"]
    out = set()
    for _ in range(scale * 40):
        u = rng.choice(schemes) + rng.choice(auth_bits) + rng.choice(paths)
        if rng.random() < 0.85:
            parts = [f"{rng.choice(qnames)}={rng.choice(qvals)}"
                     for _ in range(rng.randrange(1, 4))]
            u += "?" + "&".join(parts)
        u += rng.choice(frags)
        out.add(u)
    return sorted(out)


def kw_ua_mega(scale: int) -> tuple[list[str], list[str]]:
    rng = random.Random(_seed(61_000_000))
    hosts = ["www.baidu.com/s", "tieba.baidu.com/f", "m.baidu.com/s",
             "www.google.com.hk/search", "google.cn/m",
             "www.sogou.com/web", "wap.sogou.com/x", "www.so.com/s",
             "m.so.com/index", "cn.bing.com/search", "m.sm.cn/s",
             "so.toutiao.com/search", "search.yahoo.com/search",
             "notbaidu.com/s", "BAIDU.COM/S", "a.b/c&wd=pathamp",
             "x.soGou.Com/w", "image.baidu.com/i"]
    all_params = sorted({p for _, _, ps in ENGINES for p in ps})
    names = all_params + [p.upper() for p in all_params] + [
        "awd", "wdx", "xq", "qq", "keywords", "WORD", "KeyWord", "x",
        "y", "", "eqid"]
    values = ["", "kw1", "a=b", '"q1"', "'q2'", " sp ", "%E4%B8%AD",
              "%D6%D0", "multi word", "'", '"', "v_1-2.3", "=",
              "kw+plus", "%ED%A0%80", "0123456789abcdef0123456789abcdef",
              "%zz", "100%"]
    urls = set()
    for _ in range(scale * 25):
        parts = []
        for _ in range(rng.randrange(0, 7)):
            name = rng.choice(names)
            parts.append(name if rng.random() < 0.12
                         else f"{name}={rng.choice(values)}")
        q = "?" + "&".join(parts) if (parts or rng.random() < 0.3) else ""
        urls.add(f"https://{rng.choice(hosts)}{q}")

    rng2 = random.Random(_seed(59_000_000))
    prefixes = ["Mozilla/5.0 ", "", "Opera/9.80 ", "mozilla/4.0 "]
    bodies = ["(Linux; U; Android {v}; zh-cn; X) ",
              "(Linux; Android {v}) ", "(linux; android {v}) ",
              "(LINUX; ANDROID {v}) ", "(Android {v}; Mobile) ",
              "(iPhone; CPU iPhone OS {v} like Mac OS X) ",
              "(iPad; CPU OS {v} like Mac OS X) ",
              "(ipod touch; cpu os {v} like) ", "(iPhone; Opera",
              "(iPad;  Opera", "(iphone; opera Mini) ", "(IPAD; OPERA) ",
              "(iPhone; CPU OS {v}) ", "(Windows NT 10.0) ",
              "ipand os {v} like ", "shipone os {v} like ",
              "(iPhone{v}Opera", "(Android{v}) Opera "]
    tails = ["AppleWebKit/537.36", "Safari/604.1", "", "like Gecko"]
    vers = ["13", "16_6", "17.2.1", "4.2,1", "a-b/c", "10_0_1", "X",
            "1__2", "9-", "..", "16 6", "", " ", "999_999_999"]
    uas = set()
    for _ in range(scale * 20):
        uas.add((rng2.choice(prefixes)
                 + rng2.choice(bodies).replace("{v}", rng2.choice(vers))
                 + rng2.choice(tails)).strip())
    return sorted(urls), sorted(uas)


def decode_mega(scale: int) -> tuple[list[str], list[str]]:
    """du (UTF-8) and dm (multi-charset) byte-soup legs."""
    rng = random.Random(_seed(77_000_000))
    leads = [0xC2, 0xC0, 0xDF, 0xE0, 0xE4, 0xED, 0xEE, 0xF0, 0xF4,
             0xF5, 0xF8, 0xFF, 0x80]
    du = set()
    for _ in range(scale * 12):
        k = rng.randrange(1, 10)
        if rng.random() < 0.5:
            du.add("".join(f"%{rng.randrange(256):02X}"
                           for _ in range(k)))
        else:
            bs = [rng.choice(leads)]
            for _ in range(rng.randrange(0, 6)):
                bs.append(rng.choice([0x80, 0x9F, 0xA0, 0xBF, 0x41,
                                      0xC0, rng.randrange(256)]))
            du.add("".join(f"%{b:02X}" for b in bs))
    rng2 = random.Random(_seed(79_000_000))
    pool = [0xD6, 0xD0, 0xCE, 0xC4, 0x81, 0xFE, 0x40, 0x7F, 0x80,
            0xA1, 0x41, 0xAA, 0xF7, 0xFF]
    dm = set()
    for _ in range(scale * 12):
        k = rng2.randrange(1, 8)
        dm.add("".join(
            f"%{rng2.choice(pool + [rng2.randrange(0x30, 0xFF)]):02X}"
            for _ in range(k)))
    return sorted(du), sorted(dm)


def um_dt_mega(scale: int) -> tuple[list[str], list[str]]:
    rng = random.Random(_seed(67_000_000))
    keys = ["lid", "lname", "channel_type", "k", "a+b", "%6b", "a%3Db",
            "", "x", "a"]
    vals = ["1", "a%26b", "c+d", "a=b", "a==b", "", "%zz", "%E4%B8%AD",
            "v"]
    um = set()
    for _ in range(scale * 6):
        parts = []
        for _ in range(rng.randrange(0, 5)):
            r = rng.random()
            if r < 0.12:
                parts.append(rng.choice(["=", "==", "", "&"]))
            elif r < 0.24:
                parts.append(rng.choice(keys))
            else:
                parts.append(f"{rng.choice(keys)}={rng.choice(vals)}")
        u = "https://x.cn/l" + ("?" + "&".join(parts)
                                if (parts or rng.random() < 0.2) else "")
        if rng.random() < 0.15:
            u += rng.choice(["#f?c=3", "?b=2", "#"])
        um.add(u)
    dt = set()
    for _ in range(scale * 6):
        kind = rng.random()
        if kind < 0.6:
            v = (f"{rng.randrange(0, 10000):04d}-"
                 f"{rng.randrange(0, 20):02d}-{rng.randrange(0, 40):02d}"
                 f"T{rng.randrange(0, 30):02d}:{rng.randrange(0, 70):02d}"
                 f":{rng.randrange(0, 70):02d}Z")
        elif kind < 0.8:
            v = (f"{rng.randrange(1990, 2030)}-{rng.randrange(1, 13):02d}"
                 f"-{rng.randrange(1, 29):02d}T{rng.randrange(0, 24):02d}"
                 f":{rng.randrange(0, 60):02d}Z")
        else:
            v = "".join(rng.choice("0123456789-:TZ .z") for _ in
                        range(rng.randrange(0, 22)))
        dt.add(v)
    return sorted(um), sorted(dt)


def dp_mega(scale: int) -> list[str]:
    rng = random.Random(_seed(83_000_000))
    from zg_etl_spark.plans.pipeline import _BRAND_MAP

    keys = [k for k, _ in _BRAND_MAP]
    brands = keys + [k.upper() for k in keys] + [
        f" {k} " for k in keys[:20]] + [
        "huawei honor", "xiaomi redmi", "my-redmi", "semi", "miX",
        "BlackShark-\u9ed1\u9ca8", "", "\u3000mi\u3000", "none",
        "redmi mi honor"]
    models = [None, "", "Mate 60 Pro", "K70", "Note 12",
              "iPhone 15 Pro Max", "GT Neo5", "\u65d7\u8230\u7248",
              "5g", "\u5168\u7f51\u901a", "Galaxy Z Flip5", "2022\u6b3e",
              "X90s+", "~!@#2024", "  double  space  ", "Pro+", "se2",
              "flip", "FOLD"]
    out = set()
    for _ in range(scale * 15):
        b = rng.choice(brands)
        if rng.random() < 0.25:
            b = b + rng.choice([" ", ""]) + rng.choice(brands)
        m = rng.choice(models)
        out.add((S0 if b is None else b) + S1 + (S0 if m is None else m))
    return sorted(out)


def _u16(s: str) -> bytes:
    """Compare at the UTF-16-unit level — Java's native string model.
    A corpus that puts a lone high surrogate directly before a lone low
    one forms a VALID pair on the JVM side, and json round-trips it
    back as the astral char, while the Python port string keeps two
    lone surrogates; the two spellings are the SAME Java string, so
    unit-level equality is the honest ground-truth check (exact-string
    compare stays correct for the committed fixture, whose corpora
    never adjoin a convertible pair)."""
    return s.encode("utf-16-be", "surrogatepass")


def check_python(kwfix, cells, outs):
    """Every mode through its Python model — the dispatch the committed
    test_python_models_reproduce_kw_jvm_fixture runs."""
    bad = []
    counts: dict = {}
    for (m, v), jvm in zip(cells, outs):
        if m == "kw":
            want = kwfix._py_kw(v)
        elif m == "ea":
            want = kwfix._py_ea(v)
            want = " NULL" if want is None else want
        elif m == "ua":
            want = kwfix._py_ua(v)
        elif m == "um":
            mp = kwfix._py_um(v)
            want = kwfix.SEP1.join(
                f"{k}{kwfix.SEP2}{mp[k]}" for k in sorted(mp))
        elif m == "dt":
            want = str(kwfix._py_dt(v))
        elif m == "ut":
            want = ref_utm_term_from_ref(v)
        elif m == "dp":
            want = kwfix._py_dp(v)
        elif m == "dm":
            want = decode_multi_charset(v)
            want = " NULL" if want is None else want
        else:
            want = url_decode_utf8(v)
            want = " NULL" if want is None else want
        counts[m] = counts.get(m, 0) + 1
        if _u16(want) != _u16(jvm):
            bad.append((m, v, jvm, want))
    return counts, bad


def check_ea_sql(kwfix, ea_cells, run_dialect):
    """The dialect-rendering leg: group cells inside the SQL domain and
    evaluate each kernel template, exactly as the committed
    test_ea_sql_templates_* tests do. run_dialect(expr, typ, rows) must
    return {i: value}."""
    groups, excluded = kwfix._ea_sql_plan(ea_cells)
    bad = []
    for (kind, key), rows in sorted(groups.items(),
                                    key=lambda kv: str(kv[0])):
        expr, typ, caster = run_dialect.render(kind, key)
        got = run_dialect.run(expr, typ, rows)
        for i, (x, jvm) in enumerate(rows):
            want = None if jvm == kwfix._NV else caster(jvm)
            if got[i] != want:
                bad.append((kind, key, x, jvm, got[i]))
    return sum(len(r) for r in groups.values()), excluded, bad


class DuckLeg:
    def __init__(self):
        import duckdb

        from zg_etl_spark.operators.domain import DUCK

        self.con = duckdb.connect()
        self.d = DUCK

    def render(self, kind, key):
        d = self.d
        if kind == "el":
            return d.clean("v", key), "VARCHAR", str
        if kind == "ei":
            return d.int_len("v"), "VARCHAR", str
        if kind == "en":
            return d.net("v"), "VARCHAR", str
        if kind == "tc":
            ts = d.ts("v")
            return (f"{d.fmt(ts, 'yyyyMMdd')} || chr(2) || "
                    f"{d.fmt(ts, 'HH')} || chr(2) || "
                    f"lpad(CAST((v % 1000 + 1000) % 1000 AS VARCHAR),"
                    f" 3, '0')"), "BIGINT", str
        return (f"CAST({d.yw_java('v')} AS VARCHAR)", "DATE",
                lambda jvm: str(int(jvm)))

    def run(self, expr, typ, rows):
        self.con.execute("DROP TABLE IF EXISTS t")
        self.con.execute(f"CREATE TABLE t (i INT, v {typ})")
        self.con.executemany(
            "INSERT INTO t VALUES (?, ?)",
            [(i, x) for i, (x, _) in enumerate(rows)])
        return dict(self.con.execute(
            f"SELECT i, {expr} FROM t ORDER BY i").fetchall())


class SparkLeg:
    def __init__(self, spark):
        from zg_etl_spark.operators.domain import SPARK

        self.spark = spark
        self.d = SPARK

    def render(self, kind, key):
        d = self.d
        if kind == "el":
            return d.clean("v", key), "string", str
        if kind == "ei":
            return d.int_len("v"), "string", str
        if kind == "en":
            return d.net("v"), "string", str
        if kind == "tc":
            ts = d.ts("v")
            return (f"concat({d.fmt(ts, 'yyyyMMdd')}, char(2), "
                    f"{d.fmt(ts, 'HH')}, char(2), "
                    f"lpad(CAST((v % 1000 + 1000) % 1000 AS STRING),"
                    f" 3, '0'))"), "bigint", str
        return (f"CAST({d.yw_java('v')} AS STRING)", "date",
                lambda jvm: str(int(jvm)))

    def run(self, expr, typ, rows):
        from pyspark.sql.types import (DateType, LongType, StringType,
                                       StructField, StructType)

        t = {"string": StringType(), "bigint": LongType(),
             "date": DateType()}[typ]
        df = self.spark.createDataFrame(
            [(i, x) for i, (x, _) in enumerate(rows)],
            StructType([StructField("i", LongType()),
                        StructField("v", t)]))
        df.createOrReplaceTempView("ea_mega_cells")
        return {r.i: r.o for r in self.spark.sql(
            f"SELECT i, {expr} AS o FROM ea_mega_cells").collect()}


def main() -> int:
    args = [a for a in sys.argv[1:]]
    use_spark = "--no-spark" not in args
    args = [a for a in args if a != "--no-spark"]
    scale = 100
    if "--scale" in args:
        i = args.index("--scale")
        scale = int(args[i + 1])
        del args[i:i + 2]
    classes = args[0] if args else gen.build_classes(
        tempfile.mkdtemp(prefix="megasweep_"))

    kwfix = _load_kwfix()
    urls, uas = kw_ua_mega(scale)
    du, dm = decode_mega(scale)
    um, dt = um_dt_mega(scale)
    cells = ([("ea", v) for v in ea_mega(scale)]
             + [("ut", v) for v in ut_mega(scale)]
             + [("kw", u) for u in urls] + [("ua", u) for u in uas]
             + [("du", v) for v in du] + [("dm", v) for v in dm]
             + [("um", v) for v in um] + [("dt", v) for v in dt]
             + [("dp", v) for v in dp_mega(scale)])
    # de-dup across legs, keep first occurrence
    seen, uniq = set(), []
    for c in cells:
        if c not in seen:
            seen.add(c)
            uniq.append(c)
    cells = uniq
    print(f"mega-sweep round {BUILD_ROUND}: {len(cells)} cells "
          f"(scale {scale})", flush=True)

    outs = []
    CHUNK = 20_000
    for i in range(0, len(cells), CHUNK):
        outs.extend(gen._run_kwmain(classes, cells[i:i + CHUNK]))
        print(f"  jvm {min(i + CHUNK, len(cells))}/{len(cells)}",
              flush=True)

    counts, bad = check_python(kwfix, cells, outs)
    print("per-mode:", dict(sorted(counts.items())))
    for b in bad[:10]:
        print("PY-DIVERGENCE:", b)

    ea_cells = [(v, r) for (m, v), r in zip(cells, outs) if m == "ea"]
    cov, exc, bad_d = check_ea_sql(kwfix, ea_cells, DuckLeg())
    print(f"ea duck leg: {cov} covered, {exc} carve-outs, "
          f"{len(bad_d)} divergences")
    for b in bad_d[:10]:
        print("DUCK-DIVERGENCE:", b)

    bad_s: list = []
    if use_spark:
        from zg_etl_spark.session import get_spark

        spark = get_spark(app_name="mega_sweep", cpus=8)
        cov_s, exc_s, bad_s = check_ea_sql(kwfix, ea_cells,
                                           SparkLeg(spark))
        print(f"ea spark leg: {cov_s} covered, {exc_s} carve-outs, "
              f"{len(bad_s)} divergences")
        for b in bad_s[:10]:
            print("SPARK-DIVERGENCE:", b)
        spark.stop()

    n_bad = len(bad) + len(bad_d) + len(bad_s)
    print(f"TOTAL divergences: {n_bad}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
