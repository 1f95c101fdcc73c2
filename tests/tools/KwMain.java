import com.zhugeio.etl.common.model.BaiduKeyword;
import com.zhugeio.etl.common.util.SearchKeywordParser;
import com.zhugeio.etl.common.util.ToolUtil;
import com.zhugeio.etl.common.util.UrlDecoder;

import java.io.BufferedReader;
import java.io.InputStreamReader;
import java.nio.charset.StandardCharsets;

public class KwMain {
    // stdin: JSON lines {"mode": "kw"|"ua"|"dm"|"du", "v": "..."} ;
    // kw = SearchKeywordParser.parse -> "engine|keyword",
    // ua = ToolUtil.uaAnalysis, dm = UrlDecoder.decodeMultiCharset,
    // du = UrlDecoder.decode. Output: one JSON string per line.
    public static void main(String[] args) throws Exception {
        SearchKeywordParser p = new SearchKeywordParser();
        // ut = EventAttrTransfer.getUtmTermFromRef(null, v) — private,
        // reached via reflection on the reference class compiled
        // unmodified (stub ConfigCacheService/EventAttrRow satisfy the
        // unrelated constructor/compile deps)
        Class<?> eat = Class.forName(
                "com.zhugeio.etl.pipeline.transfer.EventAttrTransfer");
        Object eatInst = eat.getConstructor(
                com.zhugeio.etl.common.cache.ConfigCacheService.class,
                int.class, int.class, int.class)
                .newInstance(null, 365, 1, 128);
        java.lang.reflect.Method utm = eat.getDeclaredMethod(
                "getUtmTermFromRef", String.class, String.class);
        utm.setAccessible(true);
        // dp = DevicePropertyParser.parse(brand, model); v is
        // brand U+0001 model, with U+0000 standing in for null
        com.zhugeio.etl.common.util.DevicePropertyParser dpp =
                new com.zhugeio.etl.common.util.DevicePropertyParser();
        BufferedReader in = new BufferedReader(
                new InputStreamReader(System.in, StandardCharsets.UTF_8));
        java.io.PrintStream out =
                new java.io.PrintStream(System.out, true, "UTF-8");
        String line;
        while ((line = in.readLine()) != null) {
            if (line.isEmpty()) continue;
            // minimal JSON: {"mode":"xx","v":"..."} with unicode escapes
            int i1 = line.indexOf("\"mode\":\"") + 8;
            String mode = line.substring(i1, i1 + 2);
            int i2 = line.indexOf("\"v\":\"") + 5;
            String esc = line.substring(i2, line.lastIndexOf('"'));
            String v = unescape(esc);
            String r;
            try {
                switch (mode) {
                    case "kw":
                        BaiduKeyword k = p.parse(v);
                        r = k.getSearchEngine() + "|" + k.getKeyword();
                        break;
                    case "ua": r = ToolUtil.uaAnalysis(v); break;
                    case "dm": r = UrlDecoder.decodeMultiCharset(v); break;
                    case "du": r = UrlDecoder.decode(v); break;
                    case "dt":
                        r = String.valueOf(ToolUtil.dateUsStrToTimestamp(v));
                        break;
                    case "ut":
                        r = (String) utm.invoke(eatInst, null, v);
                        break;
                    // gb/g2 = raw new String(bytes, GBK/GB2312) — the
                    // decoder URLDecoder delegates to; v is plain hex
                    // (table-dump probes for the Python DBCS port)
                    case "gb":
                    case "g2": {
                        byte[] bs = new byte[v.length() / 2];
                        for (int j = 0; j < bs.length; j++)
                            bs[j] = (byte) Integer.parseInt(
                                    v.substring(j * 2, j * 2 + 2), 16);
                        r = new String(bs,
                                mode.equals("gb") ? "GBK" : "GB2312");
                        break;
                    }
                    case "dp": {
                        int sep = v.indexOf('\u0001');
                        String brand = v.substring(0, sep);
                        String model = v.substring(sep + 1);
                        if (brand.equals("\u0000")) brand = null;
                        if (model.equals("\u0000")) model = null;
                        com.zhugeio.etl.common.model.DeviceProperty dp =
                                dpp.parse(brand, model);
                        String[] f = {dp.getStandardBrand(),
                                dp.getStandardModel(),
                                dp.getDeviceCategory(), dp.getPriceRange(),
                                dp.is5GSupported() ? "1" : "0",
                                dp.isFoldable() ? "1" : "0",
                                dp.getReleaseYear()};
                        StringBuilder b = new StringBuilder();
                        for (String x : f) {
                            if (b.length() > 0) b.append('\u0002');
                            b.append(x == null ? "\u0000" : x);
                        }
                        r = b.toString();
                        break;
                    }
                    // ea = EventAttrTransfer kernels (sanitizers, time
                    // buckets, the st/se rewrite) — private, reached by
                    // reflection like mode 'ut'; v = op + U+0001-
                    // joined args, U+0000 standing in for null. Run
                    // with -Duser.timezone=UTC: Calendar and
                    // SimpleDateFormat use the default zone and the
                    // engine pins UTC.
                    case "ea": {
                        String[] a = v.split("\u0001", -1);
                        r = eaKernel(eat, eatInst, a);
                        break;
                    }
                    // cv = OperatorUtil.compareValue(value, matchJson) —
                    // the production 2-arg variant (the only one called:
                    // compareProValue:41-94). v = value U+0001 type
                    // U+0001 operator U+0001 values; U+0000 = null value
                    // / empty list, U+0004 = omit the JSON key, values
                    // items joined by U+0002. The fastjson2 stub stores
                    // EXACTLY the types the getters return (Integer
                    // type, String operator, String items) so no
                    // fastjson2 coercion runs — the pinned semantics are
                    // the comparator's own (Pattern/find, parseLong's
                    // Character.digit, LocalDate SMART resolve, the
                    // relative-day int-overflow chain).
                    case "cv": {
                        String[] a = v.split("\u0001", -1);
                        com.alibaba.fastjson2.JSONObject mj =
                                new com.alibaba.fastjson2.JSONObject();
                        if (!a[1].equals("\u0004"))
                            mj.put("type", Integer.valueOf(a[1]));
                        if (!a[2].equals("\u0004"))
                            mj.put("operator", nul(a[2]));
                        if (!a[3].equals("\u0004")) {
                            com.alibaba.fastjson2.JSONArray arr =
                                    new com.alibaba.fastjson2.JSONArray();
                            if (!a[3].equals("\u0000"))
                                for (String it : a[3].split("\u0002", -1))
                                    arr.add(it);
                            mj.put("values", arr);
                        }
                        Boolean b = com.zhugeio.etl.pipeline.util
                                .OperatorUtil.compareValue(nul(a[0]), mj);
                        r = String.valueOf(b);
                        break;
                    }
                    // cd = Character.digit(c, 10) dump — v="all" emits
                    // every codepoint with digit >= 0 as "cphex:digit"
                    // comma-joined (the table java_parse_long replays);
                    // else one hex codepoint
                    case "cd": {
                        if (v.equals("all")) {
                            StringBuilder b = new StringBuilder();
                            for (int cp = 0; cp <= 0x10FFFF; cp++) {
                                int d = Character.digit(cp, 10);
                                if (d >= 0) {
                                    if (b.length() > 0) b.append(',');
                                    b.append(Integer.toHexString(cp))
                                     .append(':').append(d);
                                }
                            }
                            r = b.toString();
                        } else {
                            int cp = Integer.parseInt(v, 16);
                            r = String.valueOf(Character.digit(cp, 10));
                        }
                        break;
                    }
                    case "um": {
                        java.util.Map<String, Object> mp =
                                ToolUtil.urlParseToMap(v);
                        java.util.TreeMap<String, Object> tm =
                                new java.util.TreeMap<>(mp);
                        StringBuilder b = new StringBuilder();
                        for (java.util.Map.Entry<String, Object> en
                                : tm.entrySet()) {
                            if (b.length() > 0) b.append("\u0001");
                            b.append(en.getKey()).append("\u0002")
                             .append(en.getValue());
                        }
                        r = b.toString();
                        break;
                    }
                    default: r = "?";
                }
                if (r == null) r = " NULL";
            } catch (Throwable e) {
                r = "THROW:" + e.getClass().getSimpleName();
            }
            out.println(escape(r));
        }
    }

    // EventAttrTransfer kernel dispatch: a[0] = op, a[1..] = args,
    // "\u0000" = null. Emits the method's exact return ("\\N" included);
    // 'tc' joins the three time components with U+0002.
    static String eaKernel(Class<?> eat, Object inst, String[] a)
            throws Exception {
        java.lang.reflect.Method m;
        switch (a[0]) {
            case "el":
                m = eat.getDeclaredMethod("ensureLength",
                        String.class, int.class);
                m.setAccessible(true);
                return (String) m.invoke(inst, nul(a[2]),
                        Integer.parseInt(a[1]));
            case "ei":
                m = eat.getDeclaredMethod("ensureIntLength",
                        String.class, int.class);
                m.setAccessible(true);
                return (String) m.invoke(inst, nul(a[1]), 256);
            case "en":
                m = eat.getDeclaredMethod("ensureNetwork", String.class);
                m.setAccessible(true);
                return (String) m.invoke(inst, nul(a[1]));
            case "er":
                m = eat.getDeclaredMethod("ensureIntRange",
                        String.class, int.class, int.class);
                m.setAccessible(true);
                return (String) m.invoke(inst, nul(a[3]),
                        Integer.parseInt(a[1]), Integer.parseInt(a[2]));
            case "il": {
                m = eat.getDeclaredMethod("ipToLong", String.class);
                m.setAccessible(true);
                Object l = m.invoke(inst, nul(a[1]));
                return l == null ? null : String.valueOf(l);
            }
            case "em": {
                m = eat.getDeclaredMethod("getEventNameFromMap",
                        java.util.Map.class);
                m.setAccessible(true);
                java.util.Map<String, Object> pr = new java.util.HashMap<>();
                if (!a[1].equals("\u0000")) pr.put("$zg_eid", a[1]);
                if (!a[2].equals("\u0000")) pr.put("$eid", a[2]);
                return (String) m.invoke(inst, pr);
            }
            case "tc": {
                m = eat.getDeclaredMethod("getTimeComponents", Long.class);
                m.setAccessible(true);
                @SuppressWarnings("unchecked")
                java.util.Map<String, String> t =
                        (java.util.Map<String, String>) m.invoke(
                                inst, Long.valueOf(a[1]));
                String[] ks = {"day", "hour", "mill"};
                StringBuilder b = new StringBuilder();
                for (String k2 : ks) {
                    if (b.length() > 0) b.append('\u0002');
                    String x = t.get(k2);
                    b.append(x == null ? "\u0000" : x);
                }
                return b.toString();
            }
            case "ts": {
                m = eat.getDeclaredMethod("timestampToDateString",
                        Long.class, Integer.class);
                m.setAccessible(true);
                Long ct = a[1].equals("\u0000") ? null
                        : Long.valueOf(a[1]);
                Integer tz = a[2].equals("\u0000") ? null
                        : Integer.valueOf(a[2]);
                return (String) m.invoke(inst, ct, tz);
            }
            case "gy": {
                m = eat.getDeclaredMethod("getYearWeek", String.class);
                m.setAccessible(true);
                return (String) m.invoke(inst, a[1]);
            }
            default: return "?op";
        }
    }

    static String nul(String s) {
        return s.equals("\u0000") ? null : s;
    }

    static String unescape(String s) {
        StringBuilder b = new StringBuilder();
        for (int i = 0; i < s.length(); i++) {
            char c = s.charAt(i);
            if (c == '\\') {
                char n = s.charAt(++i);
                if (n == 'u') {
                    b.append((char) Integer.parseInt(
                            s.substring(i + 1, i + 5), 16));
                    i += 4;
                } else if (n == 'n') b.append('\n');
                else if (n == 't') b.append('\t');
                else if (n == 'r') b.append('\r');
                // json.dumps' remaining short escapes — without these a
                // corpus '\f'/'\b' arrives as the LETTER and corrupts
                // the cell before the JVM runs (round-11 sweep find)
                else if (n == 'f') b.append('\f');
                else if (n == 'b') b.append('\b');
                else b.append(n);
            } else b.append(c);
        }
        return b.toString();
    }

    static String escape(String s) {
        StringBuilder b = new StringBuilder();
        for (int i = 0; i < s.length(); i++) {
            char c = s.charAt(i);
            if (c == '\\' || c == '"') b.append('\\').append(c);
            // surrogates escaped too: mode 'ea' ensureLength truncation
            // can split a pair, and a lone surrogate through the UTF-8
            // PrintStream would silently become '?'
            else if (c < 0x20 || (c >= 0xD800 && c <= 0xDFFF))
                b.append(String.format("\\u%04x", (int) c));
            else b.append(c);
        }
        return b.toString();
    }
}
