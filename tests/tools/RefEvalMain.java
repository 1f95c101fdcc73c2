// Harness main for generating tests/data/refeval_jvm_fixture.jsonl.gz:
// reads {"expr": <sql>, "row": {...}} JSON lines on stdin, runs the
// REFERENCE's own SqlToJsonExpressionConverter +
// VirtualAttributeExpressionEvaluator (compiled UNMODIFIED from
// /root/reference at generation time — never copied into this repo),
// and prints one type-tagged result string per line. See
// gen_refeval_fixture.py for the compile-and-run recipe.
import com.fasterxml.jackson.databind.JsonNode;
import com.fasterxml.jackson.databind.ObjectMapper;
import com.zhugeio.etl.common.util.DateTimeResult;
import com.zhugeio.etl.pipeline.operator.id.virtualAttribute.VirtualAttributeManager;

import java.io.BufferedReader;
import java.io.InputStreamReader;
import java.math.BigDecimal;
import java.nio.charset.StandardCharsets;
import java.time.LocalDateTime;

public class RefEvalMain {
    public static void main(String[] args) throws Exception {
        VirtualAttributeManager mgr = new VirtualAttributeManager();
        ObjectMapper om = new ObjectMapper();
        BufferedReader in = new BufferedReader(
                new InputStreamReader(System.in, StandardCharsets.UTF_8));
        String line;
        while ((line = in.readLine()) != null) {
            if (line.isEmpty()) continue;
            JsonNode cell = om.readTree(line);
            String expr = cell.get("expr").asText();
            JsonNode row = cell.get("row");
            String out;
            try {
                Object r = mgr.calculateVirtualAttribute(expr, row);
                if (r == null) out = "NULL";
                else if (r instanceof Boolean) out = "BOOL:" + r;
                else if (r instanceof BigDecimal) out = "DEC:" + ((BigDecimal) r).toPlainString();
                else if (r instanceof DateTimeResult) out = "DTR:" + r.toString();
                else if (r instanceof LocalDateTime) out = "LDT:" + r.toString();
                else if (r instanceof String) out = "STR:" + r;
                else if (r instanceof Number) out = "NUM:" + r;
                else out = "OBJ:" + r.getClass().getSimpleName() + ":" + r;
            } catch (Throwable t) {
                out = "THROW:" + t.getClass().getSimpleName();
            }
            System.out.println(om.writeValueAsString(out));
        }
    }
}
