"""Declared analytical queries — the engine's query surface.

Each module contributes:
    QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
    ORACLE:  dict[str, str]   # DuckDB SQL equivalents (omit → rows-only check)

Ordering matters: the driver's CORRECTNESS verify covers the FIRST 50
entries of the merged dict (insertion order).  Rounds 1-2 verified
q1-q19 / p0-p26 / w1-w4 (all green); l1-l23, s1-s5, g1 and p27 have
never had a driver row.  ``_WINDOW`` therefore front-loads the
never-verified queries plus the pipeline queries whose implementation
changed this round; the twice-green remainder rotates behind them.
"""

from zg_etl_spark.plans import gate_queries, llm, pipeline, relational, streaming_queries

# First-50 priority: 23 llm + 5 streaming + g1 + p27 = 30 never-verified,
# then 20 pipeline/writer queries (changed this round or identity-critical).
_WINDOW = [
    *llm.QUERIES,
    *streaming_queries.QUERIES,
    *gate_queries.QUERIES,
    "p27_user_profile",
    "p1_gate_errors",
    "p26_error_details",
    "p4_dictionaries",
    "p17_user_prop_dict",
    "p5_virtual_attrs",
    "p6_virtual_events",
    "p7_enrichment",
    "p8_wide_table",
    "p0_envelope",
    "p2_identity_mappings",
    "p3_zgid_binding",
    "p9_user_properties",
    "p10_b_user_upsert",
    "p11_b_device_upsert",
    "p12_id_archive",
    "w1_upsert_writer",
    "p23_ad_conversion",
    "p24_app_first_seen",
    "p28_gate_business",
    "p29_event_resolution",
]

_MODULES = (llm, streaming_queries, gate_queries, pipeline, relational)


def _ordered(attr):
    merged = {}
    for m in _MODULES:
        merged.update(getattr(m, attr))
    out = {k: merged[k] for k in _WINDOW if k in merged}
    out.update({k: v for k, v in merged.items() if k not in out})
    return out


def all_queries():
    return _ordered("QUERIES")


def all_oracles():
    return _ordered("ORACLE")
