"""ADVICE r7 (medium): the driver's correctness gate caps at the FIRST
50 registry entries, so the six long-green queries rotated to the tail
(pivot_event_type_counts, setop_premium_only_customers,
syslog_token_roundtrip, sort_limit_top_lineitems, string_funcs_showcase,
datetime_funcs_showcase) are no longer checked by any driver run — a
regression in them would merge silently.  This test re-runs each tail
query against its DuckDB oracle at sf0.001 on every pytest run, using
the same compare machinery as tools/check_parity.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

TAIL = [
    "pivot_event_type_counts",
    "setop_premium_only_customers",
    "syslog_token_roundtrip",
    "sort_limit_top_lineitems",
    "string_funcs_showcase",
    "datetime_funcs_showcase",
]


def test_tail_is_exactly_the_entries_past_the_gate_window():
    """If the registry is reordered, this pins which queries fall outside
    the driver's 50-entry window so TAIL (and the registry comment) must
    be updated in the same change."""
    from sparklog.queries import REGISTRY

    assert list(REGISTRY)[50:] == TAIL


def test_tail_queries_match_their_oracles(spark):
    from sparklog.queries import REGISTRY, release_caches
    from tools.check_parity import compare, duck_conn

    con = duck_conn(SF)
    failures = []
    for name in TAIL:
        fn, sql = REGISTRY[name]
        sdf = fn(spark, SF).toPandas()
        release_caches()
        if callable(sql):   # corpus-dependent builder (sf_dir -> sql)
            sql = sql(SF)
        odf = con.execute(sql).df()
        issues = compare(name, sdf, odf)
        if issues:
            failures.append(f"{name}: {issues[0]}")
    assert not failures, failures
