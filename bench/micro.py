"""Micro-benchmarks mirroring the reference's published table
(README.md:113-142 of jeromer/syslogparser): per-message cost of detect and
the full parses, on the reference's own benchmark inputs, single core.

The reference's numbers are ns/op for a hand-rolled Go byte scanner; ours
include the full vectorized batch machinery, so the fair comparison is
amortized per-row cost at realistic batch sizes.

Usage: python bench/micro.py [batch_size]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

# the exact benchmark inputs the reference uses
MSG_DETECT = "<165>1 2003-10-11T22:14:15.003Z ..."          # 14.7 ns/op
MSG_3164 = ("<34>Oct 11 22:14:15 mymachine su: 'su root' failed for "
            "lonvick on /dev/pts/8")                         # 838 ns/op
MSG_5424 = ('<165>1 2003-10-11T22:14:15.003Z mymachine.example.com '
            'evntslog - ID47 [exampleSDID@32473 iut="3" '
            'eventSource="Application" eventID="1011"] An application '
            'event log entry...')                            # 1306 ns/op

REFERENCE_NS = {"detect": 14.7, "parse_3164": 838.0, "parse_5424": 1306.0}


def bench(fn, series, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(series)
        best = min(best, time.perf_counter() - t0)
    return best / len(series) * 1e9  # ns per row


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    import pyarrow as pa

    from sparklog.grammar import (
        ParseConfig,
        detect_rfc,
        detect_rfc_arrow,
        parse_rfc3164,
        parse_rfc5424,
    )
    from sparklog.udfs import parse_batch_arrow

    cfg = ParseConfig()
    out = {}

    # headline: the engine hot path — Arrow batch in, Arrow columns out,
    # exactly what runs inside mapInArrow per batch on the cluster
    for name, msg in (("parse_3164", MSG_3164), ("parse_5424", MSG_5424)):
        arr = pa.array([msg] * n, pa.string())
        rfc = detect_rfc_arrow(arr)
        parse_batch_arrow(arr, rfc, cfg)  # warm
        ns = bench(lambda a: parse_batch_arrow(a, rfc, cfg), arr)
        out[name] = {
            "ns_per_row": round(ns, 1),
            "reference_ns": REFERENCE_NS[name],
            "ratio_vs_go": round(ns / REFERENCE_NS[name], 2),
            "rows_per_sec_per_core": round(1e9 / ns),
        }

    # the detect kernel as the engine runs it: Arrow batch in (inside
    # mapInArrow the batch is already Arrow — no conversion cost)
    arr_d = pa.array([MSG_DETECT] * n, pa.string())
    detect_rfc_arrow(arr_d)  # warm
    ns = bench(detect_rfc_arrow, arr_d)
    out["detect_arrow"] = {
        "ns_per_row": round(ns, 1),
        "reference_ns": REFERENCE_NS["detect"],
        "ratio_vs_go": round(ns / REFERENCE_NS["detect"], 2),
    }

    # secondary: detection kernel + the pandas-Series API wrapper (pays an
    # object-array conversion the Spark path never does)
    for name, fn, msg in (("detect", detect_rfc, MSG_DETECT),
                          ("pandas_api_3164", parse_rfc3164, MSG_3164),
                          ("pandas_api_5424", parse_rfc5424, MSG_5424)):
        s = pd.Series([msg] * n)
        fn(s)  # warm
        ns = bench(fn, s)
        ref = REFERENCE_NS.get(name.replace("pandas_api", "parse"))
        out[name] = {"ns_per_row": round(ns, 1)}
        if ref:
            out[name]["ratio_vs_go"] = round(ns / ref, 2)
    print(json.dumps({"batch_size": n, "ops": out}))


if __name__ == "__main__":
    main()
