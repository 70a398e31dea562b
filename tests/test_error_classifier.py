"""The Arrow error pre-classifier must agree with the pandas slow path on
error-heavy and adversarial corpora (parse_batch_arrow vs
parse_syslog_frame compared column-by-column)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from sparklog import fixtures
from sparklog.grammar import _OUTPUT_COLUMNS, ParseConfig, detect_rfc_arrow
from sparklog.udfs import parse_batch_arrow, parse_syslog_frame

CFG = ParseConfig(default_year=2025)


def _compare(rows):
    arr = pa.array(rows, pa.string())
    rfc = detect_rfc_arrow(arr)
    out = parse_batch_arrow(arr, rfc, CFG)
    ref = parse_syslog_frame(pd.Series(rows), pd.Series(rfc), CFG)
    for c in _OUTPUT_COLUMNS:
        got = out[c].to_pandas()
        want = ref[c]
        if c == "ts":
            same = (got.isna() & want.isna()) | (got == want)
        else:
            g = got.astype(object).where(got.notna(), None)
            w = pd.Series(want).astype(object).where(
                pd.Series(want).notna(), None)
            same = pd.Series([a == b for a, b in zip(g, w)])
        assert same.all(), (
            c, [rows[i] for i in np.flatnonzero(~same.to_numpy())[:3]])


def test_error_corpus():
    rows = ([c["raw"] for c in fixtures.GOLDEN_ERRORS] * 3
            + ["", "<", "<>", "<77", "<1233>", "<7a8>x", "7>x",
               "<34>", "<34>x", "<34>Foo 11 22:14:15 h t: x",
               "<34> Oct 11 22:14:15 h t: x",     # leading space variant
               "<34>  Oct 11 22:14:15 h t: x",    # double space
               "<165>1", "<165>1 ", "<165>1 2", "<165>1 20x3-",
               "<165>1 +123-10-11T22:14:15Z h a - - - m",  # signed year
               "<165>1 - h a - - - m",            # NIL ts
               "<12345678>9 x", "x" * 12, "short"])
    _compare(rows)


def test_error_heavy_synthetic():
    pdf = fixtures.synth_lines(8000, seed=77, error_rate=0.9)
    _compare(pdf["raw"].tolist())


def test_mixed_synthetic():
    pdf = fixtures.synth_lines(8000, seed=78, error_rate=0.05)
    _compare(pdf["raw"].tolist())


@pytest.mark.parametrize("seed", [1, 2])
def test_adversarial_fuzz(seed):
    import random

    rng = random.Random(seed)
    alph = "<>[]:. -0123456789abcZT+\""
    rows = ["".join(rng.choice(alph) for _ in range(rng.randint(0, 40)))
            for _ in range(4000)]
    _compare(rows)
