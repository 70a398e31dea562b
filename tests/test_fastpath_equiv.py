"""Fast path ≡ slow path: the Arrow/re2 fast path plus fallback must produce
frame-identical results to the pure slow path on every corpus we have."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from sparklog import fixtures
from sparklog.grammar import (
    ParseConfig,
    _parse_rfc3164_slow,
    _parse_rfc5424_slow,
    detect_rfc,
    parse_rfc3164,
    parse_rfc5424,
)
from tests.test_differential import lines_3164, lines_5424, texts

CFG = ParseConfig(default_year=2025)


def _assert_same(raw: pd.Series):
    for fast_fn, slow_fn in ((parse_rfc3164, _parse_rfc3164_slow),
                             (parse_rfc5424, _parse_rfc5424_slow)):
        got = fast_fn(raw, CFG)
        want = slow_fn(raw, CFG)
        for c in got.columns:
            g, w = got[c], want[c]
            if c == "ts":
                pd.testing.assert_series_equal(g, w, check_names=False)
            else:
                gn = g.where(~g.isna(), None).tolist()
                wn = w.where(~w.isna(), None).tolist()
                assert gn == wn, (c, raw.tolist(), gn, wn)


def test_synth_corpus_equivalence():
    pdf = fixtures.synth_lines(5000, seed=11, error_rate=0.1)
    _assert_same(pdf["raw"].reset_index(drop=True))


def test_goldens_equivalence():
    raws = pd.Series([c["raw"] for c in fixtures.GOLDEN_VALID
                      if not c["cfg"]]
                     + [c["raw"] for c in fixtures.GOLDEN_ERRORS])
    _assert_same(raws)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.one_of(lines_3164(), lines_5424(), texts),
                min_size=1, max_size=30))
def test_hypothesis_equivalence(batch):
    _assert_same(pd.Series(batch))


def test_index_preserved():
    """Masked subsets (non-default index) must round-trip through the
    fast/slow merge with their original index."""
    pdf = fixtures.synth_lines(500, seed=2)
    raw = pdf["raw"]
    rfc = detect_rfc(raw)
    sub = raw[rfc == 1]
    out = parse_rfc3164(sub, CFG)
    assert (out.index == sub.index).all()
