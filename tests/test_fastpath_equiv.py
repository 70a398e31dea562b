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


def test_multibyte_sd_field_does_not_poison_batch():
    """Regression (ADVICE r2): a multi-byte UTF-8 char at bytes 1-2 of the
    SD/MSG field used to make the eager byte-based nil_msg slice produce an
    invalid-UTF-8 view, crashing the WHOLE batch (all 100 sibling rows) in
    utf8_trim.  Fast and slow paths must agree on these rows inside a large
    otherwise-clean batch."""
    hdr = "<165>1 2003-10-11T22:14:15.003Z host app proc msgid "
    poison = [hdr + "-é tail",            # 'é' spans bytes 1-2 of SD
              hdr + "[é x=\"1\"] m",      # inside an SD block
              hdr + "€msg",               # '€' at byte 0 (no match)
              hdr + "-€"]                 # '€' right after NILVALUE
    clean = [hdr + f"- row {i}" for i in range(100)]
    _assert_same(pd.Series(poison + clean))


def test_null_and_all_null_inputs():
    """Regression (ADVICE r2): all-null arrays made _clamp call
    .as_py() on a null max (TypeError); null rows must simply fall out as
    DetectFailed-style misses, identical to the slow path."""
    _assert_same(pd.Series([None, None], dtype=object))
    _assert_same(pd.Series([None, "<34>Oct 11 22:14:15 h t: x", None],
                           dtype=object))


def test_index_preserved():
    """Masked subsets (non-default index) must round-trip through the
    fast/slow merge with their original index."""
    pdf = fixtures.synth_lines(500, seed=2)
    raw = pdf["raw"]
    rfc = detect_rfc(raw)
    sub = raw[rfc == 1]
    out = parse_rfc3164(sub, CFG)
    assert (out.index == sub.index).all()
