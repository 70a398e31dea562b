"""Property-based differential tests: the vectorized masked-column grammar
must agree with the independent scalar cursor oracle on every input —
structured generators for near-valid lines plus raw ASCII fuzz."""

import datetime as dt

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from sparklog.grammar import (
    ParseConfig,
    detect_rfc,
    parse_rfc3164,
    parse_rfc5424,
)
from tests.oracle_scalar import (
    detect_scalar,
    parse_rfc3164_scalar,
    parse_rfc5424_scalar,
)

CFG = ParseConfig(default_year=2025)

_PD_MIN = dt.datetime(1678, 1, 1)
_PD_MAX = dt.datetime(2261, 12, 31)

months = st.sampled_from(
    ["Jan", "Feb", "Oct", "Dec", "Foo", "jan", "OCT", "Ja"])
small = st.integers(min_value=0, max_value=99)
texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40)


@st.composite
def lines_3164(draw):
    pri = draw(st.sampled_from(
        ["<34>", "<0>", "<999>", "<1000>", "<>", "<1a>", "7>", "", "<191>"]))
    mon = draw(months)
    day = draw(st.sampled_from(["01", " 1", "11", "31", "32", "00", "9",
                                "1  "]))
    h, m, s = draw(small), draw(small), draw(small)
    host = draw(st.sampled_from(["mymachine", "a", "", "127.0.0.1"]))
    tag = draw(st.sampled_from(
        ["su:", "apache2[10]:", "x" * 40, "a[b]c", ":", "t", ""]))
    body = draw(texts)
    sep = draw(st.sampled_from([" ", "  ", ""]))
    return f"{pri}{mon} {day} {h:02d}:{m:02d}:{s:02d}{sep}{host} {tag} {body}"


@st.composite
def lines_5424(draw):
    pri = draw(st.sampled_from(["<165>", "<0>", "<>", "<1234>", ""]))
    ver = draw(st.sampled_from(["1", "2", "x", ""]))
    ts = draw(st.sampled_from([
        "-", "2003-10-11T22:14:15.003Z", "2003-10-11T22:14:15Z",
        "1985-04-12T19:20:50.52-04:00", "2003-13-11T22:14:15Z",
        "2003-10-32T22:14:15Z", "20x3-10-11T22:14:15Z",
        "2003-10-11x22:14:15Z", "2003-10-11T24:14:15Z",
        "2003-10-11T22:14:15.0000003Z", "2003-10-11T22:14:15.Z",
        "2003-10-11T22:14:15.003+23:59", "2003-10-11T22:14:15.003+24:00",
        "0000-01-01T00:00:00Z", "0123-10-11T22:14:15Z",
        "2003-10-11T22:14:15", "2003-10-11T22:14",
    ]))
    host = draw(st.sampled_from(["-", "host1", ""]))
    app = draw(st.sampled_from(["-", "su", "s" * 48, "s" * 49]))
    proc = draw(st.sampled_from(["-", "123", "p" * 128]))
    msgid = draw(st.sampled_from(["-", "ID47", "m" * 33]))
    sd = draw(st.sampled_from(
        ["-", '[a@1 k="v"]', '[a@1][b@2]', '[a@1] [b@2]', "[unterminated",
         "nosd", '[a@1 k="] inside"]']))
    body = draw(texts)
    return f"{pri}{ver} {ts} {host} {app} {proc} {msgid} {sd} {body}"


def _cmp(row: pd.Series, want: dict, raw: str):
    if want["parse_error"] is not None:
        assert row["parse_error"] == want["parse_error"], (
            raw, row["parse_error"], want["parse_error"])
        return
    assert row["parse_error"] is None, (raw, row["parse_error"])
    for k, v in want.items():
        if k in ("parse_error", "ts"):
            continue
        got = row[k]
        if v is None:
            assert got is None or pd.isna(got), (raw, k, got)
        else:
            assert got == v, (raw, k, got, v)
    vts = want.get("ts")
    gts = row["ts"]
    if vts is None:
        assert pd.isna(gts), (raw, gts)
    elif not (_PD_MIN <= vts <= _PD_MAX):
        assert pd.isna(gts), (raw, "out-of-range ts should be null", gts)
    else:
        assert gts == pd.Timestamp(vts), (raw, gts, vts)


@settings(max_examples=400, deadline=None)
@given(st.lists(lines_3164(), min_size=1, max_size=20))
def test_diff_3164_structured(batch):
    out = parse_rfc3164(pd.Series(batch), CFG)
    for i, raw in enumerate(batch):
        _cmp(out.iloc[i], parse_rfc3164_scalar(raw, CFG), raw)


@settings(max_examples=400, deadline=None)
@given(st.lists(lines_5424(), min_size=1, max_size=20))
def test_diff_5424_structured(batch):
    out = parse_rfc5424(pd.Series(batch), CFG)
    for i, raw in enumerate(batch):
        _cmp(out.iloc[i], parse_rfc5424_scalar(raw, CFG), raw)


@settings(max_examples=300, deadline=None)
@given(st.lists(texts, min_size=1, max_size=30))
def test_diff_fuzz_ascii(batch):
    s = pd.Series(batch)
    o3 = parse_rfc3164(s, CFG)
    o5 = parse_rfc5424(s, CFG)
    d = detect_rfc(s)
    for i, raw in enumerate(batch):
        _cmp(o3.iloc[i], parse_rfc3164_scalar(raw, CFG), raw)
        _cmp(o5.iloc[i], parse_rfc5424_scalar(raw, CFG), raw)
        assert d.iloc[i] == detect_scalar(raw), raw


@settings(max_examples=100, deadline=None)
@given(st.lists(lines_3164(), min_size=1, max_size=8),
       st.sampled_from(["America/New_York", "Asia/Tokyo"]))
def test_diff_3164_location(batch, tz):
    cfg = ParseConfig(default_year=2025, location=tz)
    out = parse_rfc3164(pd.Series(batch), cfg)
    for i, raw in enumerate(batch):
        _cmp(out.iloc[i], parse_rfc3164_scalar(raw, cfg), raw)
