"""Independent scalar (per-string, cursor-based) oracle of the syslog
grammar, used ONLY by differential tests to cross-check the vectorized
masked-column implementation in sparklog.grammar.

Written directly from the grammar spec (SURVEY.md §2.A, with reference
citations there); structured as explicit cursor scans so that bugs in the
vectorized masking logic cannot be mirrored here.  Graceful-panic semantics
follow sparklog.grammar's documented divergences.
"""

from __future__ import annotations

import datetime as dt

from sparklog.grammar import (
    E_DAY_INVALID,
    E_EOL,
    E_INVALID_APP_NAME,
    E_INVALID_MSG_ID,
    E_INVALID_PROC_ID,
    E_INVALID_TIME_FORMAT,
    E_MONTH_INVALID,
    E_NO_STRUCTURED_DATA,
    E_PRIORITY_EMPTY,
    E_PRIORITY_NO_END,
    E_PRIORITY_NO_START,
    E_PRIORITY_NON_DIGIT,
    E_PRIORITY_TOO_LONG,
    E_PRIORITY_TOO_SHORT,
    E_TIMESTAMP_UNKNOWN_FORMAT,
    E_VERSION_NOT_FOUND,
    E_YEAR_INVALID,
    MAX_PACKET_LEN_3164,
    MAX_PACKET_LEN_5424,
    RFC_3164,
    RFC_5424,
    RFC_UNKNOWN,
    ParseConfig,
)

_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep",
           "Oct", "Nov", "Dec"]
_DAYS_LEAP = [31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def _is_digit(c: str) -> bool:
    return "0" <= c <= "9"


def _atoi(s: str):
    if not s:
        return None
    body = s[1:] if s[0] in "+-" else s
    if not body or not all(_is_digit(c) for c in body):
        return None
    return int(s)


def _scan_priority(s: str, l: int):
    """-> (priority, cursor, err)"""
    if l <= 0:
        return None, 0, E_PRIORITY_EMPTY
    if s[0] != "<":
        return None, 0, E_PRIORITY_NO_START
    i, val = 1, 0
    while i < l:
        if i >= 5:
            return None, i, E_PRIORITY_TOO_LONG
        c = s[i]
        if c == ">":
            if i == 1:
                return None, i, E_PRIORITY_TOO_SHORT
            return val, i + 1, None
        if not _is_digit(c):
            return None, i, E_PRIORITY_NON_DIGIT
        val = val * 10 + int(c)
        i += 1
    return None, i, E_PRIORITY_NO_END


def _err_row(err: str) -> dict:
    return {"parse_error": err}


def parse_rfc3164_scalar(raw: str, cfg: ParseConfig = ParseConfig()) -> dict:
    s = raw[:MAX_PACKET_LEN_3164]
    l = len(s)
    cur = 0
    if cfg.priority is not None:
        pri = cfg.priority
    else:
        pri, cur, err = _scan_priority(s, l)
        if err:
            return _err_row(err)

    if cur < l and s[cur] == " ":
        cur += 1

    # timestamp: the two default layouts == month + space-run + 1-2 digit
    # day + space-run + HH:MM:SS, consuming exactly 15 chars
    if cfg.ts_format is not None:
        fmt_len = cfg.ts_format_len or len(cfg.ts_format)
        sub = s[cur:cur + fmt_len]
        try:
            wall = dt.datetime.strptime(sub, cfg.ts_format)
        except ValueError:
            return _err_row(E_TIMESTAMP_UNKNOWN_FORMAT)
        if "%Y" not in cfg.ts_format:
            wall = _rebase(wall, cfg.default_year)
        cur += fmt_len
    else:
        sub = s[cur:cur + 15]
        wall = _parse_ts_3164(sub, cfg.default_year)
        if wall is None:
            return _err_row(E_TIMESTAMP_UNKNOWN_FORMAT)
        cur += 15
    if cur < l and s[cur] == " ":
        cur += 1

    if cfg.hostname:
        host = cfg.hostname
    else:
        j = cur
        while j < l and s[j] != " ":
            j += 1
        host = s[cur:j]
        cur = j

    if cur < l and s[cur] == " ":
        cur += 1

    if cfg.tag:
        tag = cfg.tag
    else:
        prev = cur
        to = min(l, cur + 32)
        chars: list[str] = []
        enough = False
        while cur < to:
            b = s[cur]
            if b == " ":
                cur += 1
                break
            if b in "[]:" or enough:
                enough = True
                cur += 1
                continue
            chars.append(b)
            cur += 1
        tag = "".join(chars)
        if not tag:
            cur = prev

    content = s[cur:l].strip(" ")
    utc, off = _to_utc(wall, cfg.location)
    return {
        "priority": pri, "facility": pri // 8, "severity": pri % 8,
        "ts": utc, "tz_offset_minutes": off,
        "hostname": host, "tag": tag, "content": content,
        "parse_error": None,
    }


def _parse_ts_3164(sub: str, year: int):
    if len(sub) != 15 or sub[:3] not in _MONTHS:
        return None
    month = _MONTHS.index(sub[:3]) + 1
    rest = sub[3:]
    # space-run, day digits, space-run, then exactly HH:MM:SS
    i = 0
    while i < len(rest) and rest[i] == " ":
        i += 1
    if i == 0:
        return None
    j = i
    while j < len(rest) and _is_digit(rest[j]):
        j += 1
    if not 1 <= j - i <= 2:
        return None
    day = int(rest[i:j])
    k = j
    while k < len(rest) and rest[k] == " ":
        k += 1
    if k == j:
        return None
    hms = rest[k:]
    if len(hms) != 8 or hms[2] != ":" or hms[5] != ":":
        return None
    if not all(_is_digit(c) for c in hms[0:2] + hms[3:5] + hms[6:8]):
        return None
    hh, mm, ss = int(hms[0:2]), int(hms[3:5]), int(hms[6:8])
    if not (1 <= day <= _DAYS_LEAP[month - 1] and hh <= 23 and mm <= 59
            and ss <= 59):
        return None
    base = dt.datetime(year, month, 1, 0, 0, 0)
    return base + dt.timedelta(days=day - 1, hours=hh, minutes=mm,
                               seconds=ss)


def _rebase(wall: dt.datetime, year: int) -> dt.datetime:
    base = dt.datetime(year, wall.month, 1)
    return base + dt.timedelta(days=wall.day - 1, hours=wall.hour,
                               minutes=wall.minute, seconds=wall.second,
                               microseconds=wall.microsecond)


def _to_utc(wall: dt.datetime, location: str):
    if location in ("UTC", "utc", None):
        return wall, 0
    import zoneinfo
    tz = zoneinfo.ZoneInfo(location)
    local = wall.replace(tzinfo=tz)
    off = local.utcoffset()
    return (local.astimezone(dt.timezone.utc).replace(tzinfo=None),
            int(off.total_seconds() // 60))


def parse_rfc5424_scalar(raw: str, cfg: ParseConfig = ParseConfig()) -> dict:
    s = raw[:MAX_PACKET_LEN_5424]
    l = len(s)
    cur = 0
    if cfg.priority is not None:
        pri = cfg.priority
    else:
        pri, cur, err = _scan_priority(s, l)
        if err:
            return _err_row(err)

    if cur >= l:
        return _err_row(E_VERSION_NOT_FOUND)
    version = int(s[cur]) if _is_digit(s[cur]) else -1
    cur += 1
    cur += 1  # unvalidated separator skip

    ts = None
    off = None
    ts_is_nil = False
    if cur < l and s[cur] == "-":
        ts_is_nil = True
        cur += 2  # NILVALUE + unvalidated skip
    else:
        r = s[cur:]
        if len(r) < 4:
            return _err_row(E_EOL)
        year = _atoi(r[0:4])
        if year is None:
            return _err_row(E_YEAR_INVALID)
        if len(r) < 5 or r[4] != "-":
            return _err_row(E_TIMESTAMP_UNKNOWN_FORMAT)
        if len(r) < 7:
            return _err_row(E_EOL)
        month = _atoi(r[5:7])
        if month is None or not 1 <= month <= 12:
            return _err_row(E_MONTH_INVALID)
        if len(r) < 8 or r[7] != "-":
            return _err_row(E_TIMESTAMP_UNKNOWN_FORMAT)
        if len(r) < 10:
            return _err_row(E_EOL)
        day = _atoi(r[8:10])
        if day is None or not 1 <= day <= 31:
            return _err_row(E_DAY_INVALID)
        if len(r) < 11 or r[10] != "T":
            return _err_row(E_INVALID_TIME_FORMAT)
        hh = _atoi(r[11:13]) if len(r) >= 13 else None
        mi = _atoi(r[14:16]) if len(r) >= 16 else None
        se = _atoi(r[17:19]) if len(r) >= 19 else None
        if (hh is None or not 0 <= hh <= 23 or len(r) < 14 or r[13] != ":"
                or mi is None or not 0 <= mi <= 59 or len(r) < 17
                or r[16] != ":" or se is None or not 0 <= se <= 59):
            return _err_row(E_TIMESTAMP_UNKNOWN_FORMAT)
        pos = 19
        micros = 0
        if len(r) > 19 and r[19] == ".":
            pos = 20
            k = 20
            while k < min(len(r), 26) and _is_digit(r[k]):
                k += 1
            nd = k - 20
            if nd > 0:
                micros = int(r[20:k]) * 10 ** (6 - nd)
                pos = k
        if pos >= len(r):
            return _err_row(E_TIMESTAMP_UNKNOWN_FORMAT)
        if r[pos] == "Z":
            off = 0
            pos += 1
        else:
            sign = r[pos]
            if sign not in "+-":
                return _err_row(E_TIMESTAMP_UNKNOWN_FORMAT)
            oh = _atoi(r[pos + 1:pos + 3]) if len(r) >= pos + 3 else None
            om = _atoi(r[pos + 4:pos + 6]) if len(r) >= pos + 6 else None
            if (oh is None or not 0 <= oh <= 23 or len(r) < pos + 4
                    or r[pos + 3] != ":" or om is None
                    or not 0 <= om <= 59):
                return _err_row(E_TIMESTAMP_UNKNOWN_FORMAT)
            off = (1 if sign == "+" else -1) * (oh * 60 + om)
            pos += 6
        try:
            wall = (dt.datetime(year, month, 1, 0, 0, 0)
                    + dt.timedelta(days=day - 1, hours=hh, minutes=mi,
                                   seconds=se, microseconds=micros))
            ts = wall - dt.timedelta(minutes=off)
        except ValueError:
            ts = None  # out-of-range year: field kept null
        cur += pos + 1  # + unvalidated separator skip

    if cfg.hostname:
        host = cfg.hostname
    else:
        j = cur
        while j < l and s[j] != " ":
            j += 1
        host = s[cur:j] if cur < l else ""
        cur = j + 1

    def up_to(max_len: int, code: str):
        nonlocal cur
        j = cur
        found = False
        while j < min(cur + max_len, l):
            if s[j] == " ":
                found = True
                break
            j += 1
        if not found:
            return None, code
        val = s[cur:j]
        cur = j + 1  # separator skip by header
        return val, None

    app, err = up_to(48, E_INVALID_APP_NAME)
    if err:
        return _err_row(err)
    proc, err = up_to(128, E_INVALID_PROC_ID)
    if err:
        return _err_row(err)
    msgid, err = up_to(32, E_INVALID_MSG_ID)
    if err:
        return _err_row(err)

    if cur >= l:
        return _err_row(E_NO_STRUCTURED_DATA)
    if s[cur] == "-":
        sd = "-"
        cur += 2
    elif s[cur] == "[":
        j = cur
        end = None
        while j < l:
            if s[j] == "]" and (j + 1 == l or s[j + 1] == " "):
                end = j + 1
                break
            j += 1
        if end is None:
            return _err_row(E_NO_STRUCTURED_DATA)
        sd = s[cur:end]
        cur = end + 1
    else:
        return _err_row(E_NO_STRUCTURED_DATA)

    message = s[cur:l].strip(" ") if cur < l else ""
    return {
        "priority": pri, "facility": pri // 8, "severity": pri % 8,
        "version": version, "ts": ts, "tz_offset_minutes": off,
        "ts_is_nil": ts_is_nil, "hostname": host, "app_name": app,
        "proc_id": proc, "msg_id": msgid, "structured_data": sd,
        "message": message, "parse_error": None,
    }


def detect_scalar(raw: str) -> int:
    head = raw[:10]
    p = head.find(">")
    if p == -1:
        return RFC_5424 if len(raw) >= 10 else RFC_UNKNOWN
    if p >= 9 or p + 1 >= len(raw):
        return RFC_UNKNOWN
    return RFC_5424 if _is_digit(raw[p + 1]) else RFC_3164
