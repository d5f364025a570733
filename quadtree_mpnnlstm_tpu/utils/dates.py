"""Datetime helpers (parity: ref model/utils.py:75-79, mpnnlstm.py:389-400)."""

from __future__ import annotations

import datetime

NS_PER_DAY = 8.64e13  # ref: mpnnlstm.py:396


def int_to_datetime(x) -> datetime.datetime:
    """Nanoseconds-since-epoch integer → datetime (ref: utils.py:75-76)."""
    return datetime.datetime.fromtimestamp(float(x) / 1e9)


def round_to_day(dt: datetime.datetime) -> datetime.datetime:
    return datetime.datetime(*dt.timetuple()[:3])


def day_of_year(launch_date_ns: int, step: int) -> int:
    """0-based day-of-year of launch_date + step days (ref: mpnnlstm.py:396)."""
    return int_to_datetime(launch_date_ns + NS_PER_DAY * step).timetuple().tm_yday - 1
