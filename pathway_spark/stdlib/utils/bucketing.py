"""Time-bucketing helpers — reference `stdlib/utils/bucketing.py`."""

from __future__ import annotations

import datetime


def truncate_to_minutes(time: datetime.datetime) -> datetime.datetime:
    """Drop seconds + microseconds (bucketing.py:8)."""
    return time - datetime.timedelta(seconds=time.second,
                                     microseconds=time.microsecond)
