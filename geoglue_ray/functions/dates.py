"""Scalar date/string helpers (``util.py:238-242`` ``zero_padded_intrange``;
``cds.py:64-86`` timezone-offset parsing)."""

from __future__ import annotations


def zero_padded_intrange(start: int, end: int, inclusive: bool = True) -> list[str]:
    """``zero_padded_intrange(1, 12) -> ['01', ..., '12']`` (``util.py:238-242``)."""
    assert end > start, "End of range must be higher than start of range"
    vals = range(start, end + 1) if inclusive else range(start, end)
    n = len(str(end + 1)) if inclusive else len(str(end))
    return [f"{i:0{n}d}" for i in vals]


def get_timezone_offset_hours(tz: str) -> int | None:
    """``"+05:00" -> 5``; fractional offsets -> None (``cds.py:64-86``)."""
    sign = 1 if tz[0] == "+" else -1
    hh, mm = int(tz[1:3]), int(tz[4:6])
    if mm != 0:
        return None
    return sign * hh
