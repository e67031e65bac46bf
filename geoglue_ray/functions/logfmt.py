"""logfmt metrics emission (``util.py:76-93`` ``logfmt_escape``;
``cli.py:296-305`` begin/end/elapsed lines).

The engine's per-stage metrics are logfmt lines — machine-parseable,
greppable, append-only — written alongside partition manifests.
"""

from __future__ import annotations

from typing import Any

_NEEDS_QUOTE = set(' "=')


def logfmt_escape(value: str) -> str:
    """Quote/escape a value for logfmt when needed (``util.py:76-93``)."""
    if any(ch in _NEEDS_QUOTE for ch in value) or value == "":
        return '"' + value.replace("\\", "\\\\").replace('"', '\\"') + '"'
    return value


def logfmt_line(**fields: Any) -> str:
    parts = []
    for k, v in fields.items():
        if isinstance(v, bool):
            v = "true" if v else "false"
        elif isinstance(v, float):
            v = f"{v:.6f}".rstrip("0").rstrip(".")
        parts.append(f"{k}={logfmt_escape(str(v))}")
    return " ".join(parts)


def parse_logfmt(line: str) -> dict[str, str]:
    """Inverse of :func:`logfmt_line` (round-trip tested)."""
    out: dict[str, str] = {}
    i, n = 0, len(line)
    while i < n:
        while i < n and line[i] == " ":
            i += 1
        eq = line.find("=", i)
        if eq < 0:
            break
        key = line[i:eq]
        i = eq + 1
        if i < n and line[i] == '"':
            i += 1
            buf = []
            while i < n and line[i] != '"':
                if line[i] == "\\" and i + 1 < n:
                    i += 1
                buf.append(line[i])
                i += 1
            i += 1
            out[key] = "".join(buf)
        else:
            j = line.find(" ", i)
            j = n if j < 0 else j
            out[key] = line[i:j]
            i = j
    return out
