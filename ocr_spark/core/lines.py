"""Raw-offset-preserving line utilities.

Span bookkeeping must reference the RAW text (SURVEY.md §7 hard part
(a)), so we never ``splitlines()`` and lose offsets — every line carries
its ``(start, end)`` character span into the original payload. The ends
exclude the line terminator; CR of a CRLF pair is excluded from the
line body but accounted for in offset math.
"""

from __future__ import annotations

from typing import NamedTuple


class Line(NamedTuple):
    text: str   # line body, no terminator, no trailing CR
    start: int  # char offset of line start in raw text
    end: int    # char offset one past line body (excludes \r and \n)


def split_lines_with_spans(raw: str) -> list[Line]:
    """Split on \\n / \\r\\n / \\r, keeping raw char spans per line."""
    lines: list[Line] = []
    i, n = 0, len(raw)
    while i <= n:
        j = i
        while j < n and raw[j] not in ("\n", "\r"):
            j += 1
        lines.append(Line(raw[i:j], i, j))
        if j >= n:
            break
        # consume terminator: \r\n counts as one
        if raw[j] == "\r" and j + 1 < n and raw[j + 1] == "\n":
            i = j + 2
        else:
            i = j + 1
    return lines
