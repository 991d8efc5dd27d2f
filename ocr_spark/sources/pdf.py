"""Dependency-free PDF report sink — SURVEY S8, now fully in scope.

The reference renders per-transaction report rows into a styled PDF
client-side (``docOcrWeb/src/download.jsx:288-501``, jsPDF). This is
the data-plane twin: a minimal, deterministic PDF 1.4 writer built on
nothing but the public PDF spec (ISO 32000 §7: header, body of
numbered objects, cross-reference table with byte offsets, trailer).
No compression filters, no external fonts — one base-14 Courier font
object, uncompressed content streams — so the output is byte-stable
for a given input and trivially inspectable in tests.

Scale stance (same as the CSV report sink, sources/io.py): a report
is a HUMAN-scale artifact. ``write_pdf_report`` collects rows to the
driver and refuses above ``max_rows`` — it is the terminal sink of a
report-sized aggregate, never a table-scale output path (table-scale
output is parquet/JSONL, shard-per-partition).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# A4 in PDF points; Courier 8pt with 10pt leading inside 40pt margins
_PAGE_W, _PAGE_H = 595, 842
_MARGIN = 40
_FONT_SIZE = 8
_LEADING = 10
_LINES_PER_PAGE = (_PAGE_H - 2 * _MARGIN) // _LEADING  # 76
# Courier is monospaced at 600/1000 em: usable columns per line
_MAX_COLS = int((_PAGE_W - 2 * _MARGIN) / (_FONT_SIZE * 0.6))  # 107


def _pdf_escape(s: str) -> str:
    """PDF literal-string escaping: backslash, parens; characters
    outside latin-1 (the base-font encoding) degrade to '?' — the
    report sink trades glyph fidelity for zero font-embedding
    machinery, and the CSV/JSONL sinks carry the lossless bytes."""
    out = []
    for ch in s:
        if ch in "\\()":
            out.append("\\" + ch)
        elif "\x20" <= ch <= "\x7e" or "\xa0" <= ch <= "\xff":
            out.append(ch)
        else:
            out.append("?")
    return "".join(out)


def render_pdf(lines: list[str]) -> bytes:
    """Text lines → a complete single-font PDF 1.4 byte string.
    Lines longer than the page width are hard-wrapped; pages paginate
    at the leading grid. The xref table carries exact byte offsets of
    every object, so strict parsers (not just sequential scanners)
    accept the file."""
    wrapped: list[str] = []
    for ln in lines:
        ln = ln or " "
        while len(ln) > _MAX_COLS:
            wrapped.append(ln[:_MAX_COLS])
            ln = ln[_MAX_COLS:]
        wrapped.append(ln)
    pages = [
        wrapped[i : i + _LINES_PER_PAGE]
        for i in range(0, len(wrapped), _LINES_PER_PAGE)
    ] or [[" "]]

    objects: list[bytes] = []  # 1-indexed body objects, in order

    n_pages = len(pages)
    # object numbering: 1=catalog, 2=pages, 3=font,
    # then per page i: 4+2i = page, 5+2i = its content stream
    page_obj_nums = [4 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{n} 0 R" for n in page_obj_nums)
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode("latin-1")
    )
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>"
    )
    for i, page_lines in enumerate(pages):
        content_num = 5 + 2 * i
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R "
                f"/MediaBox [0 0 {_PAGE_W} {_PAGE_H}] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {content_num} 0 R >>"
            ).encode("latin-1")
        )
        y0 = _PAGE_H - _MARGIN - _FONT_SIZE
        body = [f"BT /F1 {_FONT_SIZE} Tf {_MARGIN} {y0} Td {_LEADING} TL"]
        for j, ln in enumerate(page_lines):
            if j:
                body.append("T*")
            body.append(f"({_pdf_escape(ln)}) Tj")
        body.append("ET")
        stream = "\n".join(body).encode("latin-1")
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]  # object 0 is the free head
    for num, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % num
        out += obj
        out += b"\nendobj\n"
    xref_pos = len(out)
    n_objs = len(objects) + 1
    out += b"xref\n0 %d\n" % n_objs
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (n_objs, xref_pos)
    )
    return bytes(out)


def _format_table(rows: list[dict], columns: list[str], col_width: int = 16) -> list[str]:
    """Fixed-width text table (Courier-aligned): header, rule, rows.
    Cells truncate at col_width with a trailing '…'-as-'~' marker."""
    def cell(v) -> str:
        s = "" if v is None else str(v)
        if len(s) > col_width:
            s = s[: col_width - 1] + "~"
        return s.ljust(col_width)

    lines = [" ".join(c[:col_width].ljust(col_width) for c in columns)]
    lines.append("-" * min(_MAX_COLS, (col_width + 1) * len(columns) - 1))
    for r in rows:
        lines.append(" ".join(cell(r.get(c)) for c in columns))
    return lines


def write_pdf_report(
    df: DataFrame,
    dest: str,
    columns: list[str] | None = None,
    order_by: str = "conv_id",
    title: str = "Transaction report",
    max_rows: int = 10_000,
) -> int:
    """Render a report-sized DataFrame as a paginated PDF at ``dest``
    (a local path — reports are driver-side artifacts, like the
    reference's browser download). Refuses inputs above ``max_rows``:
    this sink is for human-scale reports, never table-scale output.
    Returns the number of data rows written."""
    cols = columns or df.columns
    limited = df.select(*cols).orderBy(order_by).limit(max_rows + 1).collect()
    if len(limited) > max_rows:
        raise ValueError(
            f"write_pdf_report: input exceeds max_rows={max_rows} — "
            "a PDF report is a human-scale artifact; use parquet/JSONL "
            "sinks for table-scale output"
        )
    rows = [r.asDict() for r in limited]
    lines = [title, ""] + _format_table(rows, list(cols))
    data = render_pdf(lines)
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    with open(dest, "wb") as f:
        f.write(data)
    return len(rows)
