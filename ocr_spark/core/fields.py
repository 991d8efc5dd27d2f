"""Document field extraction: the reference's per-category extractors
rebuilt from scratch as one single-pass, fixed-schema function.

The reference routes OCR text to one of five extractors
(``OCR API 2/api.py:52-64``) each returning a different dict of
formatted strings (SURVEY.md §2.8); every heuristic re-scans the full
line list per field (O(lines²), ``weighbridge.py:140``). This rebuild:

- one **fixed field set** = the union of all categories' keys
  (SURVEY.md §1.2 dynamic→fixed mapping), ``None`` replacing the
  sentinel ``"Not found"``;
- the same **first-match-wins classify cascade**
  (``ocr_utils.py:15-41`` — order matters: weighbridge's net/weight
  rule would swallow invoices);
- each positional heuristic (W1-W11) applied in a **single forward
  pass** over the reconstructed lines (input should be the
  ``extract_pdf_like`` output, whose label/value merges and column
  reconstruction already normalize the layout);
- pure + deterministic: compiled patterns at import, no wall-clock.

Per-field provenance (semantics studied from, not copied from):
vehicle ``weighbridge.py:28-81``/``classify.py:167``; dates
``weighbridge.py:139-151``; invoice-no 3-stage fallback
``ocr_utils.py:241-283``; consignor/consignee ``ocr_utils.py:117-127``;
from/to+state ``ocr_utils.py:131-154``; quantity+unit
``e_way_bill.py:44-64``/``ocr_utils.py:202-236``; net weight
``classify.py:170``/``weighbridge.py:106-117``; table-block total
``delivery_challan.py:27-34``.
"""

from __future__ import annotations

import re
from datetime import date
from typing import NamedTuple


class Fields(NamedTuple):
    category: str
    vehicle_no: str | None
    doc_date: str | None       # ISO yyyy-mm-dd, latest date in doc (A4)
    invoice_no: str | None
    consignor: str | None
    consignee: str | None
    from_city: str | None
    from_state: str | None
    to_city: str | None
    to_state: str | None
    quantity: str | None       # "1,234.500 MT" (F9 formatting)
    net_weight: str | None
    total_qty: str | None      # sum over table block (A1)


FIELD_NAMES = tuple(Fields._fields)

# -- classify cascade (ocr_utils.py:15-41 semantics, generalized) ----------
_EWAY_RE = re.compile(r"e[\s-]?way\s*bill")
_CHALLAN_RE = re.compile(r"delivery\s*challan")
_LR_RE = re.compile(r"consignment\s*note|lorry\s*receipt")
_WEIGHBRIDGE_RE = re.compile(r"weigh\s*bridge|weighbridge")
_WB_CONJ_RE = re.compile(r"\bgross\b")  # + net/weight conjunction below
_INVOICE_RE = re.compile(r"tax\s*invoice|\binvoice\b")

_VEHICLE_RE = re.compile(r"\b[A-Z]{2}\s?\d{2}\s?[A-Z]{1,3}\s?\d{3,4}\b")
_DATE_NUM_RE = re.compile(r"\b(\d{1,2})[/-](\d{1,2})[/-](\d{2,4})\b")
_DATE_ISO_RE = re.compile(r"\b(\d{4})-(\d{2})-(\d{2})\b")
_MONTHS = "jan feb mar apr may jun jul aug sep oct nov dec".split()
_DATE_TXT_RE = re.compile(
    r"\b(\d{1,2})[\s\-]((?:" + "|".join(_MONTHS) + r")[a-z]*)[\s\-,]*(\d{2,4})\b",
    re.IGNORECASE,
)
_QTY_RE = re.compile(
    r"(\d{1,3}(?:,\d{3})*(?:\.\d{1,3})?)\s*(KGS?|MT|TONS?)\b", re.IGNORECASE
)
_NUM_RE = re.compile(r"\d{1,3}(?:,\d{3})*(?:\.\d{1,3})?")
_BARE_NUM_RE = re.compile(r"^\d+(?:[.,]\d+)?$")
_NET_WT_RE = re.compile(r"net\s*weight[^:\d]*[:\-]?\s*(\d+(?:,\d{3})*(?:\.\d{1,3})?)", re.IGNORECASE)
_PAREN_RE = re.compile(r"\(([^)]+)\)")
_INVOICEISH_RE = re.compile(r"^[A-Z]{0,5}[-/]?\d{3,}$|^INV[-/]?\w+$", re.IGNORECASE)
_TABLE_BLOCK_RE = re.compile(
    r"(?is)\bS\.?R\.?\s*\.?\s*NO\b.{0,800}?\bTOTAL\b"
)
_NOISEISH_RE = re.compile(r"(?i)^\s*(?:dated?\b|date\b|page\b)")

_INVOICE_LABELS = ("invoice no", "dispatch doc no", "reference no")
# same-line 'Label : value' forms (pdf_layout's ':'-continuation merge
# turns split label/value lines into exactly this shape)
_INLINE_VALUE_RE = re.compile(r"^(.*?)[\s.]*[:\-]\s*(\S.*)$")


def _inline_value(line: str, label_low: str, prefix: bool = False) -> str | None:
    """Value after ':'/'-' on a label line ('Invoice No. : INV-7731')."""
    m = _INLINE_VALUE_RE.match(line)
    if not m:
        return None
    head = m.group(1).strip().lower()
    ok = head.startswith(label_low) if prefix else head == label_low
    return m.group(2).strip() if ok and m.group(2).strip() else None


def classify_category(text: str) -> str:
    """Ordered first-match-wins cascade (ocr_utils.py:15-41)."""
    low = text.lower()
    if _EWAY_RE.search(low):
        return "E Way Bill"
    if _CHALLAN_RE.search(low):
        return "Delivery Challan"
    if _LR_RE.search(low):
        return "LR Copy"
    if _WEIGHBRIDGE_RE.search(low) or (
        "net" in low and "weight" in low and _WB_CONJ_RE.search(low)
    ):
        return "Weighbridge"
    if _INVOICE_RE.search(low):
        return "Tax Invoice"
    return "Unknown"


def _parse_date(d: int, m: int, y: int) -> date | None:
    if y < 100:
        y += 2000  # F11 2-digit-year rule (weighbridge.py:144)
    try:
        return date(y, m, d)
    except ValueError:
        return None


def _latest_date(text: str) -> str | None:
    """All date mentions, latest wins (A4, weighbridge.py:139-151)."""
    found: list[date] = []
    for m in _DATE_NUM_RE.finditer(text):
        d = _parse_date(int(m.group(1)), int(m.group(2)), int(m.group(3)))
        if d:
            found.append(d)
    for m in _DATE_ISO_RE.finditer(text):
        d = _parse_date(int(m.group(3)), int(m.group(2)), int(m.group(1)))
        if d:
            found.append(d)
    for m in _DATE_TXT_RE.finditer(text):
        mon = _MONTHS.index(m.group(2).lower()[:3]) + 1
        d = _parse_date(int(m.group(1)), mon, int(m.group(3)))
        if d:
            found.append(d)
    return max(found).isoformat() if found else None


def _num(s: str) -> float | None:
    try:
        return float(s.replace(",", ""))  # F8 comma-strip parse
    except ValueError:
        return None


def extract_fields(text: str) -> Fields:
    """Single pass over reconstructed lines → fixed field struct."""
    category = classify_category(text)
    lines = [ln.strip() for ln in text.split("\n")]
    low = [ln.lower() for ln in lines]
    n = len(lines)

    vehicle_no = None
    consignor = consignee = None
    from_city = from_state = to_city = to_state = None
    invoice_no = None
    qty_candidates: list[tuple[float, str]] = []

    m = _VEHICLE_RE.search(text)
    if m:
        vehicle_no = re.sub(r"\s+", "", m.group(0))

    for i, ln in enumerate(lines):
        ll = low[i]
        if consignor is None and ll.startswith("consignor"):
            consignor = _inline_value(ln, "consignor")
            if consignor is None and ll == "consignor" and i + 1 < n:
                consignor = lines[i + 1] or None  # W2 label→next
        elif consignee is None and ll.startswith("consignee"):
            consignee = _inline_value(ln, "consignee")
            if consignee is None and ll == "consignee" and i + 1 < n:
                consignee = lines[i + 1] or None
        elif from_city is None and ll == "from" and i + 1 < n:
            from_city = lines[i + 1] or None  # W3 label→offsets
            for j in range(i + 1, min(i + 3, n)):
                pm = _PAREN_RE.search(lines[j])
                if pm:
                    from_state = pm.group(1)
                    break
        elif to_city is None and ll == "to" and i + 1 < n:
            to_city = lines[i + 1] or None
            for j in range(i + 1, min(i + 3, n)):
                pm = _PAREN_RE.search(lines[j])
                if pm:
                    to_state = pm.group(1)
                    break
        if invoice_no is None and any(lbl in ll for lbl in _INVOICE_LABELS):
            # same-line 'Invoice No. : INV-7731' first (merged layout)
            for lbl in _INVOICE_LABELS:
                iv = _inline_value(ln, lbl, prefix=True)
                if iv and (_INVOICEISH_RE.match(iv) or _BARE_NUM_RE.match(iv)):
                    invoice_no = iv
                    break
            if invoice_no is not None:
                continue
            # W4: bounded lookahead, skipping date/noise decoys
            for j in range(i + 1, min(i + 4, n)):
                cand = lines[j]
                if not cand or _NOISEISH_RE.match(cand) or _latest_date(cand):
                    continue
                if _INVOICEISH_RE.match(cand) or _BARE_NUM_RE.match(cand):
                    invoice_no = cand
                    break
        if "quantity" in ll or "qty" in ll:
            # W5: value line then unit possibly on the following line
            for j in range(i + 1, min(i + 6, n)):
                qm = _QTY_RE.search(lines[j])
                if qm:
                    v = _num(qm.group(1))
                    if v is not None:
                        qty_candidates.append((v, qm.group(2).upper()))
                    break
                nm = _NUM_RE.fullmatch(lines[j])
                if nm:
                    v = _num(nm.group(0))
                    unit = None
                    if j + 1 < n and low[j + 1] in ("kgs", "kg", "mt", "tons", "ton"):
                        unit = lines[j + 1].upper()
                    if v is not None:
                        qty_candidates.append((v, unit or "MT"))
                    break

    # F6 inline quantity mentions anywhere
    for qm in _QTY_RE.finditer(text):
        v = _num(qm.group(1))
        if v is not None:
            qty_candidates.append((v, qm.group(2).upper()))

    quantity = None
    if qty_candidates:
        v, unit = max(qty_candidates, key=lambda x: x[0])  # A3 argmax
        quantity = f"{v:,.3f} {unit}"  # F9 formatting

    net_weight = None
    nm = _NET_WT_RE.search(text)
    if nm:
        net_weight = nm.group(1)
    else:
        # W8 vertically stacked: net / weight / <number>
        for i in range(n - 2):
            if low[i] == "net" and low[i + 1] == "weight" and _BARE_NUM_RE.match(lines[i + 2]):
                net_weight = lines[i + 2]
                break

    total_qty = None
    tb = _TABLE_BLOCK_RE.search(text)
    if tb:
        decimals = [
            _num(x) for x in _NUM_RE.findall(tb.group(0)) if "." in x
        ]
        decimals = [v for v in decimals if v is not None]
        if decimals:
            # A1: the block match ends AT the TOTAL keyword, so every
            # captured decimal is a row value — sum them all
            total_qty = f"{sum(decimals):,.3f}"

    return Fields(
        category=category,
        vehicle_no=vehicle_no,
        doc_date=_latest_date(text),
        invoice_no=invoice_no,
        consignor=consignor,
        consignee=consignee,
        from_city=from_city,
        from_state=from_state,
        to_city=to_city,
        to_state=to_state,
        quantity=quantity,
        net_weight=net_weight,
        total_qty=total_qty,
    )
