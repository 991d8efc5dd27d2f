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
    eway_bill_no: str | None   # 10-15 digit no. near its label (e_way_bill.py:24-36)
    generated_date: str | None  # raw d/m/y as found (e_way_bill.py:40)
    valid_upto: str | None     # raw d/m/y as found (e_way_bill.py:41)
    transporter: str | None    # label→value (lr_copy.py:30, generalized)
    material: str | None       # W9 skip-list (weighbridge.py:84-93)
    name: str | None           # W10 line-0/line-4 heuristic (weighbridge.py:153-166)
    carrier_no: str | None     # vehicle pattern on a Carrier line (weighbridge.py:64-74)
    lr_no: str | None          # date-proximity consignment no (ocr_utils.py:95-114)


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
# same-line only ([^:\d\n]): the reference scans per-line
# (weighbridge.py:119-127); letting the gap cross newlines would grab
# the first digit of a later unrelated line
_NET_WT_RE = re.compile(
    r"net\s*weight[^:\d\n]*[:\-]?\s*(\d+(?:,\d{3})*(?:\.\d{1,3})?)", re.IGNORECASE
)
_PAREN_RE = re.compile(r"\(([^)]+)\)")
_INVOICEISH_RE = re.compile(r"^[A-Z]{0,5}[-/]?\d{3,}$|^INV[-/]?\w+$", re.IGNORECASE)
_TABLE_BLOCK_RE = re.compile(
    r"(?is)\bS\.?R\.?\s*\.?\s*NO\b.{0,800}?\bTOTAL\b"
)
_NOISEISH_RE = re.compile(r"(?i)^\s*(?:dated?\b|date\b|page\b)")

# E-Way Bill fields (semantics from e_way_bill.py:24-41)
_EWAY_NO_ANCHOR_RE = re.compile(r"e[\s-]?way\s*bill|transporter\s*doc")
_EWAY_NO_RE = re.compile(r"\b\d{10,15}\b")
_GEN_DATE_RE = re.compile(
    r"generated\s+date[:\-]?\s*(\d{1,2}[/-]\d{1,2}[/-]\d{2,4})", re.IGNORECASE
)
_VALID_UPTO_RE = re.compile(
    r"valid\s+upto[:\-]?\s*(\d{1,2}[/-]\d{1,2}[/-]\d{2,4})", re.IGNORECASE
)
# W9 material skip-list (weighbridge.py:85) + non-word candidate gate
_MATERIAL_LABELS = ("material", "commodity", "product name")
_MATERIAL_SKIP = (
    "vehicle", "operator", "date", "source", "time", "gross", "tare", "net", "wt"
)
_NONWORD_LINE_RE = re.compile(r"^[\d\W\s]+$")
# W10 name heuristics (weighbridge.py:156-164): substring keyword vetoes
_NAME_SKIP_L0 = ("rst", "no", "kg", "wt", "date", "phone", "vehicle")
_NAME_SKIP_L4 = ("gross", "net", "tare", "phone", "bags", "date", "wt", "operator")
# carrier-format vehicle number, no internal space (weighbridge.py:70)
_CARRIER_VEH_RE = re.compile(r"\b[A-Z]{2}\d{2}[A-Z]{1,3}\d{3,4}\b")
# LR/consignment no via date proximity (ocr_utils.py:95-114)
_DATE_LINE_RE = re.compile(r"\bDATE[:\-]?\s*\d{1,2}[/-]\d{1,2}[/-]\d{2,4}", re.IGNORECASE)
_LR_NO_RE = re.compile(r"^\s*\d{3,6}\s*$")
# F10 textual-digit decode (weighbridge.py:17-20)
_TEXTUAL_DIGITS = {
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
}

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
    eway_bill_no = transporter = material = carrier_no = None
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
        if eway_bill_no is None and _EWAY_NO_ANCHOR_RE.search(ll):
            # 10-15 digit number on the anchor line or the next two
            # (e_way_bill.py:26-33 scans lines[i:i+3])
            for j in range(i, min(i + 3, n)):
                em = _EWAY_NO_RE.search(lines[j])
                if em:
                    eway_bill_no = em.group(0)
                    break
        if (
            transporter is None
            and ll.startswith("transporter")
            # "Transporter Doc" is the e-way-no anchor, not a name label
            and not ll.startswith("transporter doc")
        ):
            transporter = _inline_value(ln, "transporter name", prefix=True) or (
                _inline_value(ln, "transporter", prefix=True)
            )
            if (
                transporter is None
                and ll in ("transporter", "transporter name")
                and i + 1 < n
            ):
                transporter = lines[i + 1] or None  # W2 label→next
        if material is None and any(lbl in ll for lbl in _MATERIAL_LABELS):
            # W9: next 1-2 lines, skipping generic-keyword decoys
            # (weighbridge.py:84-93); e-way "Product Name" path maps
            # PET-family products to "PET" (e_way_bill.py:85-88)
            is_product = "product name" in ll
            for off in (1, 2):
                if i + off < n:
                    cand = lines[i + off].strip(":;").strip()
                    cl = cand.lower()
                    if (
                        cand
                        and not any(k in cl for k in _MATERIAL_SKIP)
                        and not _NONWORD_LINE_RE.match(cand)
                    ):
                        material = "PET" if (is_product and "pet" in cl) else cand.title()
                        break
        if carrier_no is None and "carrier" in ll:
            cm = _CARRIER_VEH_RE.search(ln.upper())
            if cm:
                carrier_no = cm.group(0)
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
    if net_weight is None:
        # F10 textual-digit fallback (weighbridge.py:130-136): a line
        # with spelled-out digits and a kg mention decodes to the raw
        # digit string (the reference formats to Tons there; formatting
        # is F9's job downstream, so the raw value is kept like the
        # numeric paths above)
        for l2 in low:
            if "one" in l2 and "kg" in l2:
                digits = "".join(_TEXTUAL_DIGITS.get(w, "") for w in l2.split())
                if len(digits) >= 4:
                    net_weight = digits
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

    if vehicle_no is None and carrier_no is not None:
        vehicle_no = carrier_no  # pass-3a fallback (weighbridge.py:64-74)

    # W10 name: the reference emits Name only from the weighbridge
    # extractor (weighbridge.py:153-166) — line 0 if it reads like a
    # short firm name, else line 4 (legacy slips); substring vetoes
    name = None
    if category == "Weighbridge" and n > 0:
        if 2 <= len(low[0].split()) <= 5 and not any(k in low[0] for k in _NAME_SKIP_L0):
            name = lines[0].title()
        if name is None and n > 4:
            if 2 <= len(low[4].split()) <= 5 and not any(
                k in low[4] for k in _NAME_SKIP_L4
            ):
                name = lines[4].title()

    # LR/consignment no: bare 3-6 digit line within 9 lines above the
    # first DATE line (ocr_utils.py:95-114)
    lr_no = None
    date_idx = next((i for i, ln in enumerate(lines) if _DATE_LINE_RE.search(ln)), None)
    if date_idx is not None and date_idx > 0:
        for j in range(date_idx - 1, max(date_idx - 10, -1), -1):
            if _LR_NO_RE.match(lines[j]):
                lr_no = lines[j].strip()
                break

    gm = _GEN_DATE_RE.search(text)
    vm = _VALID_UPTO_RE.search(text)

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
        eway_bill_no=eway_bill_no,
        generated_date=gm.group(1) if gm else None,
        valid_upto=vm.group(1) if vm else None,
        transporter=transporter,
        material=material,
        name=name,
        carrier_no=carrier_no,
        lr_no=lr_no,
    )
