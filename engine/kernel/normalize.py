"""Field normalization kernel (SURVEY.md §2.3 T13–T18, §2.4 A2).

Re-derivation of the reference post-processor and data cleaner
(/root/reference/backend/app/services/extraction/post_processor.py:27-521,
/root/reference/backend/app/services/llm/parser.py:260-343): date→ISO,
amount parsing incl. European decimal format, currency detection via a
symbol table, line-item canonicalization with algebraic inference, and
amount-consistency validation with a 0.02 tolerance.
"""

from __future__ import annotations

import re
from typing import Any

# symbol → ISO code, checked in insertion order (post_processor.py:27-47)
CURRENCY_SYMBOLS: dict[str, str] = {
    "$": "USD", "€": "EUR", "£": "GBP", "¥": "JPY", "₹": "INR",
    "₽": "RUB", "R$": "BRL", "C$": "CAD", "A$": "AUD", "₩": "KRW",
    "₪": "ILS", "฿": "THB", "₱": "PHP", "zł": "PLN", "kr": "SEK",
    "CHF": "CHF", "Rs": "PKR", "Rs.": "PKR", "PKR": "PKR",
}

MONTHS = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}

_ISO = re.compile(r"^\d{4}-\d{2}-\d{2}$")
# (regex, kind) tried in order (post_processor.py:50-62)
_DATE_RULES: tuple[tuple[re.Pattern, str], ...] = (
    (re.compile(r"(\d{4})-(\d{1,2})-(\d{1,2})"), "ymd"),
    (re.compile(r"(\d{1,2})/(\d{1,2})/(\d{4})"), "mdY"),
    (re.compile(r"(\d{1,2})/(\d{1,2})/(\d{2})"), "mdy"),
    (re.compile(r"(\d{1,2})\.(\d{1,2})\.(\d{4})"), "dmY"),
    (re.compile(r"(\d{1,2})-(\d{1,2})-(\d{4})"), "dmY_dash"),
    (re.compile(r"(\w+)\s+(\d{1,2}),?\s+(\d{4})"), "month_first"),
    (re.compile(r"(\d{1,2})\s+(\w+)\s+(\d{4})"), "day_first"),
)

_EURO_AMOUNT = re.compile(r"^\d{1,3}(\.\d{3})+,\d{2}$")
_NON_NUMERIC = re.compile(r"[^\d.\-]")


def parse_date(date_str: Any) -> str | None:
    """T14: normalize many date shapes to YYYY-MM-DD; passthrough on failure.

    Numeric forms are strptime-validated (an invalid calendar day falls
    through to the next rule, mirroring post_processor.py:112-131);
    month-name forms format the day without validation (":118-125").
    """
    from datetime import datetime

    if not date_str:
        return None
    s = str(date_str).strip()
    if _ISO.match(s):
        return s
    _FMT = {"ymd": "%Y-%m-%d", "mdY": "%m/%d/%Y", "mdy": "%m/%d/%y",
            "dmY": "%d.%m.%Y", "dmY_dash": "%d-%m-%Y"}
    for pat, kind in _DATE_RULES:
        m = pat.search(s)
        if not m:
            continue
        g = m.groups()
        try:
            if kind == "month_first":
                mo = MONTHS.get(g[0].lower()[:3])
                if mo:
                    return f"{g[2]}-{mo:02d}-{int(g[1]):02d}"
            elif kind == "day_first":
                mo = MONTHS.get(g[1].lower()[:3])
                if mo:
                    return f"{g[2]}-{mo:02d}-{int(g[0]):02d}"
            else:
                dt = datetime.strptime(m.group(), _FMT[kind])
                return dt.strftime("%Y-%m-%d")
        except (ValueError, AttributeError):
            continue
    return s


def parse_amount(value: Any) -> float | None:
    """T15: tolerant money parse (symbols, thousands, European decimals)."""
    if value is None:
        return None
    if isinstance(value, bool):
        return None
    if isinstance(value, (int, float)):
        return float(value)
    if not isinstance(value, str):
        return None
    s = value.strip()
    for symbol in CURRENCY_SYMBOLS:
        s = s.replace(symbol, "")
    if _EURO_AMOUNT.match(s):
        s = s.replace(".", "").replace(",", ".")
    else:
        s = s.replace(",", "")
    s = _NON_NUMERIC.sub("", s)
    try:
        return float(s)
    except (ValueError, TypeError):
        return None


def detect_currency(data: dict[str, Any], text: str = "") -> str:
    """T16: explicit field → amount-field symbols → full-text symbols → USD."""
    cur = data.get("currency")
    if cur and len(str(cur)) == 3:
        return str(cur).upper()
    for field in ("total_amount", "subtotal", "tax_amount"):
        v = data.get(field)
        if isinstance(v, str):
            for symbol, code in CURRENCY_SYMBOLS.items():
                if symbol in v:
                    return code
    for symbol, code in CURRENCY_SYMBOLS.items():
        if symbol in text:
            return code
    return "USD"


def normalize_line_items(items: Any) -> list[dict[str, Any]]:
    """T17: canonical line items + algebraic inference of the missing leg."""
    if not items:
        return []
    out: list[dict[str, Any]] = []
    for item in items:
        if not isinstance(item, dict):
            continue
        desc = str(item.get("description", "")).strip() or None
        row: dict[str, Any] = {
            "description": desc,
            "quantity": None,
            "unit_price": None,
            "amount": None,
            "sku": item.get("sku"),
            "discount": parse_amount(item.get("discount")) or 0.0,
        }
        qty = item.get("quantity")
        if qty is None:
            qty = item.get("qty")
        if qty is not None:
            try:
                row["quantity"] = float(qty)
            except (ValueError, TypeError):
                pass
        price = (
            item.get("unit_price")
            or item.get("rate")
            or item.get("price")
            or item.get("price_each")
        )
        row["unit_price"] = parse_amount(price)
        amount = item.get("amount") or item.get("total") or item.get("line_total")
        row["amount"] = parse_amount(amount)

        q, p, a = row["quantity"], row["unit_price"], row["amount"]
        if q and p and not a:
            row["amount"] = round(q * p, 2)
        elif q and a and not p:
            row["unit_price"] = round(a / q, 2)
        elif p and a and not q:
            inferred = a / p
            if inferred == int(inferred):
                row["quantity"] = int(inferred)
        out.append(row)
    return out


def normalize_line_item_currencies(
    line_items: list[Any], currency: str
) -> tuple[list[dict[str, Any]], list[str]]:
    """T18 step-5: strip wrong-currency symbols from string line-item
    amounts, logging each fix (post_processor.py:337-391).

    In the composed T18 flow this runs after normalize_line_items has
    already coerced amounts to float/None, so it is a no-op there (same
    as the reference flow, post_processor.py:477-484) — but it is part
    of the public post-processing surface and handles raw string items.
    """
    corrections: list[str] = []
    normalized: list[dict[str, Any]] = []
    for item in line_items:
        if not isinstance(item, dict):
            continue
        out = dict(item)
        for field in ("unit_price", "amount"):
            value = item.get(field)
            if not isinstance(value, str):
                continue
            for symbol, code in CURRENCY_SYMBOLS.items():
                if symbol in value and code != currency:
                    cleaned = parse_amount(value)
                    if cleaned is not None:
                        out[field] = cleaned
                        corrections.append(
                            f"Fixed currency in line item {field}: {value} → {cleaned}"
                        )
                    break
        normalized.append(out)
    return normalized, corrections


def validate_amounts(data: dict[str, Any]) -> tuple[dict[str, float], list[str]]:
    """A2: Σline_items≈subtotal and subtotal+tax+ship−disc≈total (tol 0.02)."""
    adjustments: dict[str, float] = {}
    warnings: list[str] = []
    subtotal = parse_amount(data.get("subtotal"))
    tax = parse_amount(data.get("tax_amount")) or 0.0
    shipping = parse_amount(data.get("shipping_amount")) or 0.0
    discount = parse_amount(data.get("discount_amount")) or 0.0
    total = parse_amount(data.get("total_amount"))

    items = data.get("line_items") or []
    if items:
        line_sum = sum(
            parse_amount(i.get("amount")) or 0.0 for i in items if isinstance(i, dict)
        )
        if subtotal and line_sum > 0 and abs(subtotal - line_sum) > 0.02:
            warnings.append("subtotal_mismatch")
            adjustments["subtotal"] = -0.1

    if total and subtotal:
        expected = subtotal + tax + shipping - discount
        if abs(total - expected) > 0.02:
            warnings.append("total_mismatch")
            adjustments["total_amount"] = -0.1
    return adjustments, warnings


def clean_extracted_data(data: dict[str, Any], document_type: str = "invoice") -> dict[str, Any]:
    """T13: trim/null-normalize recursively + invoice amount coercion."""
    cleaned: dict[str, Any] = {}
    for key, value in data.items():
        if value is None:
            cleaned[key] = None
        elif isinstance(value, str):
            v = value.strip()
            cleaned[key] = v if v else None
        elif isinstance(value, (int, float)):
            cleaned[key] = value
        elif isinstance(value, list):
            cleaned[key] = [x for x in value if x is not None and x != ""]
        elif isinstance(value, dict):
            cleaned[key] = clean_extracted_data(value, document_type)
        else:
            cleaned[key] = value

    if document_type == "invoice":
        for f in ("total_amount", "tax_amount", "subtotal", "shipping_amount"):
            v = cleaned.get(f)
            if isinstance(v, str):
                try:
                    cleaned[f] = float(re.sub(r"[,$€£]", "", v))
                except (ValueError, TypeError):
                    pass
        items = cleaned.get("line_items")
        if isinstance(items, list):
            for item in items:
                if not isinstance(item, dict):
                    continue
                if "price" in item and "unit_price" not in item:
                    item["unit_price"] = item["price"]
                for f in ("unit_price", "price", "amount", "quantity"):
                    if isinstance(item.get(f), str):
                        try:
                            item[f] = float(re.sub(r"[,$€£]", "", item[f]))
                        except (ValueError, TypeError):
                            pass
    return cleaned


def post_process_invoice(data: dict[str, Any], original_text: str = "") -> dict[str, Any]:
    """T18 composite: dates→currency→amounts→line items→validate→required.

    Returns {data, adjustments, warnings, corrections, corrections_count};
    ``corrections`` carries the reference's human-readable fix log
    (post_processor.py:428-484 corrections entries) and
    ``corrections_count`` == len(corrections).
    """
    if not data:
        return {"data": {}, "adjustments": {}, "warnings": ["no_data"],
                "corrections": [], "corrections_count": 0}
    warnings: list[str] = []
    adjustments: dict[str, float] = {}
    corrections: list[str] = []
    out = dict(data)

    for f in ("invoice_date", "due_date"):
        if out.get(f):
            original = out[f]
            parsed = parse_date(original)
            if parsed and parsed != original:
                out[f] = parsed
                corrections.append(f"Normalized {f}: {original} → {parsed}")

    currency = None
    if out.get("currency") and len(str(out["currency"])) == 3:
        currency = str(out["currency"]).upper()
    if not currency:
        for f in ("total_amount", "subtotal", "grand_total"):
            v = out.get(f)
            if isinstance(v, str):
                for code in ("PKR", "USD", "EUR", "GBP", "INR", "CAD", "AUD", "JPY"):
                    if code in v.upper():
                        currency = code
                        break
            if currency:
                break
    if not currency:
        currency = detect_currency(out, original_text)
    out["currency"] = currency

    for f in (
        "total_amount", "subtotal", "tax_amount", "shipping_amount",
        "discount_amount", "amount_paid", "balance_due", "grand_total",
    ):
        if out.get(f):
            original = out[f]
            parsed = parse_amount(original)
            if parsed is not None:
                if str(original) != str(parsed):
                    corrections.append(f"Parsed {f}: {original} → {parsed}")
                out[f] = parsed

    if out.get("line_items"):
        out["line_items"] = normalize_line_items(out["line_items"])
        out["line_items"], currency_fixes = normalize_line_item_currencies(
            out["line_items"], currency
        )
        corrections.extend(currency_fixes)

    amount_adj, amount_warn = validate_amounts(out)
    adjustments.update(amount_adj)
    warnings.extend(amount_warn)

    for f in ("invoice_number", "total_amount"):
        if not out.get(f):
            warnings.append(f"missing:{f}")
            adjustments[f] = -0.2

    if out:
        completeness = sum(1 for v in out.values() if v is not None) / len(out)
        if completeness > 0.7:
            adjustments["overall"] = 0.1

    return {
        "data": out,
        "adjustments": adjustments,
        "warnings": warnings,
        "corrections": corrections,
        "corrections_count": len(corrections),
    }
