"""Minimal stdlib ``.xlsx`` reader (zipfile + ElementTree).

The reference reads the external CPTAC label workbook with
``pd.read_excel`` (``/root/reference/tools/generate_test_labels.py:132``),
which needs the optional ``openpyxl`` engine.  This environment (and lean
deployment images) may not ship it, so :func:`read_xlsx` parses the subset
of OOXML that plain data workbooks use — one sheet of cells with shared /
inline strings, numbers and blanks — into a DataFrame with the same
header-row semantics as ``pd.read_excel``.  ``tools/generate_test_labels.py``
falls back to it automatically when ``pd.read_excel`` raises ImportError.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

import numpy as np
import pandas as pd

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A' -> 0, 'Z' -> 25, 'AA' -> 26 …"""
    i = 0
    for ch in ref:
        i = i * 26 + (ord(ch) - ord("A") + 1)
    return i - 1


def _shared_strings(z: zipfile.ZipFile):
    try:
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.iter(f"{_NS}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _cell_value(cell, shared):
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        return "".join(t.text or "" for t in cell.iter(f"{_NS}t"))
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "str":
        return v.text
    if ctype == "b":
        return bool(int(v.text))
    if ctype == "e":
        # error cells (#N/A, #DIV/0!, ...) -> NaN, matching pd.read_excel's
        # default na_values treatment of '#N/A' and friends
        return None
    try:
        f = float(v.text)
    except ValueError:
        return v.text
    return int(f) if f.is_integer() and abs(f) < 2**53 else f


def read_xlsx(path: str, sheet: int = 0) -> pd.DataFrame:
    """Read a data worksheet into a DataFrame (first row = header), matching
    ``pd.read_excel(path)`` for plain tabular workbooks."""
    with zipfile.ZipFile(path) as z:
        shared = _shared_strings(z)
        # numeric sort: 'sheet10.xml' must come after 'sheet2.xml'
        sheets = sorted(
            (n for n in z.namelist()
             if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
            key=lambda n: int(re.search(r"(\d+)\.xml$", n).group(1)),
        )
        root = ET.fromstring(z.read(sheets[sheet]))
    rows = {}
    max_col = -1
    for row in root.iter(f"{_NS}row"):
        for cell in row.iter(f"{_NS}c"):
            m = _CELL_REF.fullmatch(cell.get("r", ""))
            if not m:
                continue
            c, r = _col_index(m.group(1)), int(m.group(2)) - 1
            val = _cell_value(cell, shared)
            if val is not None:
                rows.setdefault(r, {})[c] = val
                max_col = max(max_col, c)
    if not rows:
        return pd.DataFrame()
    header_r = min(rows)
    ncols = max_col + 1  # keep trailing header-less data columns too
    header = [rows[header_r].get(c) for c in range(ncols)]
    # pd.read_excel naming semantics: blank header cells become
    # 'Unnamed: N' (a bare None key would collapse every unnamed column
    # into one) and duplicate names are mangled 'x', 'x.1', 'x.2', ...
    names, seen = [], {}
    for c, h in enumerate(header):
        name = f"Unnamed: {c}" if h is None else h
        if name in seen:
            seen[name] += 1
            name = f"{name}.{seen[name]}"
        seen.setdefault(name, 0)
        names.append(name)
    data = {
        c: [rows.get(r, {}).get(c, np.nan) for r in sorted(rows) if r != header_r]
        for c in range(ncols)
    }
    return pd.DataFrame({names[c]: data[c] for c in range(ncols)})
