"""Shared Spark/DuckDB cell canonicalization for the two oracle gates.

One implementation (r05 review: three parallel canonicalizers had
drifted — 6 vs 9 significant digits, NaN→'' vs 'NaN', nested handling
in only one). Each gate keeps its historical comparison strictness via
``make_cell(sig, nan_repr)``; the structural rules are identical:

- None / pandas NaT -> ""
- float (incl. numpy) -> fixed significant digits, NaN -> nan_repr
- bytes -> hex
- pyspark Row (a tuple subclass!) -> treated as its dict form, so a
  struct cell renders '{k=v,...}' on BOTH engines instead of
  positionally on one and keyed on the other
- numpy arrays -> list form
- dict -> '{k=v}' sorted by key; list/tuple -> '[...]'
- datetime-likes -> isoformat
"""

from __future__ import annotations

import math
from typing import Callable


def make_cell(sig: int, nan_repr: str) -> Callable:
    def cell(v):
        if v is None:
            return ""
        if v.__class__.__name__ == "NaTType":
            return ""
        if isinstance(v, float):
            if math.isnan(v):
                return nan_repr
            return f"{v:.{sig}g}"
        if isinstance(v, bytes):
            return v.hex()
        if hasattr(v, "asDict"):  # pyspark Row: struct cell, not a tuple
            v = v.asDict()
        if v.__class__.__name__ == "ndarray":
            v = v.tolist()
        if isinstance(v, dict):
            return "{" + ",".join(f"{k}={cell(v[k])}" for k in sorted(v)) + "}"
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return str(v)

    return cell
