#!/usr/bin/env python
"""Extract modem constellation data tables from the reference sources.

The reference defines APSK ring descriptors (reference
src/modem/src/modem_apsk_const.c) and arbitrary constellation point tables
(reference src/modem/src/modem_arb_const.c: SQAM quarter-tables, V.29,
optimal QAMs, VT-64) as numeric C arrays.  These are constellation *data*
(coordinates/maps, originally produced by external optimization), not
algorithms — we extract them into an .npz asset the modem module loads,
exactly like the golden test vectors.

Usage: python tools/extract_modem_tables.py
"""
import pathlib
import re
import sys

import numpy as np

REF = pathlib.Path("/root/reference/src/modem/src")
OUT = pathlib.Path(__file__).resolve().parent.parent / \
    "liquid_dsp_tpu/modem/_tables.npz"

_COMMENT_RE = re.compile(r"/\*.*?\*/|//[^\n]*", re.DOTALL)
_ARRAY_RE = re.compile(
    r"(?P<type>const float complex|float complex|float|unsigned int|"
    r"unsigned char)\s+(?P<name>\w+)\s*\[\s*\d*\s*\]\s*=\s*\{(?P<body>.*?)\}\s*;",
    re.DOTALL,
)
_NUM = r"[\d.]+(?:[eE][+-]?\d+)?"
_CPLX_RE = re.compile(
    rf"([+-]?\s*{_NUM})\s*([+-])\s*([+-]?\s*{_NUM})\s*\*\s*_Complex_I")


def _signed(sgn: str, num: str) -> float:
    s = (sgn + num).replace(" ", "")
    s = s.replace("+-", "-").replace("-+", "-").replace("--", "+")
    return float(s.lstrip("+"))


def parse(text: str) -> dict:
    text = _COMMENT_RE.sub("", text)
    out = {}
    for m in _ARRAY_RE.finditer(text):
        name, body, typ = m.group("name"), m.group("body"), m.group("type")
        if "_Complex_I" in body:
            vals = [complex(float(re_.replace(" ", "")), _signed(sgn, im))
                    for re_, sgn, im in _CPLX_RE.findall(body)]
            out[name] = np.asarray(vals, np.complex64)
        else:
            toks = [t.strip().rstrip("fF") for t in body.split(",") if t.strip()]
            dtype = np.int32 if "unsigned" in typ else np.float32
            out[name] = np.asarray([float(t) for t in toks], dtype)
    return out


def main() -> int:
    tables = {}
    tables.update(parse((REF / "modem_apsk_const.c").read_text()))
    tables.update(parse((REF / "modem_arb_const.c").read_text()))
    # keep only the numeric arrays we use
    keep = {}
    for M in (4, 8, 16, 32, 64, 128, 256):
        for f in ("p", "r", "phi", "r_slicer", "map"):
            k = f"apsk{M}_{f}"
            if k in tables:
                keep[k] = tables[k]
    for k in ("modem_arb_sqam32", "modem_arb_sqam128", "modem_arb_V29",
              "modem_arb_vt64", "modem_arb16opt", "modem_arb32opt",
              "modem_arb64opt", "modem_arb128opt", "modem_arb256opt"):
        keep[k] = tables[k]
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez(OUT, **keep)
    print(f"wrote {len(keep)} tables -> {OUT}")
    for k, v in sorted(keep.items()):
        print(f"  {k}: {v.shape} {v.dtype}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
