"""Estimate the HBM-traffic roofline of one NFE from the optimized HLO
(/tmp/nfe_hlo.txt, dumped by tools/fusion_inspect.py).

Sums operand + output bytes of every top-level instruction inside the scan
body (while.1), treating each fusion as one HBM round trip (operands read
once, outputs written once — XLA's fusion model).  Divide by 8 iterations.
"""

from __future__ import annotations

import re
import sys

DTBYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f64": 8,
           "c64": 8, "s8": 1, "u8": 1, "f16": 2}


def shape_bytes(s):
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", s):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTBYTES:
            continue
        n = 1
        for x in dims.split(","):
            if x:
                n *= int(x)
        total += n * DTBYTES[dt]
    return total


def main():
    txt = open(sys.argv[1] if len(sys.argv) > 1 else "/tmp/nfe_hlo.txt").read()
    # find the while body computation (largest computation in the module)
    comps = re.split(r"\n(?=%?[\w.\-]+ \([^)]*\) -> )", txt)
    body = max(comps, key=len)
    total = 0
    rows = []
    for line in body.splitlines():
        line = line.strip()
        m = re.match(r"%?([\w.\-]+) = (.+?) (\w[\w\-]*)\((.*)", line)
        if not m:
            continue
        name, outshape, op, rest = m.groups()
        if op in ("parameter", "constant", "tuple", "get-tuple-element",
                  "bitcast", "while", "after-all"):
            continue
        out_b = shape_bytes(outshape)
        # operand shapes appear inline in the call args
        in_b = shape_bytes(rest.split(", calls=")[0].split(", metadata=")[0])
        rows.append((out_b + in_b, name, op))
        total += out_b + in_b
    rows.sort(reverse=True)
    print(f"total HBM bytes (8 NFE): {total / 1e9:.2f} GB -> "
          f"{total / 8 / 1e9:.2f} GB/NFE -> roofline "
          f"{total / 8 / 819e9 * 1e3:.1f} ms/NFE at 819 GB/s")
    agg = {}
    for b, name, op in rows:
        agg[op] = agg.get(op, 0) + b
    for op, b in sorted(agg.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {op:>22s}: {b / 8 / 1e9:6.2f} GB/NFE "
              f"({b / 8 / 819e9 * 1e3:5.1f} ms)")


if __name__ == "__main__":
    main()
