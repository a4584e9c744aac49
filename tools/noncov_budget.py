"""Join the xprof hlo_stats trace (tools/trace_nfe.py run) with the dumped
optimized HLO (/tmp/nfe_hlo.txt from tools/fusion_inspect.py) and print every
NON-convolution op >= 0.05 ms/NFE with its output shape and body summary —
the elementwise/copy complement of tools/conv_budget.py.

Run AFTER trace_nfe.py and fusion_inspect.py (uses their artifacts; no TPU).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from tools.trace_nfe import parse, ITERS  # noqa: E402


def main():
    rows = parse()
    if isinstance(rows, dict):
        cols = rows.get("cols") or []
        names = [c.get("label", c.get("id", "")) for c in cols]
        table = [[c.get("v") for c in r["c"]] for r in rows.get("rows", [])]
    else:
        names, table = rows[0], rows[1:]
    names_l = [str(n).lower() for n in names]

    def col(*cands):
        for cand in cands:
            for i, n in enumerate(names_l):
                if cand in n:
                    return i
        return None

    i_name = col("hlo op name", "op name")
    i_cat = col("hlo op category", "category")
    i_time = col("total time (us)", "self time (us)")
    i_occ = col("occurrences", "#occur")

    times: dict[str, tuple[float, str, int]] = {}
    for r in table:
        cat = str(r[i_cat]) if i_cat is not None else "?"
        if "convolution" in cat or cat == "while":
            continue
        name = str(r[i_name])
        t = float(r[i_time] or 0)
        occ = int(r[i_occ] or 1) if i_occ is not None else 1
        prev = times.get(name, (0.0, cat, 0))
        times[name] = (prev[0] + t, cat, prev[2] + occ)

    hlo = open("/tmp/nfe_hlo.txt").read()
    fus_re = re.compile(r"%?([\w\-]+\.?\d*) = (\([^)]*\)|\S+) fusion\(.*?calls=%?([\w.\-]+)")
    decl = {}
    for m in fus_re.finditer(hlo):
        decl[m.group(1)] = (m.group(2), m.group(3))
    # non-fusion ops: name = shape op(...)
    op_re = re.compile(r"%?([\w\-]+\.?\d*) = (\([^)]*\)|\S+) ([a-z\-]+)\(")
    decl2 = {}
    for m in op_re.finditer(hlo):
        if m.group(1) not in decl:
            decl2[m.group(1)] = (m.group(2), m.group(3))
    comp_re = re.compile(r"%?([\w.\-]+) \(([^)]*)\) -> .*? {\n(.*?)\n}", re.S)
    comps = {m.group(1): m.group(3) for m in comp_re.finditer(hlo)}

    def describe(name):
        if name in decl:
            shape, comp = decl[name]
            body = comps.get(comp, "")
            kinds = re.findall(r"= \S+ ([a-z\-]+)\(", body)
            from collections import Counter

            cnt = Counter(kinds)
            top = ",".join(f"{k}x{v}" for k, v in cnt.most_common(6))
            return shape[:70], top[:90]
        if name in decl2:
            shape, kind = decl2[name]
            return shape[:70], kind
        return "?", "?"

    total = 0.0
    print(f"{'ms/NFE':>8} {'occ':>5} {'category':>16}  name / out shape / body ops")
    for name, (t, cat, occ) in sorted(times.items(), key=lambda kv: -kv[1][0]):
        ms = t / ITERS / 1e3
        total += ms
        if ms < 0.05:
            continue
        shape, body = describe(name)
        print(f"{ms:8.3f} {occ:5d} {cat:>16}  {name}")
        print(f"{'':31}{shape}")
        if body != "?":
            print(f"{'':31}{body}")
    print(f"\nnon-conv total: {total:.1f} ms/NFE")


if __name__ == "__main__":
    main()
