"""Join the xprof hlo_stats trace (tools/trace_nfe.py run) with the dumped
optimized HLO (/tmp/nfe_hlo.txt from tools/fusion_inspect.py) and print every
convolution fusion's per-NFE time, shape, window and achieved TF/s — the
complete conv time budget by layer shape.

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

    times = {}
    for r in table:
        if i_cat is not None and "convolution" not in str(r[i_cat]):
            continue
        times[str(r[i_name])] = times.get(str(r[i_name]), 0.0) + float(r[i_time] or 0)

    hlo = open("/tmp/nfe_hlo.txt").read()
    # fusion name -> conv line inside its called computation
    fus_re = re.compile(r"%?(fusion\.\d+) = .*? fusion\(.*?calls=%?([\w.\-]+)")
    comp_of = dict(fus_re.findall(hlo))
    comp_re = re.compile(r"%?([\w.\-]+) \([^)]*\) -> [^{]*{\n(.*?)\n}", re.S)
    body_of = {m.group(1): m.group(2) for m in comp_re.finditer(hlo)}
    conv_re = re.compile(
        r"convolution\(.*?window={size=(\S+)( [^}]*)?}", re.S
    )
    shape_re = re.compile(r"(\w+)\[([\d,]+)\]")

    def describe(fname):
        body = body_of.get(comp_of.get(fname, ""), "")
        lines = [l for l in body.splitlines() if " convolution(" in l]
        if not lines:
            return None
        l = lines[0]
        m = shape_re.search(l)
        out = m.group(0) if m else "?"
        w = conv_re.search(l)
        win = (w.group(1) + (w.group(2) or "")) if w else "?"
        n_extra = len([x for x in body.splitlines() if re.search(r"= \S+ (add|multiply|subtract|divide|maximum|exponential|tanh|reduce|compare|select)\(", x)])
        return out, win.strip()[:60], n_extra, len(lines)

    agg = {}
    for fname, us in times.items():
        d = describe(fname)
        key = d if d else (fname, "?", 0, 0)
        key2 = (d[0], d[1]) if d else (fname, "?")
        e = agg.setdefault(key2, [0.0, 0, 0, 0])
        e[0] += us
        e[1] += 1
        if d:
            e[2] = d[2]
            e[3] = d[3]

    total = sum(v[0] for v in agg.values())
    print(f"total conv-fusion time {total / ITERS / 1e3:.1f} ms/NFE\n")
    print("| out shape | window | #fus | extra-elw | ms/NFE | TF/s |")
    print("|---|---|---|---|---|---|")
    for (out, win), (us, cnt, nextra, nconv) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        ms = us / ITERS / 1e3
        m = re.match(r"\w+\[([\d,]+)\]", out)
        tf = ""
        if m:
            dims = [int(x) for x in m.group(1).split(",")]
            if len(dims) == 4:
                B, F, T, C = dims
                sz = re.match(r"(\d+)x(\d+)", win)
                taps = int(sz.group(1)) * int(sz.group(2)) if sz else 15
                # assume Cin from dims unless 2/bpo head convs; approximate
                # Cin=C.  ms sums over all `cnt` fusion instances of this
                # (shape, window), so the per-instance rate needs fl*cnt —
                # omitting that factor once mislabeled the 3-instance
                # (448,20,256) family "61-65 TF/s" when each instance ran at
                # ~190 (PROFILE.md round-3 "unexplained in-situ effect").
                fl = 2 * B * F * T * C * C * taps * max(nconv, 1) * max(cnt, 1)
                tf = f"{fl / (ms / 1e3) / 1e12:.0f}"
        print(f"| {out} | {win} | {cnt}x{nconv} | {nextra} | {ms:7.2f} | {tf} |")


if __name__ == "__main__":
    main()
