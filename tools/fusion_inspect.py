"""Dump the optimized HLO of the 8-NFE scan program and summarize the named
convolution fusions (what rides along with each conv: extra outputs, reduces,
elementwise chains) so trace times from tools/trace_nfe.py can be attributed.

Usage: python tools/fusion_inspect.py fusion.14410 fusion.14193 ...
       (no args: print the 30 largest conv fusions by body size)
"""

from __future__ import annotations

import re
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/babe_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, "/root/repo")

from tools.trace_nfe import build  # noqa: E402


def main():
    names = [a for a in sys.argv[1:] if a.startswith("fusion")]
    mode = "vjp" if "vjp" in sys.argv[1:] else "fwd"
    jf, x = build(8, 5.0, mode)
    txt = jf.lower(x).compile().as_text()
    with open("/tmp/nfe_hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO dumped: /tmp/nfe_hlo.txt ({len(txt) / 1e6:.1f} MB)", file=sys.stderr)

    # map fusion instruction name -> called computation + shape
    # e.g.  %fusion.14410 = (bf16[...]{...}, ...) fusion(...), kind=kOutput, calls=%fused_computation.123
    fus_re = re.compile(
        r"%?(fusion\.\d+)\s*=\s*(\([^)]*\)|\S+)\s+fusion\(.*?calls=%?([\w.\-]+)", re.S
    )
    fus = {}
    for m in fus_re.finditer(txt):
        fus[m.group(1)] = (m.group(2), m.group(3))

    # computation bodies
    comp_re = re.compile(r"%?([\w.\-]+) \(([^)]*)\) -> .*? {\n(.*?)\n}", re.S)
    comps = {m.group(1): m.group(3) for m in comp_re.finditer(txt)}

    def summarize(name):
        if name not in fus:
            print(f"{name}: NOT FOUND")
            return
        out_shape, comp = fus[name]
        body = comps.get(comp, "")
        ops = re.findall(r"= *([a-z0-9\[\]{}_\-]+\s)?([a-z\-]+)\(", body)
        kinds = {}
        for _, k in ops:
            kinds[k] = kinds.get(k, 0) + 1
        conv_lines = [l.strip() for l in body.splitlines() if "convolution" in l]
        print(f"\n== {name} -> {comp}")
        print(f"   out: {out_shape[:200]}")
        print(f"   ops: {sorted(kinds.items(), key=lambda kv: -kv[1])}")
        for cl in conv_lines[:3]:
            print(f"   {cl[:240]}")

    if names:
        for n in names:
            summarize(n)
    else:
        sizes = sorted(
            ((len(comps.get(c, "")), n) for n, (_, c) in fus.items()), reverse=True
        )[:30]
        for _, n in sizes:
            summarize(n)


if __name__ == "__main__":
    main()
