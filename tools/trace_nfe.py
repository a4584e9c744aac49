"""Capture an xprof device trace of the fused denoiser (8 NFE in one jitted
scan) on the real TPU and print a per-HLO-op self-time breakdown.

This is the ground-truth complement to the scan-amortized wall timings in
tools/profile_components.py: it attributes every microsecond of device time
to a named HLO op (conv fusions vs loop fusions vs reduces vs copies), so
"where do the non-conv milliseconds go" stops being a cost-model estimate.

Usage:  python tools/trace_nfe.py [batch] [seconds]
Writes the raw trace under /tmp/xprof_nfe/ and prints two tables:
  * by-category totals (convolution / fusion / reduce / copy / fft / other)
  * top-40 individual ops by total self time.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/babe_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, "/root/repo")

from __graft_entry__ import _flagship_args  # noqa: E402
from babe_tpu.diffusion.edm import EDM, EDMParams  # noqa: E402
from babe_tpu.models.cqtdiff import CQTDiffPlus  # noqa: E402

LOGDIR = "/tmp/xprof_nfe"
ITERS = 8


def build(batch: int, seconds: float, mode: str = "fwd"):
    fs = 22050
    L = int(fs * seconds)
    args = _flagship_args(audio_len=L)
    # BABE_REMAT=full|save_convs wraps each ResnetBlock in jax.checkpoint —
    # A/B harness for recompute-vs-save in the guided vjp (tools/time_nfe.py)
    rp = os.environ.get("BABE_REMAT", "")
    if rp:
        args.exp.remat = True
        args.exp.remat_policy = rp
    model = CQTDiffPlus.from_config(args)
    variables = model.init(jax.random.PRNGKey(0), batch=1)
    edm = EDM(EDMParams(sigma_data=0.063, sigma_min=1e-4, sigma_max=1.0,
                        ro=8, ro_train=13, Schurn=20))
    den = model.fused_denoiser(variables, edm)
    sig = jnp.full((batch, 1), 0.1)

    if mode == "vjp":
        # the guided-sampling cost: forward + cotangent pullback through
        # the denoiser (testing/blind_bwe_sampler.py:75-135 semantics)
        def step(c):
            xhat, vjpf = jax.vjp(lambda xx: den(xx, sig), c)
            return vjpf(xhat)[0]
    else:
        def step(c):
            return den(c, sig)

    def looped(x):
        def body(c, _):
            return step(c), None

        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.sum(jnp.abs(out).astype(jnp.float32))

    x = jax.random.normal(jax.random.PRNGKey(1), (batch, L), jnp.float32)
    return jax.jit(looped), x


def capture(jf, x):
    np.asarray(jf(x))  # compile + warm
    np.asarray(jf(x))
    os.makedirs(LOGDIR, exist_ok=True)
    with jax.profiler.trace(LOGDIR):
        np.asarray(jf(x))


def parse():
    from xprof.convert import raw_to_tool_data as rtd

    paths = glob.glob(os.path.join(LOGDIR, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit("no xplane.pb captured")
    paths.sort(key=os.path.getmtime)
    data, _ = rtd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", "replace")
    rows = json.loads(data)
    return rows


def summarize(rows, batch):
    # hlo_stats schema: list with header row or dict of columns; handle both
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
    i_time = col("total time (us)", "self time (us)", "self-time", "total self time")
    i_prog = col("program id")
    if i_time is None or i_name is None:
        print("columns:", names)
        raise SystemExit("unrecognized hlo_stats schema")

    cat_tot: dict[str, float] = {}
    op_tot: dict[str, tuple[float, str]] = {}
    total = 0.0
    for r in table:
        t = float(r[i_time] or 0.0)
        cat = str(r[i_cat]) if i_cat is not None else "?"
        name = str(r[i_name])
        total += t
        cat_tot[cat] = cat_tot.get(cat, 0.0) + t
        prev = op_tot.get(name, (0.0, cat))
        op_tot[name] = (prev[0] + t, cat)

    per_nfe = total / ITERS / 1e3
    print(f"\ntotal device time {total / 1e3:.1f} ms for {ITERS} NFE "
          f"(batch {batch}) -> {per_nfe:.1f} ms/NFE\n")
    print("| category | ms/NFE | % |")
    print("|---|---|---|")
    for c, t in sorted(cat_tot.items(), key=lambda kv: -kv[1]):
        print(f"| {c} | {t / ITERS / 1e3:8.2f} | {100 * t / total:5.1f} |")
    print("\ntop 40 ops (ms/NFE):")
    for name, (t, cat) in sorted(op_tot.items(), key=lambda kv: -kv[1][0])[:40]:
        print(f"  {t / ITERS / 1e3:8.3f}  [{cat:>14s}]  {name[:110]}")
    # full itemization for bucket attribution (tools/fusion_inspect.py maps
    # the names back to their HLO bodies)
    with open("/tmp/nfe_ops.tsv", "w") as f:
        for name, (t, cat) in sorted(op_tot.items(), key=lambda kv: -kv[1][0]):
            f.write(f"{t / ITERS / 1e3:.4f}\t{cat}\t{name}\n")
    print("\nfull per-op table: /tmp/nfe_ops.tsv")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
    mode = sys.argv[3] if len(sys.argv) > 3 else "fwd"
    jf, x = build(batch, seconds, mode)
    t0 = time.time()
    capture(jf, x)
    print(f"capture done in {time.time() - t0:.1f}s", file=sys.stderr)
    summarize(parse(), batch)


if __name__ == "__main__":
    main()
