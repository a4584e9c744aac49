"""PyTorch checkpoint -> JAX pytree conversion for CQTDiff+ weights.

The published BABE checkpoints (HuggingFace ``Eloimoliner/babe``, loaded by the
reference through a 7-strategy legacy cascade — utils/training_utils.py:223-403)
are torch pickles whose module tree is ``Unet_CQT_oct_with_attention``
(networks/cqtdiff+.py).  Our flax modules mirror that tree with underscored
names ("downs.0.2.H.3.weight" -> params/downs_0_2/H_3/conv/kernel), so the
conversion is a mechanical walk:

  * Conv2d  weight (O,I,kh,kw) -> kernel (kh,kw,I,O)
  * Conv1d  weight (O,I,k)     -> kernel (k,I,O)
  * Linear  weight (O,I)       -> kernel (I,O)
  * Embedding weight kept as-is (relative_attention_bias)
  * BiasFreeGroupNorm gamma (1,C,1,1) -> (C,)
  * non-trainable RFF buffers -> the "buffers" collection
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def extract_network_state(ckpt: Mapping[str, Any], prefer: str = "ema") -> dict:
    """Pull a network state-dict out of the reference's checkpoint formats
    (mirrors the fallback cascade in utils/training_utils.py:223-403)."""
    if not isinstance(ckpt, Mapping):
        raise TypeError("checkpoint must be a dict-like object")
    def strip_prefixes(sd: Mapping) -> dict:
        # dance-diffusion style: 'diffusion_ema.' / 'diffusion.' prefixed keys
        for prefix in ("diffusion_ema.", "diffusion."):
            sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
            if sub:
                return sub
        return dict(sd)

    candidates = [prefer, "ema", "network", "ema_model", "state_dict", "model"]
    for key in candidates:
        sd = ckpt.get(key)
        if isinstance(sd, Mapping) and any(
            hasattr(v, "shape") for v in sd.values()
        ):
            return strip_prefixes(sd)
    # maybe the checkpoint *is* the raw state dict
    if any(hasattr(v, "shape") for v in ckpt.values()):
        return strip_prefixes(ckpt)
    raise ValueError(f"no network weights found; top-level keys: {list(ckpt)[:10]}")


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _flax_path(torch_key: str) -> list[str]:
    """'downs.0.2.H.3.weight' -> ['downs_0_2', 'H_3', 'weight'] (kind last)."""
    tokens = torch_key.split(".")
    out: list[str] = []
    for tok in tokens:
        if tok.isdigit() and out:
            out[-1] = f"{out[-1]}_{tok}"
        else:
            out.append(tok)
    return out


def convert_state_dict(state_dict: Mapping[str, Any]) -> dict:
    """torch state-dict -> {'params': ..., 'buffers': ...} nested dicts."""
    params: dict = {}
    buffers: dict = {}

    def insert(tree: dict, path: list[str], value: np.ndarray):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for key, tensor in state_dict.items():
        arr = _to_numpy(tensor).astype(np.float32)
        path = _flax_path(key)
        kind = path[-1]
        struct = path[:-1]

        if kind == "kernel" and struct and struct[-1].endswith(("samplerT", "samplerF")):
            continue  # fixed resampling kernels are compile-time constants here
        if kind == "RFF_freq":
            if struct and struct[0].startswith("freq_encodings"):
                continue  # derived; our module stores only the embeddings table
            insert(buffers, struct + ["RFF_freq"], arr)
        elif kind == "embeddings":
            insert(buffers, struct + ["embeddings"], arr.reshape(arr.shape[-2:]))
        elif kind == "gamma":
            insert(params, struct + ["gamma"], arr.reshape(-1))
        elif kind == "fembeddings":
            # denoiser AddFreqEncoding table (networks/denoiser.py:134-169)
            insert(params, struct[:-1] + ["freq_encoding_fembeddings"], arr)
        elif kind == "weight":
            if struct and struct[-1] == "relative_attention_bias":
                insert(params, struct[:-1] + ["relative_attention_bias"], arr)
            elif arr.ndim == 4 and struct and "tconv" in struct[-1]:
                # ConvTranspose2d (in,out,kh,kw) -> flax transpose_kernel
                # layout (kh,kw,out,in)
                insert(params, struct + ["kernel"], arr.transpose(2, 3, 1, 0))
            elif arr.ndim == 4:
                insert(params, struct + ["kernel"], arr.transpose(2, 3, 1, 0))
            elif arr.ndim == 3:
                insert(params, struct + ["kernel"], arr.transpose(2, 1, 0))
            elif arr.ndim == 2:
                insert(params, struct + ["kernel"], arr.transpose(1, 0))
            else:
                raise ValueError(f"unexpected weight rank for {key}: {arr.shape}")
        elif kind == "bias":
            if arr.ndim == 1:
                insert(params, struct + ["bias"], arr)
            else:
                raise ValueError(f"unexpected bias rank for {key}: {arr.shape}")
        elif kind == "scale":  # LayerScale — defined but unused in fwd path
            insert(params, struct + ["scale"], arr)
        else:
            raise ValueError(f"unrecognized parameter kind in key {key!r}")

    return {"params": params, "buffers": buffers}


def _tree_paths(tree: Mapping, prefix=()) -> dict[tuple, np.ndarray]:
    flat = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            flat.update(_tree_paths(v, prefix + (k,)))
        else:
            flat[prefix + (k,)] = v
    return flat


def fill_variables(template: Mapping, converted: Mapping, strict: bool = True) -> dict:
    """Pour converted weights into a flax variables template (shape-checked).

    template: the result of model.init (collections params/buffers).
    converted: output of convert_state_dict.
    """
    import jax

    tflat = {}
    for coll in template:
        tflat.update(_tree_paths({coll: template[coll]}))
    cflat = {}
    for coll in ("params", "buffers"):
        if coll in converted:
            cflat.update(_tree_paths({coll: converted[coll]}))

    # our CQTDiff Conv wrappers nest an extra 'conv' module level; remap
    # converted paths onto the template accordingly
    remapped = {}
    for path, val in cflat.items():
        if path in tflat:
            remapped[path] = val
            continue
        alt = path[:-1] + ("conv", path[-1])
        if alt in tflat:
            remapped[alt] = val
            continue
        if len(path) >= 3:  # merged module names ('finalblock','conv2') ->
            alt2 = path[:-3] + (path[-3] + "_" + path[-2], path[-1])
            if alt2 in tflat:
                remapped[alt2] = val
                continue
        remapped[path] = val
    cflat = remapped

    missing = sorted(set(map(str, tflat)) - set(map(str, cflat)))
    extra = sorted(set(map(str, cflat)) - set(map(str, tflat)))
    if strict and (missing or extra):
        raise ValueError(
            f"checkpoint/model mismatch.\n missing ({len(missing)}): {missing[:8]}"
            f"\n extra ({len(extra)}): {extra[:8]}"
        )

    out = {}
    for path, tval in tflat.items():
        if path in cflat:
            cval = cflat[path]
            if tuple(cval.shape) != tuple(np.shape(tval)):
                raise ValueError(
                    f"shape mismatch at {'/'.join(path)}: "
                    f"ckpt {cval.shape} vs model {np.shape(tval)}"
                )
            val = cval
        else:
            val = np.asarray(tval)
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jax.numpy.asarray(val)
    return out


def load_torch_checkpoint(path: str, prefer: str = "ema") -> dict:
    """torch.load + extract + convert. Returns {'params':..., 'buffers':...}."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = extract_network_state(ckpt, prefer=prefer)
    return convert_state_dict(sd)
