#!/usr/bin/env python
"""Fold BatchNorm statistics into preceding convolutions in a checkpoint
(reference ``tools/misc/fuse_conv_bn.py``).

On GPU/torch this saves a separate BN kernel at inference; under XLA the
BN elementwise chain is already fused into the conv at compile time, so
this is a checkpoint-level transformation for export/interop parity, not
a speed knob. The fold is exact and structure-preserving: for every
subtree shaped like flax ``Conv (use_bias=False) + BatchNorm`` pairs
(kernel + {scale, bias} params + {mean, var} batch_stats):

    kernel' = kernel * (scale / sqrt(var + eps))      (per out-channel)
    BN'     = identity transform carrying the residual shift
              (scale=1, mean=0, var=1-eps, bias = bias - mean*scale*inv)

so ``BN'(conv'(x)) == BN(conv(x))`` bit-for-near-bit and the module
structure (and any code that loads the tree) is unchanged.

Usage:
    python tools/misc/fuse_conv_bn.py CKPT_DIR OUT_DIR [--eps 1e-5]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

EPS = 1e-5


def _is_bn_params(node):
    return (isinstance(node, dict) and set(node) >= {"scale", "bias"}
            and getattr(node.get("scale"), "ndim", None) == 1)


def fuse_tree(params, stats, eps=EPS, path=()):
    """Recursively fold (conv kernel, BN) sibling pairs in place.

    Returns the number of folded pairs. A pair is a module subtree whose
    params contain both a conv child ({kernel} with 4/5-D kernel, no
    bias) and a BN child ({scale, bias}) that has matching batch_stats
    ({mean, var}) — the ConvBNReLU layout used by the BEV backbone
    (``models/pvrcnn/bev.py``) and the dense heads.
    """
    if not isinstance(params, dict):
        return 0
    n = 0
    convs = {k: v for k, v in params.items()
             if isinstance(v, dict) and "kernel" in v
             and getattr(v["kernel"], "ndim", 0) >= 3 and "bias" not in v}
    bns = {k: v for k, v in params.items()
           if _is_bn_params(v) and isinstance(stats, dict) and k in stats
           and set(stats[k]) >= {"mean", "var"}}
    if len(convs) == 1 and len(bns) == 1:
        (ck, cv), (bk, bv) = next(iter(convs.items())), \
            next(iter(bns.items()))
        st = stats[bk]
        if cv["kernel"].shape[-1] == bv["scale"].shape[0]:
            inv = bv["scale"] / np.sqrt(st["var"] + eps)
            cv["kernel"] = (np.asarray(cv["kernel"])
                            * np.asarray(inv)).astype(
                np.asarray(cv["kernel"]).dtype)
            bv["bias"] = np.asarray(
                bv["bias"] - st["mean"] * inv, np.float32)
            bv["scale"] = np.ones_like(np.asarray(bv["scale"]))
            st["mean"] = np.zeros_like(np.asarray(st["mean"]))
            st["var"] = np.full_like(np.asarray(st["var"]), 1.0 - eps)
            n += 1
    for k, v in params.items():
        sub_stats = stats.get(k, {}) if isinstance(stats, dict) else {}
        n += fuse_tree(v, sub_stats, eps, path + (k,))
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("out")
    ap.add_argument("--eps", type=float, default=EPS)
    args = ap.parse_args()

    import jax
    from detmatch_tpu.train import checkpoints

    step = checkpoints.latest_step(args.ckpt)
    payload = checkpoints.restore(args.ckpt, step, None)
    payload = jax.tree.map(np.asarray, jax.device_get(payload))

    total = 0

    def walk(node):
        nonlocal total
        if isinstance(node, dict) and "params" in node \
                and "batch_stats" in node:
            total += fuse_tree(node["params"], node["batch_stats"],
                               args.eps)
        elif isinstance(node, dict):
            for v in node.values():
                walk(v)

    walk(payload)
    os.makedirs(args.out, exist_ok=True)
    checkpoints.save(args.out, payload, step)
    print(f"fused {total} conv+BN pairs → {args.out} (step {step})")


if __name__ == "__main__":
    main()
