#!/usr/bin/env python
"""Prepare a checkpoint for release (reference
``tools/model_converters/publish_model.py``): drop optimizer state and
any training-only entries, re-save, and stamp the output directory name
with a short content hash (the reference appends a sha256 prefix to the
.pth filename).

Usage:
    python tools/model_converters/publish_model.py IN_CKPT_DIR OUT_DIR
"""
import argparse
import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

DROP_KEYS = ("opt_state",)


def tree_hash(tree) -> str:
    """Deterministic content hash over the flattened array tree."""
    import jax
    h = hashlib.sha256()
    leaves, treedef = jax.tree.flatten(tree)
    h.update(str(treedef).encode())
    for leaf in leaves:
        a = np.asarray(leaf)
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    return h.hexdigest()[:8]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("out")
    args = ap.parse_args()

    import jax
    from detmatch_tpu.train import checkpoints

    step = checkpoints.latest_step(args.ckpt)
    if step is None:
        sys.exit(f"no checkpoint under {args.ckpt}")
    payload = checkpoints.restore(args.ckpt, step, None)
    payload = jax.tree.map(np.asarray, jax.device_get(payload))
    kept = {k: v for k, v in payload.items() if k not in DROP_KEYS}
    dropped = sorted(set(payload) - set(kept))

    digest = tree_hash(kept)
    out = args.out.rstrip("/")
    if not out.endswith(digest):
        out = f"{out}-{digest}"
    os.makedirs(out, exist_ok=True)
    checkpoints.save(out, kept, step,
                     meta=checkpoints.default_meta(published=True,
                                                   content_hash=digest))
    print(f"published step {step} → {out} "
          f"(dropped: {dropped or 'nothing'}; hash {digest})")


if __name__ == "__main__":
    main()
