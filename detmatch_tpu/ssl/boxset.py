"""BoxSet: the fixed-shape currency of the SSL pipeline.

The reference passes ``list[tuple(bboxes, scores, ...)]`` of ragged
per-image tensors between SSL modules (``ssl_modules/utils.py``); here a
BoxSet is a dict pytree of fixed-capacity arrays:

    boxes:  (B, K, D)   D = 7 (3D) or 4 (2D xyxy)
    scores: (B, K, C)   per-class sigmoid scores (bg column NOT stored:
                        modules strip it at the source, mirroring the
                        reference's cls_includes_bg_pred handling)
    valid:  (B, K) bool

Filtering never changes shapes — it clears validity bits. Gathering
(matching) produces index maps + validity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def make(boxes, scores, valid):
    return dict(boxes=boxes, scores=scores, valid=valid)


def detach(bs):
    """DetachBboxes (``processors_3d.py:60-78``)."""
    return jax.tree.map(jax.lax.stop_gradient, bs)


def max_score_filter(bs, score_thr):
    """MaxScoreFilter (``processors_fusion.py:10-48``): keep boxes whose max
    class score exceeds the threshold. (Scores are stored bg-stripped, so no
    cls_includes_bg_pred branch is needed here.)"""
    max_s = jnp.max(bs["scores"], axis=-1)
    return dict(boxes=bs["boxes"], scores=bs["scores"],
                valid=bs["valid"] & (max_s > score_thr))


def gather(bs, idx, valid):
    """Select slots by per-image index maps (B, K') + validity."""
    b = jax.vmap(lambda x, i: x[i])
    out = dict(
        boxes=b(bs["boxes"], idx),
        scores=b(bs["scores"], idx),
        valid=jax.vmap(lambda v, i: v[i])(bs["valid"], idx) & valid,
    )
    out["boxes"] = jnp.where(out["valid"][..., None], out["boxes"], 0.0)
    out["scores"] = jnp.where(out["valid"][..., None], out["scores"], 0.0)
    return out


def average(bs1, bs2):
    """AverageBboxes_2D (``processors_2d.py:196-241``): element-wise average
    of two slot-aligned box/score sets (variant configs)."""
    valid = bs1["valid"] & bs2["valid"]
    return dict(
        boxes=jnp.where(valid[..., None],
                        (bs1["boxes"] + bs2["boxes"]) / 2.0, 0.0),
        scores=jnp.where(valid[..., None],
                         (bs1["scores"] + bs2["scores"]) / 2.0, 0.0),
        valid=valid,
    )


def num_valid(bs):
    """NumPreds metric (``metrics.py:10-24``): mean #boxes per image."""
    return jnp.mean(jnp.sum(bs["valid"].astype(jnp.float32), axis=-1))


def topk(bs, k):
    """Compact a BoxSet to its k highest-scoring valid slots.

    Exact (a pure re-indexing) whenever the set has <= k valid boxes —
    the common case after max_score_filter; used to bound the Hungarian
    matcher's square cost matrix (O(K^3) augmenting loop).
    """
    score = jnp.where(bs["valid"], jnp.max(bs["scores"], axis=-1), -1e30)
    _, idx = jax.lax.top_k(score, k)  # (B, k)
    taken_valid = jnp.take_along_axis(bs["valid"], idx, axis=1)
    return gather(bs, idx, taken_valid)
