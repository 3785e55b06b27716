"""AnchorHeadMulti (reference
``pcdet/models/dense_heads/anchor_head_multi.py``): a grouped variant of
AnchorHeadSingle — an optional shared conv trunk, then one SingleHead per
class group with its own cls/box/dir 1x1 convs. Targets/losses/decoding
reuse the AnchorHeadSingle machinery restricted to each group's anchors.

Groups follow the reference's RPN_HEAD_CFGS (list of HEAD_CLS_NAME lists);
per-group predictions are concatenated in the global (H, W, C, R) anchor
order so ``targets``/``loss``/``decode_boxes`` of the single-head template
apply unchanged.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .anchor_head import AnchorHeadSingle


class AnchorHeadMulti(AnchorHeadSingle):
    """head_groups: tuple of tuples of class names, e.g.
    (("Car",), ("Pedestrian", "Cyclist")). Class order across groups must
    cover anchor_configs' class order."""
    head_groups: Tuple[Tuple[str, ...], ...] = ()
    shared_conv_channels: int = 64

    def setup(self):
        super().setup()
        names = [cfg["class_name"] for cfg in self.anchor_configs]
        groups = self.head_groups or ((n,) for n in names)
        self._group_idx = [
            tuple(names.index(n) for n in grp) for grp in groups]
        covered = sorted(i for g in self._group_idx for i in g)
        assert covered == list(range(len(names))), (
            "head_groups must cover every anchor class exactly once")
        self.shared_conv = nn.Conv(self.shared_conv_channels, (3, 3),
                                   padding=1, name="shared_conv")
        heads = []
        for gi, grp in enumerate(self._group_idx):
            na = len(grp) * self.num_rot
            heads.append(dict(
                cls=nn.Conv(na * len(grp), (1, 1),
                            bias_init=nn.initializers.constant(-4.595),
                            name=f"head{gi}_cls"),
                box=nn.Conv(na * self.coder.code_size, (1, 1),
                            kernel_init=nn.initializers.normal(0.001),
                            name=f"head{gi}_box"),
                dirc=nn.Conv(na * self.num_dir_bins, (1, 1),
                             name=f"head{gi}_dir"),
            ))
        self.heads = heads

    def __call__(self, bev_features):
        """Per-group predictions scattered back into the global flat
        anchor order (H, W, C, R); group cls logits are padded to the
        full class set (off-group classes get -inf logits, matching the
        reference's per-head class restriction)."""
        b, h, w, _ = bev_features.shape
        x = nn.relu(self.shared_conv(bev_features))
        n_cls = len(self.anchor_configs)
        r = self.num_rot
        neg = jnp.float32(-1e9)
        cls_full = jnp.full((b, h, w, n_cls, r, n_cls), neg)
        box_full = jnp.zeros((b, h, w, n_cls, r, self.coder.code_size))
        dir_full = jnp.zeros((b, h, w, n_cls, r, self.num_dir_bins))
        for head, grp in zip(self.heads, self._group_idx):
            g = len(grp)
            cls = head["cls"](x).reshape(b, h, w, g, r, g)
            box = head["box"](x).reshape(b, h, w, g, r,
                                         self.coder.code_size)
            dirp = head["dirc"](x).reshape(b, h, w, g, r,
                                           self.num_dir_bins)
            for li, ci in enumerate(grp):
                # each group anchor predicts logits for all group classes
                for lj, cj in enumerate(grp):
                    cls_full = cls_full.at[:, :, :, ci, :, cj].set(
                        cls[:, :, :, li, :, lj])
                box_full = box_full.at[:, :, :, ci].set(box[:, :, :, li])
                dir_full = dir_full.at[:, :, :, ci].set(dirp[:, :, :, li])
        a = h * w * n_cls * r
        return dict(cls_preds=cls_full.reshape(b, a, n_cls),
                    box_preds=box_full.reshape(b, a, self.coder.code_size),
                    dir_preds=dir_full.reshape(b, a, self.num_dir_bins))
