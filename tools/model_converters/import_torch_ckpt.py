"""Import reference PyTorch checkpoints into detmatch_tpu parameter trees.

Covers the two pretrained branches DetMatch starts from:
* PV-RCNN (vendored OpenPCDet fork; keys like ``backbone_3d.conv1.0.0.weight``
  — module layout per ``pcdet/models/detectors/detector3d_template.py``)
* Faster R-CNN R50-FPN (external mmdet 2.14; keys like
  ``backbone.layer1.0.conv1.weight``)

Layout bridges (documented per-site below):
* torch Linear (out, in) → flax Dense (in, out): transpose;
* torch Conv2d (out, in, kh, kw) → flax Conv (kh, kw, in, out);
* spconv 1.x SubM/SparseConv3d weight (kz, ky, kx, in, out) → ours
  (K, in, out) with K = kz*ky*kx row-major — same order, pure reshape;
* BatchNorm{1,2}d → MaskedBatchNorm params {scale, bias} +
  batch_stats {mean, var};
* HeightCompression channel order: reference flattens (C, Z) C-outer
  (``height_compression.py:19-22``), ours flattens (Z, C) Z-outer —
  consumers of the 256-ch BEV input (first BEV conv block, VSA fusion's
  BEV slice) get their input-channel axis permuted;
* PVRCNNHead shared FC input order: reference flattens (C, G^3) C-outer
  (``pvrcnn_head.py:110-120``), ours (G^3, C) — permute fc0 rows.

Usage:
    python tools/model_converters/import_torch_ckpt.py pvrcnn in.pth out.msgpack
    python tools/model_converters/import_torch_ckpt.py frcnn in.pth out.msgpack
"""
from __future__ import annotations

import sys

import numpy as np


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _linear(sd, prefix):
    out = {"kernel": _np(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _linear_nchw_flat(sd, prefix, c, h, w):
    """Linear whose torch input is flatten(1) of (R, C, H, W) while the
    flax consumer flattens (R, H, W, C): permute the input dimension
    C-major → H-major (caught by tests/test_frcnn_torch_parity.py —
    without this the first shared FC mixes channels and pixels)."""
    wt = _np(sd[prefix + ".weight"])            # (out, C*H*W)
    wt = wt.reshape(wt.shape[0], c, h, w).transpose(0, 2, 3, 1)
    out = {"kernel": wt.reshape(wt.shape[0], -1).T}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _conv2d(sd, prefix):
    out = {"kernel": _np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _conv1x1_as_dense(sd, prefix):
    """torch Conv2d/Conv1d with 1x1 kernel → flax Dense."""
    w = _np(sd[prefix + ".weight"])
    w = w.reshape(w.shape[0], w.shape[1])  # (out, in)
    out = {"kernel": w.T}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _bn(sd, prefix):
    params = {"scale": _np(sd[prefix + ".weight"]),
              "bias": _np(sd[prefix + ".bias"])}
    stats = {"mean": _np(sd[prefix + ".running_mean"]),
             "var": _np(sd[prefix + ".running_var"])}
    return params, stats


def _spconv_w(sd, prefix):
    w = _np(sd[prefix + ".weight"])  # (kz, ky, kx, in, out)
    return w.reshape(-1, w.shape[-2], w.shape[-1])


def _hc_perm(z, c):
    """Permutation mapping our (Z-outer) BEV channel index to the
    reference's (C-outer) index: ours[z*c + ci] = ref[ci*z + zi]."""
    perm = np.zeros(z * c, np.int64)
    for zi in range(z):
        for ci in range(c):
            perm[zi * c + ci] = ci * z + zi
    return perm


def convert_pvrcnn(sd, hc_z=2, hc_c=128, grid_size=6, sections=None):
    """pcdet PV-RCNN state_dict → (params, batch_stats) for our PVRCNN.

    ``sections``: optional subset of {'backbone_3d', 'backbone_2d',
    'dense_head', 'pfe', 'point_head', 'roi_head'} to convert (default
    all) — lets partial checkpoints / per-module parity tests convert
    only the keys they carry.
    """
    sd = {k: v for k, v in sd.items()}
    if sections is None:
        sections = ("backbone_3d", "backbone_2d", "dense_head", "pfe",
                    "point_head", "roi_head")
    params, stats = {}, {}

    def have(section):
        return section in sections

    def put(path, p, s=None):
        node_p, node_s = params, stats
        for k in path[:-1]:
            node_p = node_p.setdefault(k, {})
            node_s = node_s.setdefault(k, {})
        node_p[path[-1]] = p
        if s is not None:
            node_s[path[-1]] = s

    def put_bn(path, prefix):
        p, s = _bn(sd, prefix)
        put(path, p, s)

    # ---- backbone_3d ----
    if have("backbone_3d"):
        b3 = ["backbone3d"]
        put(b3 + ["conv_input_w"], _spconv_w(sd, "backbone_3d.conv_input.0"))
        put_bn(b3 + ["conv_input_bn"], "backbone_3d.conv_input.1")
        put(b3 + ["conv1_0_w"], _spconv_w(sd, "backbone_3d.conv1.0.0"))
        put_bn(b3 + ["conv1_0_bn"], "backbone_3d.conv1.0.1")
        for lvl in (2, 3, 4):
            put(b3 + [f"conv{lvl}_down_w"],
                _spconv_w(sd, f"backbone_3d.conv{lvl}.0.0"))
            put_bn(b3 + [f"conv{lvl}_down_bn"], f"backbone_3d.conv{lvl}.0.1")
            for j in (0, 1):
                put(b3 + [f"conv{lvl}_{j}_w"],
                    _spconv_w(sd, f"backbone_3d.conv{lvl}.{j + 1}.0"))
                put_bn(b3 + [f"conv{lvl}_{j}_bn"],
                       f"backbone_3d.conv{lvl}.{j + 1}.1")
        put(b3 + ["conv_out_w"], _spconv_w(sd, "backbone_3d.conv_out.0"))
        put_bn(b3 + ["conv_out_bn"], "backbone_3d.conv_out.1")

    # ---- backbone_2d (BaseBEVBackbone) ----
    hc = _hc_perm(hc_z, hc_c)  # shared by backbone_2d + pfe fusion
    if have("backbone_2d"):
        # reference blocks.i: [ZeroPad2d, Conv2d, BN, ReLU] + n x [Conv2d, BN,
        # ReLU] (base_bev_backbone.py:34-60): conv at idx 1, 4, 7, ...
        for i in (0, 1):
            n_layers = 5
            conv = _conv2d(sd, f"backbone_2d.blocks.{i}.1")
            if i == 0:  # consumes the HeightCompression output
                conv["kernel"] = conv["kernel"][:, :, hc, :]
            p, s = _bn(sd, f"backbone_2d.blocks.{i}.2")
            put(["backbone2d", f"block{i}_0", "conv"], conv)
            put(["backbone2d", f"block{i}_0", "bn"], p, s)
            for j in range(n_layers):
                idx = 4 + j * 3
                put(["backbone2d", f"block{i}_{j + 1}", "conv"],
                    _conv2d(sd, f"backbone_2d.blocks.{i}.{idx}"))
                pb, sb = _bn(sd, f"backbone_2d.blocks.{i}.{idx + 1}")
                put(["backbone2d", f"block{i}_{j + 1}", "bn"], pb, sb)
            # deblocks.i: [ConvTranspose2d, BN, ReLU] — the reference uses
            # ConvTranspose2d for every upsample stride >= 1
            # (base_bev_backbone.py:60-71), so the weight layout is
            # (in, out, kh, kw) in BOTH cases. A stride-1 1x1 ConvTranspose
            # equals a 1x1 Conv with the (kh, kw, in, out) reshape; verified
            # numerically vs the real torch module in
            # tests/test_torch_model_parity.py.
            # torch ConvTranspose2d is the gradient-of-conv (spatially
            # flipped kernel); flax nn.ConvTranspose(transpose_kernel=False)
            # applies the kernel unflipped — mirror the spatial axes.
            wt = _np(sd[f"backbone_2d.deblocks.{i}.0.weight"])
            put(["backbone2d", f"deblock{i}", "conv"],
                {"kernel": wt.transpose(2, 3, 0, 1)[::-1, ::-1].copy()})
            pb, sb = _bn(sd, f"backbone_2d.deblocks.{i}.1")
            put(["backbone2d", f"deblock{i}", "bn"], pb, sb)

    # ---- dense_head ----
    if have("dense_head"):
        for ours, ref in (("conv_cls", "conv_cls"), ("conv_box", "conv_box"),
                          ("conv_dir", "conv_dir_cls")):
            put(["dense_head", ours], _conv2d(sd, f"dense_head.{ref}"))

    # ---- pfe (VoxelSetAbstraction) ----
    if have("pfe"):
        def sa_branch(path, prefix, n_groups=2, n_layers=2):
            # reference StackSAModuleMSG mlps.<g>: Sequential(Conv2d, BN2d,
            # ReLU) x n → conv at 3k, bn at 3k+1
            for g in range(n_groups):
                for k in range(n_layers):
                    put(path + [f"mlp{g}", f"dense{k}"],
                        _conv1x1_as_dense(sd, f"{prefix}.mlps.{g}.{3 * k}"))
                    p, s = _bn(sd, f"{prefix}.mlps.{g}.{3 * k + 1}")
                    put(path + [f"mlp{g}", f"bn{k}"], p, s)

        sa_branch(["pfe", "sa_raw_points"], "pfe.SA_rawpoints")
        for li, name in enumerate(("x_conv1", "x_conv2", "x_conv3", "x_conv4")):
            sa_branch(["pfe", f"sa_{name}"], f"pfe.SA_layers.{li}")
        fusion = _linear(sd, "pfe.vsa_point_feature_fusion.0")
        # fusion input = concat(bev 256 | raw 32 | conv1 32 | conv2 64 |
        # conv3 128 | conv4 128); permute the BEV slice rows (C,Z)->(Z,C)
        fusion["kernel"] = np.concatenate(
            [fusion["kernel"][:hc_z * hc_c][hc], fusion["kernel"][hc_z * hc_c:]],
            axis=0)
        put(["pfe", "fusion"], fusion)
        p, s = _bn(sd, "pfe.vsa_point_feature_fusion.1")
        put(["pfe", "fusion_bn"], p, s)

    # ---- point_head ----
    if have("point_head"):
        # make_fc_layers: Linear(bias=False), BN, ReLU per fc + final Linear
        put(["point_head", "cls_mlp", "dense0"],
            _linear(sd, "point_head.cls_layers.0"))
        p, s = _bn(sd, "point_head.cls_layers.1")
        put(["point_head", "cls_mlp", "bn0"], p, s)
        put(["point_head", "cls_mlp", "dense1"],
            _linear(sd, "point_head.cls_layers.3"))
        p, s = _bn(sd, "point_head.cls_layers.4")
        put(["point_head", "cls_mlp", "bn1"], p, s)
        put(["point_head", "cls_out"], _linear(sd, "point_head.cls_layers.6"))

    # ---- roi_head ----
    if have("roi_head"):
        # both radius groups live in mlps.0/mlps.1 of roi_grid_pool_layer
        for g in (0, 1):
            for k in (0, 1):
                put(["roi_head", f"pool_mlp{g}", f"dense{k}"],
                    _conv1x1_as_dense(
                        sd, f"roi_head.roi_grid_pool_layer.mlps.{g}.{3 * k}"))
                p, s = _bn(sd,
                           f"roi_head.roi_grid_pool_layer.mlps.{g}.{3 * k + 1}")
                put(["roi_head", f"pool_mlp{g}", f"bn{k}"], p, s)

        # shared_fc_layer: Conv1d(bias=False), BN1d, ReLU, [Dropout] per fc
        g3 = grid_size ** 3
        fc0 = _conv1x1_as_dense(sd, "roi_head.shared_fc_layer.0")
        cin = fc0["kernel"].shape[0] // g3
        # reference input is (C, G^3) C-outer; ours is (G^3, C)
        perm = np.zeros(g3 * cin, np.int64)
        for gi in range(g3):
            for ci in range(cin):
                perm[gi * cin + ci] = ci * g3 + gi
        fc0["kernel"] = fc0["kernel"][perm]
        put(["roi_head", "shared_fc0"], fc0)
        p, s = _bn(sd, "roi_head.shared_fc_layer.1")
        put(["roi_head", "shared_bn0"], p, s)
        put(["roi_head", "shared_fc1"],
            _conv1x1_as_dense(sd, "roi_head.shared_fc_layer.4"))
        p, s = _bn(sd, "roi_head.shared_fc_layer.5")
        put(["roi_head", "shared_bn1"], p, s)

        for name, ref in (("cls", "cls_layers"), ("reg", "reg_layers")):
            # Conv1d, BN, ReLU, Dropout, Conv1d, BN, ReLU, final Conv1d
            put(["roi_head", f"{name}_fc0"],
                _conv1x1_as_dense(sd, f"roi_head.{ref}.0"))
            p, s = _bn(sd, f"roi_head.{ref}.1")
            put(["roi_head", f"{name}_bn0"], p, s)
            put(["roi_head", f"{name}_fc1"],
                _conv1x1_as_dense(sd, f"roi_head.{ref}.4"))
            p, s = _bn(sd, f"roi_head.{ref}.5")
            put(["roi_head", f"{name}_bn1"], p, s)
            put(["roi_head", f"{name}_out"],
                _conv1x1_as_dense(sd, f"roi_head.{ref}.7"))

    return params, stats


def convert_frcnn(sd):
    """mmdet Faster R-CNN R50-FPN-caffe state_dict → (params, frozen).

    FrozenBN stats live in our separate "frozen" variable collection
    ({scale, bias, mean, var}; see ``models/frcnn/resnet.py:FrozenBN``).
    """
    params, frozen = {}, {}

    def put_in(tree, path, val):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = val

    def put(path, val):
        put_in(params, path, val)

    def frozen_bn(path, prefix):
        put_in(frozen, path, {"scale": _np(sd[prefix + ".weight"]),
                              "bias": _np(sd[prefix + ".bias"]),
                              "mean": _np(sd[prefix + ".running_mean"]),
                              "var": _np(sd[prefix + ".running_var"])})

    bb = ["backbone"]
    put(bb + ["conv1"], _conv2d(sd, "backbone.conv1"))
    frozen_bn(bb + ["bn1"], "backbone.bn1")
    blocks_per = (3, 4, 6, 3)
    for stage in range(4):
        for b in range(blocks_per[stage]):
            pre = f"backbone.layer{stage + 1}.{b}"
            path = bb + [f"layer{stage + 1}_{b}"]
            for c in ("conv1", "conv2", "conv3"):
                put(path + [c], _conv2d(sd, f"{pre}.{c}"))
                frozen_bn(path + [f"bn{c[-1]}"], f"{pre}.bn{c[-1]}")
            if f"{pre}.downsample.0.weight" in sd:
                put(path + ["ds_conv"], _conv2d(sd, f"{pre}.downsample.0"))
                frozen_bn(path + ["ds_bn"], f"{pre}.downsample.1")

    for i in range(4):
        put(["neck", f"lateral{i}"],
            _conv2d(sd, f"neck.lateral_convs.{i}.conv"))
        put(["neck", f"fpn_conv{i}"],
            _conv2d(sd, f"neck.fpn_convs.{i}.conv"))

    put(["rpn_head", "rpn_conv"], _conv2d(sd, "rpn_head.rpn_conv"))
    put(["rpn_head", "rpn_cls"], _conv2d(sd, "rpn_head.rpn_cls"))
    put(["rpn_head", "rpn_reg"], _conv2d(sd, "rpn_head.rpn_reg"))

    put(["bbox_head", "shared_fc0"],
        _linear_nchw_flat(sd, "roi_head.bbox_head.shared_fcs.0",
                          c=256, h=7, w=7))
    put(["bbox_head", "shared_fc1"],
        _linear(sd, "roi_head.bbox_head.shared_fcs.1"))
    put(["bbox_head", "fc_cls"], _linear(sd, "roi_head.bbox_head.fc_cls"))
    put(["bbox_head", "fc_reg"], _linear(sd, "roi_head.bbox_head.fc_reg"))
    return params, frozen


def main():
    if len(sys.argv) != 4 or sys.argv[1] not in ("pvrcnn", "frcnn"):
        print(__doc__)
        sys.exit(1)
    kind, src, dst = sys.argv[1:]
    import torch
    ckpt = torch.load(src, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt.get("model_state", ckpt))
    sd = {k: v for k, v in sd.items() if hasattr(v, "shape")}
    if kind == "pvrcnn":
        params, stats = convert_pvrcnn(sd)
        tree = {"params": params, "batch_stats": stats}
    else:
        params, frozen = convert_frcnn(sd)
        tree = {"params": params, "frozen": frozen}
    import flax.serialization as ser
    with open(dst, "wb") as f:
        f.write(ser.msgpack_serialize(
            __import__("jax").tree.map(np.asarray, tree)))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
