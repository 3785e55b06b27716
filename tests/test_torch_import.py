"""Converter structural parity: a synthetic reference-layout state_dict
(exact pcdet / mmdet key names and torch tensor layouts) must convert into
a tree that matches our models' init trees leaf-for-leaf."""
import importlib.util
import os

import numpy as np
import jax
import jax.numpy as jnp

spec = importlib.util.spec_from_file_location(
    "import_torch_ckpt",
    os.path.join(os.path.dirname(__file__), "..", "tools",
                 "model_converters", "import_torch_ckpt.py"))
conv = importlib.util.module_from_spec(spec)
spec.loader.exec_module(conv)


def _tree_specs(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_specs(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = tuple(v.shape)
    return out


def _fake_pcdet_sd():
    """Reference PV-RCNN state dict skeleton (names & torch layouts) for
    the DetMatch KITTI config; shapes per SURVEY.md §2.2."""
    rng = np.random.RandomState(0)
    sd = {}

    def t(name, *shape):
        sd[name] = rng.randn(*shape).astype(np.float32)

    def bn(name, c):
        t(name + ".weight", c)
        t(name + ".bias", c)
        t(name + ".running_mean", c)
        sd[name + ".running_var"] = np.abs(
            rng.randn(c).astype(np.float32)) + 0.5

    # backbone_3d
    t("backbone_3d.conv_input.0.weight", 3, 3, 3, 4, 16)
    bn("backbone_3d.conv_input.1", 16)
    t("backbone_3d.conv1.0.0.weight", 3, 3, 3, 16, 16)
    bn("backbone_3d.conv1.0.1", 16)
    chans = {2: (16, 32), 3: (32, 64), 4: (64, 64)}
    for lvl, (ci, co) in chans.items():
        t(f"backbone_3d.conv{lvl}.0.0.weight", 3, 3, 3, ci, co)
        bn(f"backbone_3d.conv{lvl}.0.1", co)
        for j in (1, 2):
            t(f"backbone_3d.conv{lvl}.{j}.0.weight", 3, 3, 3, co, co)
            bn(f"backbone_3d.conv{lvl}.{j}.1", co)
    t("backbone_3d.conv_out.0.weight", 3, 1, 1, 64, 128)
    bn("backbone_3d.conv_out.1", 128)

    # backbone_2d
    for i, (ci, co) in enumerate(((256, 128), (128, 256))):
        t(f"backbone_2d.blocks.{i}.1.weight", co, ci, 3, 3)
        bn(f"backbone_2d.blocks.{i}.2", co)
        # real layout: [ZeroPad2d, Conv, BN, ReLU] + 5 x [Conv, BN, ReLU]
        # → convs at 1, 4, 7, ... (verified vs the real torch module in
        # test_torch_model_parity.py)
        for j in range(5):
            idx = 4 + j * 3
            t(f"backbone_2d.blocks.{i}.{idx}.weight", co, co, 3, 3)
            bn(f"backbone_2d.blocks.{i}.{idx + 1}", co)
    t("backbone_2d.deblocks.0.0.weight", 128, 256, 1, 1)  # ConvT 1x1 s1
    bn("backbone_2d.deblocks.0.1", 256)
    t("backbone_2d.deblocks.1.0.weight", 256, 256, 2, 2)  # ConvTranspose2d
    bn("backbone_2d.deblocks.1.1", 256)

    # dense_head (na=6 anchors/loc, 3 classes, 7 code, 2 dir bins)
    t("dense_head.conv_cls.weight", 18, 512, 1, 1)
    t("dense_head.conv_cls.bias", 18)
    t("dense_head.conv_box.weight", 42, 512, 1, 1)
    t("dense_head.conv_box.bias", 42)
    t("dense_head.conv_dir_cls.weight", 12, 512, 1, 1)
    t("dense_head.conv_dir_cls.bias", 12)

    # pfe
    def sa(prefix, cin, widths_by_group):
        for g, widths in enumerate(widths_by_group):
            c = cin
            for k, w in enumerate(widths):
                t(f"{prefix}.mlps.{g}.{3 * k}.weight", w, c, 1, 1)
                bn(f"{prefix}.mlps.{g}.{3 * k + 1}", w)
                c = w

    sa("pfe.SA_rawpoints", 4, ((16, 16), (16, 16)))
    sa("pfe.SA_layers.0", 19, ((16, 16), (16, 16)))
    sa("pfe.SA_layers.1", 35, ((32, 32), (32, 32)))
    sa("pfe.SA_layers.2", 67, ((64, 64), (64, 64)))
    sa("pfe.SA_layers.3", 67, ((64, 64), (64, 64)))
    t("pfe.vsa_point_feature_fusion.0.weight", 128, 640)
    bn("pfe.vsa_point_feature_fusion.1", 128)

    # point_head
    t("point_head.cls_layers.0.weight", 256, 640)
    bn("point_head.cls_layers.1", 256)
    t("point_head.cls_layers.3.weight", 256, 256)
    bn("point_head.cls_layers.4", 256)
    t("point_head.cls_layers.6.weight", 1, 256)
    t("point_head.cls_layers.6.bias", 1)

    # roi_head
    sa("roi_head.roi_grid_pool_layer", 131, ((64, 64), (64, 64)))
    t("roi_head.shared_fc_layer.0.weight", 256, 128 * 216, 1)
    bn("roi_head.shared_fc_layer.1", 256)
    t("roi_head.shared_fc_layer.4.weight", 256, 256, 1)
    bn("roi_head.shared_fc_layer.5", 256)
    for name in ("cls_layers", "reg_layers"):
        t(f"roi_head.{name}.0.weight", 256, 256, 1)
        bn(f"roi_head.{name}.1", 256)
        t(f"roi_head.{name}.4.weight", 256, 256, 1)
        bn(f"roi_head.{name}.5", 256)
        out = 1 if name == "cls_layers" else 7
        t(f"roi_head.{name}.7.weight", out, 256, 1)
        t(f"roi_head.{name}.7.bias", out)
    return sd


def test_pvrcnn_import_matches_model_tree():
    import __graft_entry__ as g
    from detmatch_tpu.models.pvrcnn.pvrcnn import PVRCNN

    params, stats = conv.convert_pvrcnn(_fake_pcdet_sd())

    model = PVRCNN(**g.ENTRY_CFG)
    batch = g._make_batch(g.ENTRY_CFG, b=1, p=1024, max_voxels=2000)
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False))
    want_p = _tree_specs(jax.tree.map(lambda x: x, variables["params"]))
    got_p = _tree_specs(params)
    missing = sorted(set(want_p) - set(got_p))
    extra = sorted(set(got_p) - set(want_p))
    assert not missing, f"missing params: {missing[:8]}"
    assert not extra, f"extra params: {extra[:8]}"
    for k in want_p:
        assert want_p[k] == got_p[k], (k, want_p[k], got_p[k])

    want_s = _tree_specs(variables["batch_stats"])
    got_s = _tree_specs(stats)
    assert set(want_s) == set(got_s), (
        sorted(set(want_s) ^ set(got_s))[:8])


def _fake_mmdet_sd():
    rng = np.random.RandomState(1)
    sd = {}

    def t(name, *shape):
        sd[name] = rng.randn(*shape).astype(np.float32)

    def bn(name, c):
        for suf in ("weight", "bias", "running_mean"):
            t(f"{name}.{suf}", c)
        sd[name + ".running_var"] = np.abs(
            rng.randn(c).astype(np.float32)) + 0.5

    t("backbone.conv1.weight", 64, 3, 7, 7)
    bn("backbone.bn1", 64)
    blocks = (3, 4, 6, 3)
    cin = 64
    for s in range(4):
        w = 64 * 2 ** s
        for b in range(blocks[s]):
            pre = f"backbone.layer{s + 1}.{b}"
            t(f"{pre}.conv1.weight", w, cin if b == 0 else w * 4, 1, 1)
            bn(f"{pre}.bn1", w)
            t(f"{pre}.conv2.weight", w, w, 3, 3)
            bn(f"{pre}.bn2", w)
            t(f"{pre}.conv3.weight", w * 4, w, 1, 1)
            bn(f"{pre}.bn3", w * 4)
            if b == 0:
                t(f"{pre}.downsample.0.weight", w * 4,
                  cin, 1, 1)
                bn(f"{pre}.downsample.1", w * 4)
        cin = w * 4
    for i, c in enumerate((256, 512, 1024, 2048)):
        t(f"neck.lateral_convs.{i}.conv.weight", 256, c, 1, 1)
        t(f"neck.lateral_convs.{i}.conv.bias", 256)
        t(f"neck.fpn_convs.{i}.conv.weight", 256, 256, 3, 3)
        t(f"neck.fpn_convs.{i}.conv.bias", 256)
    t("rpn_head.rpn_conv.weight", 256, 256, 3, 3)
    t("rpn_head.rpn_conv.bias", 256)
    t("rpn_head.rpn_cls.weight", 3, 256, 1, 1)
    t("rpn_head.rpn_cls.bias", 3)
    t("rpn_head.rpn_reg.weight", 12, 256, 1, 1)
    t("rpn_head.rpn_reg.bias", 12)
    t("roi_head.bbox_head.shared_fcs.0.weight", 1024, 256 * 49)
    t("roi_head.bbox_head.shared_fcs.0.bias", 1024)
    t("roi_head.bbox_head.shared_fcs.1.weight", 1024, 1024)
    t("roi_head.bbox_head.shared_fcs.1.bias", 1024)
    t("roi_head.bbox_head.fc_cls.weight", 4, 1024)
    t("roi_head.bbox_head.fc_cls.bias", 4)
    t("roi_head.bbox_head.fc_reg.weight", 12, 1024)
    t("roi_head.bbox_head.fc_reg.bias", 12)
    return sd


def test_frcnn_import_matches_model_tree():
    from detmatch_tpu.models.frcnn.faster_rcnn import FasterRCNN

    params, frozen = conv.convert_frcnn(_fake_mmdet_sd())
    model = FasterRCNN()
    images = jnp.zeros((1, 128, 128, 3))
    shapes = jnp.asarray([[128.0, 128.0]])
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, images,
                           shapes, train=False))
    want_p = _tree_specs(variables["params"])
    got_p = _tree_specs(params)
    missing = sorted(set(want_p) - set(got_p))
    extra = sorted(set(got_p) - set(want_p))
    assert not missing, f"missing params: {missing[:8]}"
    assert not extra, f"extra params: {extra[:8]}"
    for k in want_p:
        assert want_p[k] == got_p[k], (k, want_p[k], got_p[k])
    want_f = _tree_specs(variables["frozen"])
    got_f = _tree_specs(frozen)
    assert set(want_f) == set(got_f)
