"""Plain-torch PV-RCNN twin with pcdet state-dict key names.

A faithful reimplementation of the reference's PV-RCNN `simple_test`
path in pure torch (the originals need CUDA spconv/pointnet2 kernels):

* ``backbone_3d`` — VoxelBackBone8x as DENSE-equivalent convs
  (``pcdet/models/backbones_3d/spconv_backbone.py:70-199``): SubMConv3d
  = conv3d masked to the input active set, SparseConv3d = strided conv3d
  with the active set grown by the kernel support; BN1d(eval) applied
  channelwise at active sites.
* ``pfe`` — VoxelSetAbstraction
  (``voxel_set_abstraction.py:43-240``): FPS keypoints, per-source
  StackSAModuleMSG ball-query→group→shared-MLP→maxpool (first-nsample
  in scan order, empty balls = MLP_stack(0) — ``pointnet2_utils.py:
  137-153``), BEV bilinear interpolation, Linear+BN fusion.
* ``point_head`` — PointHeadSimple cls MLP.
* ``roi_head`` — PVRCNNHead (``pvrcnn_head.py:8-211``): proposal-layer
  class-agnostic rotated NMS, 6^3 RoI grid pooling through a second
  StackSAModuleMSG, shared/cls/reg Conv1d stacks, and the
  rotate-then-translate box decode (``roi_head_template.py:233-261``).

Module attribute names are chosen so ``state_dict()`` keys are
byte-identical to the reference checkpoints that
``tools/model_converters/import_torch_ckpt.convert_pvrcnn`` consumes.
Everything runs in eval mode (running BN stats) — the converter-parity
tests compare `simple_test` numerics.
"""
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------- utils

def rotate_points_along_z(points, angle):
    """pcdet ``common_utils.rotate_points_along_z`` (row-vector matmul)."""
    cosa, sina = torch.cos(angle), torch.sin(angle)
    zeros = torch.zeros_like(angle)
    ones = torch.ones_like(angle)
    rot = torch.stack([cosa, sina, zeros,
                       -sina, cosa, zeros,
                       zeros, zeros, ones], dim=1).view(-1, 3, 3)
    return torch.matmul(points[:, :, 0:3], rot)


def _box_corners_bev(boxes):
    """(N, 7) lidar boxes → (N, 4, 2) BEV corners."""
    x, y = boxes[:, 0], boxes[:, 1]
    dx, dy, r = boxes[:, 3], boxes[:, 4], boxes[:, 6]
    xs = torch.stack([dx / 2, dx / 2, -dx / 2, -dx / 2], 1)
    ys = torch.stack([dy / 2, -dy / 2, -dy / 2, dy / 2], 1)
    c, s = torch.cos(r)[:, None], torch.sin(r)[:, None]
    cx = xs * c - ys * s + x[:, None]
    cy = xs * s + ys * c + y[:, None]
    return torch.stack([cx, cy], dim=-1)


def _poly_clip(subject, cx1, cy1, cx2, cy2):
    """Sutherland–Hodgman clip of polygon (list of xy) by an AA box."""
    def clip_edge(poly, inside, intersect):
        out = []
        n = len(poly)
        for i in range(n):
            cur, prev = poly[i], poly[i - 1]
            if inside(cur):
                if not inside(prev):
                    out.append(intersect(prev, cur))
                out.append(cur)
            elif inside(prev):
                out.append(intersect(prev, cur))
        return out

    def ix(p, q, axis, val):
        t = (val - p[axis]) / (q[axis] - p[axis] + 1e-12)
        return (p[0] + t * (q[0] - p[0]), p[1] + t * (q[1] - p[1]))

    poly = subject
    for axis, val, keep_ge in ((0, cx1, True), (0, cx2, False),
                               (1, cy1, True), (1, cy2, False)):
        if not poly:
            return poly
        if keep_ge:
            poly = clip_edge(poly, lambda p: p[axis] >= val,
                             lambda p, q: ix(p, q, axis, val))
        else:
            poly = clip_edge(poly, lambda p: p[axis] <= val,
                             lambda p, q: ix(p, q, axis, val))
    return poly


def _convex_clip(subject, clip_poly):
    """Clip convex polygon by convex polygon (CCW assumed not required:
    edges oriented consistently via signed area)."""
    def signed_area(poly):
        a = 0.0
        for i in range(len(poly)):
            x1, y1 = poly[i - 1]
            x2, y2 = poly[i]
            a += x1 * y2 - x2 * y1
        return a / 2.0

    if signed_area(clip_poly) < 0:
        clip_poly = clip_poly[::-1]
    poly = subject
    n = len(clip_poly)
    for i in range(n):
        if not poly:
            return poly
        ax, ay = clip_poly[i - 1]
        bx, by = clip_poly[i]

        def inside(p, ax=ax, ay=ay, bx=bx, by=by):
            return (bx - ax) * (p[1] - ay) - (by - ay) * (p[0] - ax) >= 0

        def intersect(p, q, ax=ax, ay=ay, bx=bx, by=by):
            dx1, dy1 = q[0] - p[0], q[1] - p[1]
            dx2, dy2 = bx - ax, by - ay
            denom = dx1 * dy2 - dy1 * dx2
            t = ((ax - p[0]) * dy2 - (ay - p[1]) * dx2) / (denom + 1e-12)
            return (p[0] + t * dx1, p[1] + t * dy1)

        out = []
        m = len(poly)
        for j in range(m):
            cur, prev = poly[j], poly[j - 1]
            if inside(cur):
                if not inside(prev):
                    out.append(intersect(prev, cur))
                out.append(cur)
            elif inside(prev):
                out.append(intersect(prev, cur))
        poly = out
    return poly


def _poly_area(poly):
    a = 0.0
    for i in range(len(poly)):
        x1, y1 = poly[i - 1]
        x2, y2 = poly[i]
        a += x1 * y2 - x2 * y1
    return abs(a) / 2.0


def boxes_iou_bev(boxes_a, boxes_b):
    """Rotated BEV IoU (pcdet ``iou3d_nms_utils.boxes_iou_bev``
    semantics via exact convex polygon intersection)."""
    ca = _box_corners_bev(boxes_a).numpy()
    cb = _box_corners_bev(boxes_b).numpy()
    area_a = (boxes_a[:, 3] * boxes_a[:, 4]).numpy()
    area_b = (boxes_b[:, 3] * boxes_b[:, 4]).numpy()
    out = np.zeros((len(ca), len(cb)), np.float32)
    for i in range(len(ca)):
        pa = [tuple(p) for p in ca[i]]
        for j in range(len(cb)):
            pb = [tuple(p) for p in cb[j]]
            inter = _poly_area(_convex_clip(pa, pb))
            union = area_a[i] + area_b[j] - inter
            out[i, j] = inter / max(union, 1e-12)
    return torch.from_numpy(out)


def nms_gpu(boxes, scores, thresh, **kw):
    """pcdet ``iou3d_nms_utils.nms_gpu`` semantics: greedy rotated-BEV
    NMS over score-descending boxes (inputs arrive pre-sorted from
    class_agnostic_nms's topk)."""
    n = boxes.shape[0]
    keep = []
    suppressed = np.zeros(n, bool)
    iou = boxes_iou_bev(boxes, boxes).numpy()
    for i in range(n):
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > thresh
        suppressed[i] = True
    return torch.tensor(keep, dtype=torch.long), scores[torch.tensor(
        keep, dtype=torch.long)] if keep else scores[:0]


def class_agnostic_nms(box_scores, box_preds, nms_cfg):
    """pcdet ``model_nms_utils.class_agnostic_nms`` (no score_thresh)."""
    k = min(nms_cfg["NMS_PRE_MAXSIZE"], box_scores.shape[0])
    scores_nms, indices = torch.topk(box_scores, k=k)
    keep_idx, _ = nms_gpu(box_preds[indices, 0:7], scores_nms,
                          nms_cfg["NMS_THRESH"])
    return indices[keep_idx[:nms_cfg["NMS_POST_MAXSIZE"]]]


def furthest_point_sample(xyz, npoint):
    """pcdet ``pointnet2_stack_utils.furthest_point_sample``: greedy,
    seeded at index 0, first-occurrence argmax."""
    n = xyz.shape[0]
    dist = torch.full((n,), 1e10)
    idxs = torch.zeros(npoint, dtype=torch.long)
    farthest = 0
    for i in range(npoint):
        idxs[i] = farthest
        d = ((xyz - xyz[farthest]) ** 2).sum(-1)
        dist = torch.minimum(dist, d)
        farthest = int(torch.argmax(dist))
    return idxs


def ball_query(radius, nsample, xyz, new_xyz):
    """pcdet stack ``ball_query``: per center, first ``nsample`` points
    (index scan order) within ``radius``; empty-fill with the first
    found; returns (idx (M, nsample), empty_mask (M,))."""
    d2 = ((new_xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
    within = d2 < radius ** 2
    m = new_xyz.shape[0]
    idx = torch.zeros((m, nsample), dtype=torch.long)
    empty = torch.zeros(m, dtype=torch.bool)
    for i in range(m):
        hits = torch.nonzero(within[i]).view(-1)[:nsample]
        if len(hits) == 0:
            empty[i] = True
        else:
            idx[i, :len(hits)] = hits
            idx[i, len(hits):] = hits[0]
    return idx, empty


class StackSAModuleMSGTwin(nn.Module):
    """StackSAModuleMSG (``pointnet2_modules.py:10-94``) with dense
    ball query / grouping; parameter layout identical (``mlps.<g>``
    Sequential(Conv2d, BN2d, ReLU) × L)."""

    def __init__(self, radii, nsamples, mlps):
        super().__init__()
        self.radii, self.nsamples = radii, nsamples
        self.mlps = nn.ModuleList()
        for spec in mlps:
            layers = []
            for k in range(len(spec) - 1):
                layers += [nn.Conv2d(spec[k], spec[k + 1], 1, bias=False),
                           nn.BatchNorm2d(spec[k + 1], eps=1e-5),
                           nn.ReLU()]
            self.mlps.append(nn.Sequential(*layers))

    def forward(self, xyz, new_xyz, features=None):
        """Single batch: xyz (N, 3), new_xyz (M, 3), features (N, C)."""
        outs = []
        for g, (radius, nsample) in enumerate(zip(self.radii,
                                                  self.nsamples)):
            idx, empty = ball_query(radius, nsample, xyz, new_xyz)
            grouped_xyz = xyz[idx] - new_xyz[:, None, :]  # (M, ns, 3)
            grouped_xyz[empty] = 0
            if features is not None:
                gf = features[idx]  # (M, ns, C)
                gf[empty] = 0
                grouped = torch.cat([grouped_xyz, gf], dim=-1)
            else:
                grouped = grouped_xyz
            # (M, ns, C) → (1, C, M, ns)
            x = grouped.permute(2, 0, 1).unsqueeze(0)
            x = self.mlps[g](x)
            x = F.max_pool2d(x, kernel_size=[1, x.size(3)]).squeeze(-1)
            outs.append(x.squeeze(0).permute(1, 0))  # (M, C')
        return torch.cat(outs, dim=1)


# ------------------------------------------------------- 3D backbone

class _SpConv3d(nn.Module):
    """Weight container matching vendored spconv (``conv.py:98-99``):
    Parameter shape (*kernel_size, in, out), no bias."""

    def __init__(self, cin, cout, ksize, stride=1, padding=0):
        super().__init__()
        if not isinstance(ksize, (tuple, list)):
            ksize = (ksize,) * 3
        self.ksize, self.cin, self.cout = tuple(ksize), cin, cout
        self.stride = (stride if isinstance(stride, (tuple, list))
                       else (stride,) * 3)
        self.padding = (padding if isinstance(padding, (tuple, list))
                        else (padding,) * 3)
        self.weight = nn.Parameter(torch.randn(*ksize, cin, cout) * 0.1)

    def dense_w(self):
        # (kz, ky, kx, in, out) → torch conv3d (out, in, kz, ky, kx)
        return self.weight.permute(4, 3, 0, 1, 2).contiguous()


class _SparseBlockTwin(nn.Module):
    """[conv, BN1d, ReLU] with dense-equivalent sparse semantics."""

    def __init__(self, cin, cout, ksize, stride=1, padding=0,
                 subm=True):
        super().__init__()
        self.subm = subm
        conv = _SpConv3d(cin, cout, ksize, stride, padding)
        bn = nn.BatchNorm1d(cout, eps=1e-3, momentum=0.01)
        self.block = nn.Sequential(conv, bn, nn.ReLU())

    def forward(self, dense, mask):
        conv, bn = self.block[0], self.block[1]
        x = F.conv3d(dense, conv.dense_w(), stride=tuple(conv.stride),
                     padding=tuple(conv.padding))
        if self.subm:
            assert tuple(conv.stride) == (1, 1, 1)
            out_mask = mask
        else:
            om = F.conv3d(mask[:, None].float(),
                          torch.ones((1, 1) + conv.ksize),
                          stride=tuple(conv.stride),
                          padding=tuple(conv.padding))
            out_mask = om[:, 0] > 0
        # eval BN: channelwise affine, then re-mask (inactive = absent)
        rm = bn.running_mean[None, :, None, None, None]
        rv = bn.running_var[None, :, None, None, None]
        w = bn.weight[None, :, None, None, None]
        b = bn.bias[None, :, None, None, None]
        x = (x - rm) / torch.sqrt(rv + bn.eps) * w + b
        x = F.relu(x)
        return x * out_mask[:, None].float(), out_mask


class VoxelBackBone8xTwin(nn.Module):
    """``VoxelBackBone8x`` (``spconv_backbone.py:70-199``), state-dict
    compatible (conv_input/conv1..4/conv_out with [conv, bn] indices)."""

    def __init__(self, cin=4, channels=(16, 16, 32, 64, 64), cout=128):
        super().__init__()
        c1, c1b, c2, c3, c4 = channels
        self.conv_input = _SparseBlockTwin(cin, c1, 3, 1, 1).block
        self.conv1 = nn.ModuleList(
            [_SparseBlockTwin(c1, c1b, 3, 1, 1).block])
        self.conv2 = nn.ModuleList([
            _SparseBlockTwin(c1b, c2, 3, 2, 1, subm=False).block,
            _SparseBlockTwin(c2, c2, 3, 1, 1).block,
            _SparseBlockTwin(c2, c2, 3, 1, 1).block])
        self.conv3 = nn.ModuleList([
            _SparseBlockTwin(c2, c3, 3, 2, 1, subm=False).block,
            _SparseBlockTwin(c3, c3, 3, 1, 1).block,
            _SparseBlockTwin(c3, c3, 3, 1, 1).block])
        self.conv4 = nn.ModuleList([
            _SparseBlockTwin(c3, c4, 3, 2, (0, 1, 1), subm=False).block,
            _SparseBlockTwin(c4, c4, 3, 1, 1).block,
            _SparseBlockTwin(c4, c4, 3, 1, 1).block])
        self.conv_out = _SparseBlockTwin(
            c4, cout, (3, 1, 1), (2, 1, 1), 0, subm=False).block

    @staticmethod
    def _run(seq_or_list, dense, mask):
        blocks = (list(seq_or_list) if isinstance(seq_or_list,
                                                  nn.ModuleList)
                  else [seq_or_list])
        for blk in blocks:
            subm = tuple(blk[0].stride) == (1, 1, 1)
            helper = _SparseBlockTwin.__new__(_SparseBlockTwin)
            nn.Module.__init__(helper)
            helper.subm = subm
            helper.block = blk
            dense, mask = helper(dense, mask)
        return dense, mask

    def forward(self, dense, mask):
        """dense (B, C, Z, Y, X); mask (B, Z, Y, X) active sites."""
        x, m = self._run(self.conv_input, dense, mask)
        x1, m1 = self._run(self.conv1, x, m)
        x2, m2 = self._run(self.conv2, x1, m1)
        x3, m3 = self._run(self.conv3, x2, m2)
        x4, m4 = self._run(self.conv4, x3, m3)
        out, mo = self._run(self.conv_out, x4, m4)
        return dict(x_conv1=(x1, m1), x_conv2=(x2, m2),
                    x_conv3=(x3, m3), x_conv4=(x4, m4), out=(out, mo))


# ------------------------------------------------------------ VSA etc.

def bilinear_interpolate_torch(im, x, y):
    """pcdet ``bilinear_interpolate_torch`` (clamped corners)."""
    x0 = torch.clamp(torch.floor(x).long(), 0, im.shape[1] - 1)
    x1 = torch.clamp(x0 + 1, 0, im.shape[1] - 1)
    y0 = torch.clamp(torch.floor(y).long(), 0, im.shape[0] - 1)
    y1 = torch.clamp(y0 + 1, 0, im.shape[0] - 1)
    Ia, Ib = im[y0, x0], im[y1, x0]
    Ic, Id = im[y0, x1], im[y1, x1]
    wa = (x1.float() - x) * (y1.float() - y)
    wb = (x1.float() - x) * (y - y0.float())
    wc = (x - x0.float()) * (y1.float() - y)
    wd = (x - x0.float()) * (y - y0.float())
    return (Ia * wa[:, None] + Ib * wb[:, None] + Ic * wc[:, None]
            + Id * wd[:, None])


class VSATwin(nn.Module):
    """``VoxelSetAbstraction`` with the DetMatch source set
    (bev + raw_points + x_conv1..4)."""

    SA_CFG = dict(
        raw_points=dict(radii=[0.4, 0.8], nsamples=[16, 16],
                        mlps=[[1, 16, 16], [1, 16, 16]]),
        x_conv1=dict(radii=[0.4, 0.8], nsamples=[16, 16],
                     mlps=[[16, 16, 16], [16, 16, 16]], stride=1),
        x_conv2=dict(radii=[0.8, 1.2], nsamples=[16, 32],
                     mlps=[[32, 32, 32], [32, 32, 32]], stride=2),
        x_conv3=dict(radii=[1.2, 2.4], nsamples=[16, 32],
                     mlps=[[64, 64, 64], [64, 64, 64]], stride=4),
        x_conv4=dict(radii=[2.4, 4.8], nsamples=[16, 32],
                     mlps=[[64, 64, 64], [64, 64, 64]], stride=8),
    )

    def __init__(self, voxel_size, pc_range, num_keypoints,
                 num_bev_features=256, num_out=128):
        super().__init__()
        self.voxel_size, self.pc_range = voxel_size, pc_range
        self.num_keypoints = num_keypoints
        c_in = num_bev_features
        mk = lambda cfg, use_xyz=True: StackSAModuleMSGTwin(  # noqa:E731
            cfg["radii"], cfg["nsamples"],
            [[m[0] + 3] + m[1:] for m in cfg["mlps"]])
        rp = dict(self.SA_CFG["raw_points"])
        rp["mlps"] = [[1] + m[1:] for m in rp["mlps"]]
        self.SA_rawpoints = mk(rp)
        c_in += sum(m[-1] for m in rp["mlps"]) * 1
        self.SA_layers = nn.ModuleList()
        self.layer_names = []
        for name in ("x_conv1", "x_conv2", "x_conv3", "x_conv4"):
            cfg = self.SA_CFG[name]
            self.SA_layers.append(mk(cfg))
            self.layer_names.append(name)
            c_in += sum(m[-1] for m in cfg["mlps"])
        self.vsa_point_feature_fusion = nn.Sequential(
            nn.Linear(c_in, num_out, bias=False),
            nn.BatchNorm1d(num_out), nn.ReLU())

    def voxel_centers(self, zyx_idx, stride):
        vs = torch.tensor(self.voxel_size) * stride
        org = torch.tensor(self.pc_range[:3])
        xyz = zyx_idx.flip(-1).float()
        return (xyz + 0.5) * vs + org

    def forward(self, points, bev_features, ms, bev_stride=8):
        """Single batch: points (N, 4); bev_features (H, W, C);
        ms: dict name → (zyx_idx (Nv, 3), feats (Nv, C))."""
        kp_idx = furthest_point_sample(points[:, :3].contiguous(),
                                       self.num_keypoints)
        keypoints = points[kp_idx, :3]

        feats = []
        x_idx = (keypoints[:, 0] - self.pc_range[0]) / self.voxel_size[0]
        y_idx = (keypoints[:, 1] - self.pc_range[1]) / self.voxel_size[1]
        feats.append(bilinear_interpolate_torch(
            bev_features, x_idx / bev_stride, y_idx / bev_stride))
        feats.append(self.SA_rawpoints(
            points[:, :3].contiguous(), keypoints,
            points[:, 3:].contiguous()))
        for name, sa in zip(self.layer_names, self.SA_layers):
            zyx, f = ms[name]
            xyz = self.voxel_centers(zyx, self.SA_CFG[name]["stride"])
            feats.append(sa(xyz, keypoints, f))
        cat = torch.cat(feats, dim=1)
        fused = self.vsa_point_feature_fusion(cat)
        return keypoints, fused, cat


class PointHeadTwin(nn.Module):
    """``PointHeadSimple`` cls branch (make_fc_layers: Linear(bias=F),
    BN, ReLU × 2 + final Linear)."""

    def __init__(self, cin, fcs=(256, 256), num_class=3):
        super().__init__()
        layers = []
        pre = cin
        for f in fcs:
            layers += [nn.Linear(pre, f, bias=False),
                       nn.BatchNorm1d(f), nn.ReLU()]
            pre = f
        layers.append(nn.Linear(pre, num_class, bias=True))
        self.cls_layers = nn.Sequential(*layers)

    def forward(self, x):
        return self.cls_layers(x)


class RoIHeadTwin(nn.Module):
    """``PVRCNNHead`` second stage (grid pool + FC heads + decode)."""

    def __init__(self, cin=128, grid_size=6,
                 pool_radii=(0.8, 1.6), pool_ns=(16, 16),
                 pool_mlps=((64, 64), (64, 64)),
                 shared_fc=(256, 256), cls_fc=(256, 256),
                 reg_fc=(256, 256), num_class=1, dp_ratio=0.3):
        super().__init__()
        self.grid_size = grid_size
        self.roi_grid_pool_layer = StackSAModuleMSGTwin(
            list(pool_radii), list(pool_ns),
            [[cin + 3] + list(m) for m in pool_mlps])
        c_out = sum(m[-1] for m in pool_mlps)
        pre = grid_size ** 3 * c_out
        sl = []
        for k, f in enumerate(shared_fc):
            sl += [nn.Conv1d(pre, f, 1, bias=False),
                   nn.BatchNorm1d(f), nn.ReLU()]
            pre = f
            if k != len(shared_fc) - 1 and dp_ratio > 0:
                sl.append(nn.Dropout(dp_ratio))
        self.shared_fc_layer = nn.Sequential(*sl)

        def fc_stack(fcs, out):
            layers, p = [], pre
            for k, f in enumerate(fcs):
                layers += [nn.Conv1d(p, f, 1, bias=False),
                           nn.BatchNorm1d(f), nn.ReLU()]
                p = f
                if k == 0 and dp_ratio > 0:
                    layers.append(nn.Dropout(dp_ratio))
            layers.append(nn.Conv1d(p, out, 1, bias=True))
            return nn.Sequential(*layers)

        self.cls_layers = fc_stack(cls_fc, num_class)
        self.reg_layers = fc_stack(reg_fc, 7 * num_class)

    def grid_points(self, rois):
        """``get_dense_grid_points`` + rotate + translate."""
        n = rois.shape[0]
        g = self.grid_size
        ones = torch.ones((g, g, g))
        dense_idx = ones.nonzero().float()  # (g^3, 3) [x, y, z]
        dense_idx = dense_idx[None].repeat(n, 1, 1)
        sizes = rois[:, 3:6]
        local = ((dense_idx + 0.5) / g * sizes[:, None]
                 - sizes[:, None] / 2)
        rot = rotate_points_along_z(local.clone(), rois[:, 6])
        return rot + rois[:, None, 0:3]

    def forward(self, rois, keypoints, point_features, point_scores):
        """Single batch: rois (R, 7), keypoints (M, 3),
        point_features (M, C), point_scores (M,)."""
        pf = point_features * point_scores[:, None]
        grid = self.grid_points(rois)  # (R, g^3, 3)
        pooled = self.roi_grid_pool_layer(
            keypoints, grid.view(-1, 3), pf)  # (R*g^3, C)
        g3 = self.grid_size ** 3
        pooled = pooled.view(-1, g3, pooled.shape[-1])
        # (R, g^3, C) → (R, C, g^3) → (R, C*g^3, 1): C-major flatten
        x = pooled.permute(0, 2, 1).contiguous().view(
            pooled.shape[0], -1, 1)
        shared = self.shared_fc_layer(x)
        rcnn_cls = self.cls_layers(shared).squeeze(-1)  # (R, 1)
        rcnn_reg = self.reg_layers(shared).squeeze(-1)  # (R, 7)
        boxes = self.decode(rois, rcnn_reg)
        return rcnn_cls, rcnn_reg, boxes

    @staticmethod
    def decode(rois, reg):
        """``roi_head_template.generate_predicted_boxes:233-261``."""
        roi_ry = rois[:, 6]
        roi_xyz = rois[:, 0:3]
        local = rois.clone()
        local[:, 0:3] = 0
        xa, ya, za = local[:, 0], local[:, 1], local[:, 2]
        dxa, dya, dza, ra = (local[:, 3], local[:, 4], local[:, 5],
                             local[:, 6])
        xt, yt, zt, dxt, dyt, dzt, rt = [reg[:, i] for i in range(7)]
        diag = torch.sqrt(dxa ** 2 + dya ** 2)
        xg = xt * diag + xa
        yg = yt * diag + ya
        zg = zt * dza + za
        dxg, dyg, dzg = (torch.exp(dxt) * dxa, torch.exp(dyt) * dya,
                         torch.exp(dzt) * dza)
        rg = rt + ra
        dec = torch.stack([xg, yg, zg, dxg, dyg, dzg, rg], dim=-1)
        rot = rotate_points_along_z(dec[:, None, 0:3], roi_ry).squeeze(1)
        dec = torch.cat([rot + roi_xyz, dec[:, 3:]], dim=-1)
        return dec
