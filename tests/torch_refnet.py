"""Torch re-implementation of the reference forward path — TEST-ONLY.

A CPU stand-in for the reference network (multi_model/utils/pointnet2.py,
reproduced from its behavioral spec in SURVEY.md §2.2-2.3, not copied) whose
``state_dict()`` uses the reference's parameter names, so it can drive
``utils/torch_import.convert_torch_state_dicts`` end-to-end:

    torch init -> state_dict -> converter -> our flax trees
    torch forward  vs  our forward   (must match to float tolerance)

This makes value-level golden parity automatic the day real reference
weights surface (VERDICT round 1, task 5).

Deterministic index path: FPS starts at index 0 with first-index argmax
ties (sampling_kernel.cu:65), ball query keeps the FIRST <=K in-radius
points in index order padding with the first hit (ball_query_kernel.cu:
62-69), 3-NN is an ascending insertion sort (interpolate_kernel.cu:28-128).

Documented deviations from the reference (kept consistent with our model):
  * RefineNet consumes the pooled 256-d gripper features concat the first
    128 dims of the correct proposal's group feature — the sane fix of the
    reference's view(-1,128) reinterpretation (models/heads.py:77-84);
  * conv_score's bias is zeroed: the converter never imports conv biases
    because every reference conv with a bias feeds a BatchNorm whose
    running mean absorbs it in trained checkpoints.
"""

from __future__ import annotations

import numpy as np
import torch
from torch import nn


# --------------------------------------------------------------------- ops

def fps(xyz: torch.Tensor, num_samples: int) -> torch.Tensor:
    """xyz [B, N, 3] -> [B, num_samples] (starts at 0, first-index ties)."""
    B, N, _ = xyz.shape
    idx = torch.zeros(B, num_samples, dtype=torch.long)
    dist = torch.full((B, N), 1e10)
    farthest = torch.zeros(B, dtype=torch.long)
    for i in range(num_samples):
        idx[:, i] = farthest
        centroid = xyz[torch.arange(B), farthest][:, None]
        dist = torch.minimum(dist, ((xyz - centroid) ** 2).sum(-1))
        farthest = dist.argmax(1)
    return idx


def ball_query_exact(xyz: torch.Tensor, centers: torch.Tensor,
                     radius: float, k: int) -> torch.Tensor:
    """First <=k in-radius points per center, in index order, padded with
    the row's first hit (0 when the row has no hit)."""
    d2 = ((centers[:, :, None] - xyz[:, None]) ** 2).sum(-1)   # [B, M, N]
    mask = (d2 < radius * radius).numpy()
    B, M, _ = mask.shape
    idx = np.zeros((B, M, k), np.int64)
    for b in range(B):
        for m in range(M):
            hits = np.flatnonzero(mask[b, m])[:k]
            if len(hits):
                row = np.full(k, hits[0])
                row[:len(hits)] = hits
                idx[b, m] = row
    return torch.from_numpy(idx)


def three_nn(query: torch.Tensor, key: torch.Tensor, k: int = 3):
    """[B,N1,3], [B,N2,3] -> (index [B,N1,k], squared dists ascending)."""
    d2 = ((query[:, :, None] - key[:, None]) ** 2).sum(-1)
    dist, idx = torch.topk(d2, k, dim=-1, largest=False, sorted=True)
    return idx, dist


def gather_points(points: torch.Tensor, idx: torch.Tensor) -> torch.Tensor:
    """points [B, N, C], idx [B, ...] -> [B, ..., C]."""
    B = points.shape[0]
    flat = idx.reshape(B, -1)
    out = torch.stack([points[b, flat[b]] for b in range(B)])
    return out.reshape(*idx.shape, points.shape[-1])


# ------------------------------------------------------------------ layers

class _Block(nn.Module):
    """conv(1x1, no bias) + BN + optional ReLU; submodule names .conv/.bn
    match the reference Conv1d/Conv2d blocks (nn/modules/conv.py)."""

    def __init__(self, cin: int, cout: int, ndim: int, relu: bool = True):
        super().__init__()
        Conv = nn.Conv1d if ndim == 1 else nn.Conv2d
        BN = nn.BatchNorm1d if ndim == 1 else nn.BatchNorm2d
        self.conv = Conv(cin, cout, 1, bias=False)
        self.bn = BN(cout)
        self.relu = relu

    def forward(self, x):
        x = self.bn(self.conv(x))
        return torch.relu(x) if self.relu else x


def _randomize_bn(module: nn.Module, rng: np.random.RandomState):
    """Random BN affine + running stats so the parity check exercises the
    converter's batch_stats mapping, not just identity stats."""
    for m in module.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            n = m.num_features
            with torch.no_grad():
                m.weight.copy_(torch.from_numpy(
                    rng.uniform(0.5, 1.5, n).astype(np.float32)))
                m.bias.copy_(torch.from_numpy(
                    rng.normal(0, 0.1, n).astype(np.float32)))
                m.running_mean.copy_(torch.from_numpy(
                    rng.normal(0, 0.1, n).astype(np.float32)))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.5, 1.5, n).astype(np.float32)))


# ------------------------------------------------------------------ models

class _SAModule(nn.Module):
    def __init__(self, num_centroids, radius, k, cin, channels):
        super().__init__()
        self.num_centroids, self.radius, self.k = num_centroids, radius, k
        self.mlp = nn.ModuleList()
        c = cin + 3     # use_xyz: group_xyz concat features (modules.py:50)
        for ch in channels:
            self.mlp.append(_Block(c, ch, ndim=2))
            c = ch

    def forward(self, xyz, feature):
        """xyz [B,N,3], feature [B,N,C]|None -> (new_xyz, feat [B,S,C'])."""
        idx = fps(xyz, self.num_centroids)
        new_xyz = gather_points(xyz, idx)
        nidx = ball_query_exact(xyz, new_xyz, self.radius, self.k)
        group_xyz = gather_points(xyz, nidx) - new_xyz[:, :, None]
        if feature is not None:
            group = torch.cat([group_xyz, gather_points(feature, nidx)],
                              dim=-1)
        else:
            group = group_xyz
        h = group.permute(0, 3, 1, 2)            # [B, C, S, K]
        for blk in self.mlp:
            h = blk(h)
        return new_xyz, h.max(dim=-1).values.permute(0, 2, 1)


class _FPModule(nn.Module):
    def __init__(self, cin, channels):
        super().__init__()
        self.mlp = nn.ModuleList()
        c = cin
        for ch in channels:
            self.mlp.append(_Block(c, ch, ndim=1))
            c = ch

    def forward(self, dense_xyz, sparse_xyz, dense_feat, sparse_feat):
        idx, d2 = three_nn(dense_xyz, sparse_xyz)
        inv = 1.0 / torch.clamp(d2, min=1e-10)   # modules.py:117-122
        w = inv / inv.sum(-1, keepdim=True)
        neigh = gather_points(sparse_feat, idx)              # [B,N1,3,C]
        interp = (neigh * w[..., None]).sum(dim=2)
        if dense_feat is not None:
            interp = torch.cat([interp, dense_feat], dim=-1)
        h = interp.permute(0, 2, 1)
        for blk in self.mlp:
            h = blk(h)
        return h.permute(0, 2, 1)


class TorchPointNet2Seg(nn.Module):
    """state_dict names: sa_modules.{i}.mlp.{j}.{conv,bn}, fp_modules...,
    mlp.{j} (seg head), conv_score, bn_score (pointnet2.py:40-84)."""

    def __init__(self, cfg):
        super().__init__()
        self.sa_modules = nn.ModuleList()
        cin = cfg.input_channels - 3
        for i in range(len(cfg.num_centroids)):
            self.sa_modules.append(_SAModule(
                cfg.num_centroids[i], cfg.radii[i], cfg.num_neighbours[i],
                cin, cfg.sa_channels[i]))
            cin = cfg.sa_channels[i][-1]
        self.fp_modules = nn.ModuleList()
        sa_out = [cfg.input_channels - 3] + [c[-1] for c in cfg.sa_channels]
        sparse_c = sa_out[-1]
        for i in range(len(cfg.fp_channels)):
            dense_c = sa_out[-2 - i]
            self.fp_modules.append(_FPModule(sparse_c + dense_c,
                                             cfg.fp_channels[i]))
            sparse_c = cfg.fp_channels[i][-1]
        self.mlp = nn.ModuleList()
        c = sparse_c
        for ch in cfg.seg_channels:
            self.mlp.append(_Block(c, ch, ndim=1))
            c = ch
        self.conv_score = nn.Conv1d(c, 1, 1)     # bias zeroed (module doc)
        self.bn_score = nn.BatchNorm1d(1)
        with torch.no_grad():
            self.conv_score.bias.zero_()

    def forward(self, pc):
        """pc [B, N, 6] -> (feature [B, N, C_fp], score [B, N])."""
        xyz, feature = pc[..., :3], pc[..., 3:]
        inter_xyz, inter_feat = [xyz], [feature]
        for sa in self.sa_modules:
            xyz, feature = sa(xyz, feature)
            inter_xyz.append(xyz)
            inter_feat.append(feature)
        sparse_xyz, sparse_feat = xyz, feature
        for i, fp in enumerate(self.fp_modules):
            dense_xyz = inter_xyz[-2 - i]
            sparse_feat = fp(dense_xyz, sparse_xyz, inter_feat[-2 - i],
                             sparse_feat)
            sparse_xyz = dense_xyz
        h = sparse_feat.permute(0, 2, 1)
        for blk in self.mlp:
            h = blk(h)                           # dropout: eval -> identity
        score = torch.sigmoid(self.bn_score(self.conv_score(h)))
        return sparse_feat, score[:, 0, :]


class TorchScoreNet(nn.Module):
    """Reference ScoreNetwork shell: the backbone lives under the
    ``extrat_featurePN2`` attribute (score_network.py:13)."""

    def __init__(self, cfg):
        super().__init__()
        self.extrat_featurePN2 = TorchPointNet2Seg(cfg)

    def forward(self, pc):
        return self.extrat_featurePN2(pc)


class TorchTwoStage(nn.Module):
    """Reference PointNet2TwoStage head (pointnet2.py:123-197); attribute
    names produce the state_dict keys _REGION_MAP expects."""

    def __init__(self, cfg):
        super().__init__()
        C = cfg.feature_channels
        A, R = cfg.num_anchors, cfg.reg_channels
        self.conv, self.bn = nn.Conv1d(C, 1024, 1, bias=False), \
            nn.BatchNorm1d(1024)
        self.conv_cls2, self.bn_cls2 = nn.Conv1d(1024, 256, 1, bias=False), \
            nn.BatchNorm1d(256)
        self.conv_cls3, self.bn_cls3 = nn.Conv1d(256, 128, 1, bias=False), \
            nn.BatchNorm1d(128)
        self.conv_cls4, self.bn_cls4 = nn.Conv1d(128, A, 1, bias=False), \
            nn.BatchNorm1d(A)
        self.conv_reg2, self.bn_reg2 = nn.Conv1d(1024, 256, 1, bias=False), \
            nn.BatchNorm1d(256)
        self.conv_reg3, self.bn_reg3 = nn.Conv1d(256, 128, 1, bias=False), \
            nn.BatchNorm1d(128)
        self.conv_reg4, self.bn_reg4 = nn.Conv1d(
            128, A * R, 1, bias=False), nn.BatchNorm1d(A * R)
        self.A, self.R = A, R

    def forward(self, group_feature):
        """group_feature [B, NC, NG, C] -> (cls [B,NC,A], reg [B,NC,A,R],
        pooled [B,NC,C])."""
        B, NC = group_feature.shape[:2]
        pooled = group_feature.max(dim=2).values          # [B, NC, C]
        x = pooled.reshape(B * NC, -1, 1)                 # rows = proposals
        x = torch.relu(self.bn(self.conv(x)))
        c = torch.relu(self.bn_cls2(self.conv_cls2(x)))
        c = torch.relu(self.bn_cls3(self.conv_cls3(c)))
        c = self.bn_cls4(self.conv_cls4(c))
        r = torch.relu(self.bn_reg2(self.conv_reg2(x)))
        r = torch.relu(self.bn_reg3(self.conv_reg3(r)))
        r = self.bn_reg4(self.conv_reg4(r))
        r = r.reshape(B, NC, self.A, self.R)
        r = torch.cat([r[..., :7], torch.sigmoid(r[..., 7:])], dim=-1)
        return c.reshape(B, NC, self.A), r, pooled


class TorchRefine(nn.Module):
    """Reference PointNet2Refine head (pointnet2.py:199-254), with our
    documented sane fix of the group-feature slice."""

    def __init__(self, cfg):
        super().__init__()
        C = cfg.feature_channels + cfg.refine_group_channels
        R = cfg.reg_channels
        self.conv_formal, self.bn_formal = \
            nn.Conv1d(C, 1024, 1, bias=False), nn.BatchNorm1d(1024)
        self.conv_formal_cls2, self.bn_formal_cls2 = \
            nn.Conv1d(1024, 128, 1, bias=False), nn.BatchNorm1d(128)
        self.conv_formal_cls3, self.bn_formal_cls3 = \
            nn.Conv1d(128, 2, 1, bias=False), nn.BatchNorm1d(2)
        self.conv_formal_reg2, self.bn_formal_reg2 = \
            nn.Conv1d(1024, 128, 1, bias=False), nn.BatchNorm1d(128)
        self.conv_formal_reg3, self.bn_formal_reg3 = \
            nn.Conv1d(128, R, 1, bias=False), nn.BatchNorm1d(R)
        self.slice = cfg.refine_group_channels

    def forward(self, gripper_feature, group_feature):
        """gripper_feature [B,NC,K,C], group_feature [B,NC,C] ->
        (cls [B,NC,2], reg [B,NC,R])."""
        B, NC = gripper_feature.shape[:2]
        pooled = gripper_feature.max(dim=2).values
        x = torch.cat([pooled, group_feature[..., :self.slice]], dim=-1)
        x = x.reshape(B * NC, -1, 1)
        x = torch.relu(self.bn_formal(self.conv_formal(x)))
        c = torch.relu(self.bn_formal_cls2(self.conv_formal_cls2(x)))
        c = self.bn_formal_cls3(self.conv_formal_cls3(c))
        r = torch.relu(self.bn_formal_reg2(self.conv_formal_reg2(x)))
        r = self.bn_formal_reg3(self.conv_formal_reg3(r))
        return c.reshape(B, NC, 2), r.reshape(B, NC, -1)
