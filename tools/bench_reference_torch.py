"""Exact re-timing harness for the reference's per-step work, in PyTorch.

BASELINE.md: "the reference publishes no benchmark numbers ... step one of
benchmarking is to instrument and run the reference itself (or an exact
re-timing harness)". The reference scripts hard-require CUDA; this harness
reproduces the same per-step computation with stock torch ops so it runs on
whatever torch device is available here (CPU in this container, CUDA when
present) and records clips/sec for ``bench.py``'s ``vs_baseline``.

Workload per step (cn3d_train_apperance_GL.py:223-333):
  (640, 512, 4) points -> all-pairs dist + topk(64) + ball fixup + gather
  (utils_my.py:255-291) -> conv/BN/ReLU encoder with local+global heads
  (cn3d_model_conbag.py:213-234) -> global-local + circle InfoNCE
  (:265-316) -> backward -> Adam step.

This is an independent re-implementation from documented semantics (not a
copy): modules are built programmatically and losses are vectorized.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def group(points, S=64, K=64, radius_sq=0.06):
    # points: (B, N, C)
    B, N, C = points.shape
    xyz = points[:, :, :3]
    cent = xyz[:, :S]
    d = torch.cdist(cent, xyz) ** 2                       # (B, S, N)
    dists, idx = torch.topk(d, K, dim=2, largest=False)
    rows = torch.arange(S, device=points.device).view(1, S, 1)
    idx = torch.where(dists > radius_sq, rows, idx)
    g = torch.gather(points.unsqueeze(1).expand(B, S, N, C), 2,
                     idx.unsqueeze(-1).expand(B, S, K, C)).clone()
    g[..., :3] -= cent.unsqueeze(2)
    return g, cent


class Encoder(nn.Module):
    def __init__(self, G=10):
        super().__init__()
        self.G = G

        def block(widths, cin):
            layers = []
            for w in widths:
                layers += [nn.Linear(cin, w), nn.BatchNorm1d(w), nn.ReLU()]
                cin = w
            return nn.Sequential(*layers)

        self.sa = block((64, 64, 256), 4)
        self.stage2 = block((256, 512, 1024), 259)
        self.head = nn.Sequential(nn.Linear(1024, 1024), nn.BatchNorm1d(1024),
                                  nn.ReLU(), nn.Linear(1024, 512))
        self.mapping = nn.Linear(512, 64, bias=False)

    def forward(self, neigh, cent):
        GB, S, K, C = neigh.shape
        h = self.sa(neigh.reshape(-1, C)).reshape(GB, S, K, -1)
        h = h.max(dim=2).values                            # (GB, S, 256)
        h = torch.cat([cent, h], dim=-1)                   # (GB, S, 259)
        local = self.stage2(h.reshape(-1, 259)).reshape(GB, S, -1)
        x = local.max(dim=1).values                        # (GB, 1024)
        B = GB // self.G
        gfeat = local.reshape(self.G, B, S, -1).permute(1, 0, 2, 3)
        x_global = gfeat.reshape(B, self.G * S, -1).max(dim=1).values
        x = self.head(x)
        x_global = self.head(x_global)
        x_nor = F.normalize(x, p=2, dim=1)
        return x, self.mapping(x_nor), x_nor, x_global


def losses(x, x_global, G, B):
    mask = 1.0 - torch.eye(B, device=x.device)
    xg = x.reshape(G, B, -1)
    # global-local
    pos = torch.einsum("bd,gbd->gb", x_global, xg)
    neg = torch.einsum("bd,gkd->bgk", x_global, xg) * mask[:, None, :]
    neg = neg.reshape(B, G * B).unsqueeze(0).expand(G, B, G * B)
    logits = torch.cat([pos.unsqueeze(-1), neg], dim=-1)
    loss = F.cross_entropy(
        logits.reshape(G * B, -1),
        torch.zeros(G * B, dtype=torch.long, device=x.device),
        reduction="mean") * G
    # circle
    perm = torch.randperm(G)
    anchors, nexts = xg[perm[:-1]], xg[perm[1:]]
    posc = (anchors * nexts).sum(-1)
    negc = torch.einsum("abd,gkd->abgk", anchors, xg) * mask[None, :, None, :]
    bank = negc.permute(1, 0, 2, 3).reshape(B, -1)
    logitsc = torch.cat(
        [posc.unsqueeze(-1),
         bank.unsqueeze(0).expand(G - 1, B, bank.shape[1])], dim=-1)
    loss = loss + F.cross_entropy(
        logitsc.reshape((G - 1) * B, -1),
        torch.zeros((G - 1) * B, dtype=torch.long, device=x.device),
        reduction="mean") * (G - 1)
    return loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--device", default="cuda" if torch.cuda.is_available()
                    else "cpu")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "baseline_local.json"))
    args = ap.parse_args()

    G, B, N, C = 10, args.batch, 512, 4
    dev = torch.device(args.device)
    torch.manual_seed(1)
    model = Encoder(G).to(dev)
    opt = torch.optim.Adam(model.parameters(), lr=3e-4, betas=(0.5, 0.999),
                           eps=1e-6)
    points = torch.randn(G * B, N, C, device=dev)

    def step():
        neigh, cent = group(points)
        x, code, x_nor, x_global = model(neigh, cent)
        loss = losses(x, x_global, G, B)
        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warm-up
    if dev.type == "cuda":
        torch.cuda.synchronize()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    if dev.type == "cuda":
        torch.cuda.synchronize()
    dt = time.perf_counter() - t0
    cps = args.steps * B / dt
    result = {
        "clips_per_sec": cps,
        "device": str(dev),
        "torch_threads": torch.get_num_threads(),
        "steps": args.steps,
        "note": "torch re-timing harness of the reference per-step work "
                "(BASELINE.md); reference GPU numbers are unpublished",
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
