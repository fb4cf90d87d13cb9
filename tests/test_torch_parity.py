"""Cross-framework parity: our JAX encoder vs an independent PyTorch
mirror of the reference architecture (cn3d_model_conbag.py:22-137
semantics), with identical weights and inputs.

This is the strongest accuracy-parity evidence available without the
license-gated NTU data: it catches BN epsilon/momentum/variance
conventions, pooling order, normalization, and grouping selection
differences between the frameworks.

Note: torch's running-var update uses the unbiased estimator while
flax/ours use the biased one — irrelevant at real batch sizes (the tests
compare train-mode outputs and batch statistics, which both frameworks
compute biased).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from facl_tpu.config import ModelConfig  # noqa: E402
from facl_tpu.models import PointNetPlus  # noqa: E402
from facl_tpu.ops.grouping import group_points  # noqa: E402


def build_torch_encoder(widths_sa, widths_s2, fc_hidden, embed_dim,
                        n_protos, in_feat=4):
    """Independent torch mirror of the reference encoder architecture:
    1x1-conv stacks == per-point Linear over channels."""
    import torch.nn as nn

    def block(cin, widths):
        layers = []
        for w in widths:
            layers += [nn.Linear(cin, w), nn.BatchNorm1d(w), nn.ReLU()]
            cin = w
        return nn.Sequential(*layers)

    class Enc(nn.Module):
        def __init__(self):
            super().__init__()
            self.sa = block(in_feat, widths_sa)
            self.stage2 = block(3 + widths_sa[-1], widths_s2)
            self.head = nn.Sequential(
                nn.Linear(widths_s2[-1], fc_hidden),
                nn.BatchNorm1d(fc_hidden), nn.ReLU(),
                nn.Linear(fc_hidden, embed_dim))
            self.mapping = nn.Linear(embed_dim, n_protos, bias=False)

        def forward(self, neigh, cent, G):
            GB, S, K, C = neigh.shape
            h = self.sa(neigh.reshape(-1, C)).reshape(GB, S, K, -1)
            h = h.max(dim=2).values
            h = torch.cat([cent, h], dim=-1)
            local = self.stage2(h.reshape(GB * S, -1)).reshape(GB, S, -1)
            x = local.max(dim=1).values
            B = GB // G
            gfeat = local.reshape(G, B, S, -1).permute(1, 0, 2, 3)
            xg = gfeat.reshape(B, G * S, -1).max(dim=1).values
            x = self.head(x)
            xg = self.head(xg)
            xn = torch.nn.functional.normalize(x, p=2, dim=1)
            code = self.mapping(xn)
            return x, code, xn, xg

    return Enc()


def copy_params_to_torch(params, tenc, widths_sa, widths_s2):
    """Copy flax params into the torch mirror."""
    def t(a):
        return torch.from_numpy(np.asarray(a))

    sa = params["sa_stage"]
    with torch.no_grad():
        for i in range(len(widths_sa)):
            lin = tenc.sa[3 * i]
            bn = tenc.sa[3 * i + 1]
            lin.weight.copy_(t(sa[f"kernel_{i}"]).T)
            lin.bias.copy_(t(sa[f"bias_{i}"]))
            bn.weight.copy_(t(sa[f"scale_{i}"]))
            bn.bias.copy_(t(sa[f"shift_{i}"]))
        s2 = params["stage2_mlp"]
        for i in range(len(widths_s2)):
            lin = tenc.stage2[3 * i]
            bn = tenc.stage2[3 * i + 1]
            lin.weight.copy_(t(s2[f"dense_{i}"]["kernel"]).T)
            lin.bias.copy_(t(s2[f"dense_{i}"]["bias"]))
            bn.weight.copy_(t(s2[f"BatchNorm_{i}"]["scale"]))
            bn.bias.copy_(t(s2[f"BatchNorm_{i}"]["bias"]))
        head = params["head"]
        tenc.head[0].weight.copy_(t(head["Dense_0"]["kernel"]).T)
        tenc.head[0].bias.copy_(t(head["Dense_0"]["bias"]))
        tenc.head[1].weight.copy_(t(head["BatchNorm_0"]["scale"]))
        tenc.head[1].bias.copy_(t(head["BatchNorm_0"]["bias"]))
        tenc.head[3].weight.copy_(t(head["Dense_1"]["kernel"]).T)
        tenc.head[3].bias.copy_(t(head["Dense_1"]["bias"]))
        tenc.mapping.weight.copy_(t(params["mapping"]["kernel"]).T)


def test_encoder_matches_torch_mirror(rng):
    widths_sa = (8, 16)
    widths_s2 = (16, 32)
    cfg = ModelConfig(sa_widths=widths_sa, stage2_widths=widths_s2,
                      fc_hidden=24, embed_dim=12, num_prototypes=6,
                      num_crops=3)
    G, B, S, K = 3, 2, 8, 8
    pts = jnp.asarray(rng.normal(size=(G * B, 48, 4)).astype(np.float32))
    neigh, cent = group_points(pts, S, K, radius_sq=10.0)

    model = PointNetPlus(cfg)
    variables = model.init(jax.random.PRNGKey(0), neigh, cent, train=False)
    (x, code, xn, xg), _ = model.apply(variables, neigh, cent, train=True,
                                       mutable=["batch_stats"])

    tenc = build_torch_encoder(widths_sa, widths_s2, 24, 12, 6)
    copy_params_to_torch(variables["params"], tenc, widths_sa, widths_s2)
    tenc.train()
    with torch.no_grad():
        tx, tcode, txn, txg = tenc(
            torch.from_numpy(np.asarray(neigh)),
            torch.from_numpy(np.asarray(cent)), G)

    # fp accumulation noise through the BN chains reaches ~6e-4 on
    # near-zero outputs; the frameworks agree within that.
    np.testing.assert_allclose(np.asarray(x), tx.numpy(), rtol=2e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(xg), txg.numpy(), rtol=2e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(xn), txn.numpy(), rtol=2e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(code), tcode.numpy(), rtol=2e-3,
                               atol=1e-3)


def test_grouping_matches_torch_selection(rng):
    """torch.topk(largest=False) + radius fixup + gather must produce the
    same neighbor multisets as our grouping."""
    B, N, S, K = 2, 64, 8, 16
    pts_np = rng.normal(size=(B, N, 4)).astype(np.float32)
    radius_sq = 1.2

    ours, _ = group_points(jnp.asarray(pts_np), S, K, radius_sq)

    pts = torch.from_numpy(pts_np)
    xyz = pts[..., :3]
    cent = xyz[:, :S]
    d = torch.cdist(cent, xyz) ** 2
    dists, idx = torch.topk(d, K, dim=2, largest=False)
    rows = torch.arange(S).view(1, S, 1)
    idx = torch.where(dists > radius_sq, rows, idx)
    g = torch.gather(pts.unsqueeze(1).expand(B, S, N, 4), 2,
                     idx.unsqueeze(-1).expand(B, S, K, 4)).clone()
    g[..., :3] -= cent.unsqueeze(2)

    a = np.sort(np.asarray(ours), axis=2)
    b = np.sort(g.numpy(), axis=2)
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_probe_head_matches_torch(rng):
    from facl_tpu.models import LinearProbe
    feats = rng.normal(size=(6, 20)).astype(np.float32)
    model = LinearProbe(num_classes=7)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats))
    ours = np.asarray(model.apply(variables, jnp.asarray(feats)))

    import torch.nn.functional as F
    w = torch.from_numpy(np.asarray(
        variables["params"]["Dense_0"]["kernel"])).T
    b = torch.from_numpy(np.asarray(variables["params"]["Dense_0"]["bias"]))
    x = F.normalize(torch.from_numpy(feats), p=2, dim=1)
    theirs = (x @ w.T + b).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
