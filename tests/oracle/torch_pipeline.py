"""Torch-CPU oracle of the reference DE-GAP-SCI inference pipeline.

The upstream reference cannot run in this environment (hard-coded
``.cuda()`` calls and the long-removed ``torch.solve`` API), so parity is
established against this independent CPU re-statement of its *semantics*,
written from the structural analysis in SURVEY.md:

* GAP step + tag-dispatched denoiser: solvers/equilibrium_solvers_yaping.py:396-436
* Anderson (channel-last): solvers/new_equilibrium_utils_yaping.py:153-189
  (``torch.solve(B, A)`` solved ``A X = B``; here ``torch.linalg.solve(A, B)``)
* DEQ forward (inference): solvers/new_equilibrium_utils_yaping.py:248-281
* SimpleCNN denoiser: networks/provable/model/SimpleCNN_models.py:6-61
  with the CLI config (4 layers, no_bn, bias-free, lip handled by loading
  the stored normalized weights)
* FFDNet: networks/ffdnet/models.py + functions.py

This module is a test fixture only — the framework itself never imports it.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as tF


# ---------------------------------------------------------------- networks

class SimpleCNNOracle(nn.Module):
    """4-layer bias-free DnCNN (conv-relu-conv-relu-conv-relu-conv)."""

    def __init__(self, channels=1, features=64, num_layers=4):
        super().__init__()
        layers = [nn.Conv2d(channels, features, 3, padding=1, bias=False),
                  nn.ReLU(inplace=True)]
        for _ in range(num_layers - 2):
            layers += [nn.Conv2d(features, features, 3, padding=1, bias=False),
                       nn.ReLU(inplace=True)]
        layers += [nn.Conv2d(features, channels, 3, padding=1, bias=False)]
        self.dncnn = nn.Sequential(*layers)

    def forward(self, x):
        return self.dncnn(x)

    def load_reference(self, path):
        """Load a cnn.ckpt / rsn_cnn.ckpt solver state dict (normalized
        weights for SN layers, i.e. eval semantics)."""
        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj["solver_state_dict"] if "solver_state_dict" in obj else obj
        sd = {k[len("module."):] if k.startswith("module.") else k: v
              for k, v in sd.items()}
        convs = [m for m in self.dncnn if isinstance(m, nn.Conv2d)]
        seq_idx = sorted({int(k.split(".")[2]) for k in sd
                          if k.startswith("nonlinear_op.dncnn.")})
        for conv, idx in zip(convs, seq_idx):
            conv.weight.data = sd[f"nonlinear_op.dncnn.{idx}.weight"].clone()
        return self


class FFDNetOracle(nn.Module):
    """Grayscale FFDNet: space-to-depth(2) + sigma map -> 15-layer DnCNN
    (64 feats, BN on middle layers) -> depth-to-space."""

    def __init__(self):
        super().__init__()
        layers = [nn.Conv2d(5, 64, 3, padding=1, bias=False),
                  nn.ReLU(inplace=True)]
        for _ in range(13):
            layers += [nn.Conv2d(64, 64, 3, padding=1, bias=False),
                       nn.BatchNorm2d(64), nn.ReLU(inplace=True)]
        layers += [nn.Conv2d(64, 4, 3, padding=1, bias=False)]
        self.body = nn.Sequential(*layers)

    @staticmethod
    def _down(x):
        # channel n = 4*c + idx, idx over patches (0,0),(0,1),(1,0),(1,1)
        n, c, h, w = x.shape
        out = torch.zeros(n, 4 * c, h // 2, w // 2, dtype=x.dtype)
        idxL = [(0, 0), (0, 1), (1, 0), (1, 1)]
        for i, (r, s) in enumerate(idxL):
            out[:, i::4] = x[:, :, r::2, s::2]
        return out

    @staticmethod
    def _up(x):
        n, c4, h, w = x.shape
        c = c4 // 4
        out = torch.zeros(n, c, 2 * h, 2 * w, dtype=x.dtype)
        idxL = [(0, 0), (0, 1), (1, 0), (1, 1)]
        for i, (r, s) in enumerate(idxL):
            out[:, :, r::2, s::2] = x[:, i::4]
        return out

    def forward(self, x, sigma):
        n, c, h, w = x.shape
        down = self._down(x)
        noise_map = sigma.view(n, 1, 1, 1).repeat(1, c, h // 2, w // 2)
        y = torch.cat([noise_map, down], dim=1)
        return self._up(self.body(y))

    def load_reference_state(self, sd):
        sd = {(k[len("module."):] if k.startswith("module.") else k): v
              for k, v in sd.items()}
        prefix = "nonlinear_op.intermediate_dncnn.itermediate_dncnn"
        if not any(k.startswith(prefix) for k in sd):
            prefix = "intermediate_dncnn.itermediate_dncnn"
        own = [m for m in self.body
               if isinstance(m, (nn.Conv2d, nn.BatchNorm2d))]
        seq_idx = sorted({int(k[len(prefix) + 1:].split(".")[0])
                          for k in sd if k.startswith(prefix)})
        for mod, idx in zip(own, seq_idx):
            p = f"{prefix}.{idx}"
            if isinstance(mod, nn.Conv2d):
                mod.weight.data = sd[f"{p}.weight"].clone()
            else:
                mod.weight.data = sd[f"{p}.weight"].clone()
                mod.bias.data = sd[f"{p}.bias"].clone()
                mod.running_mean.data = sd[f"{p}.running_mean"].clone()
                mod.running_var.data = sd[f"{p}.running_var"].clone()
        return self


class UNetOracle(nn.Module):
    """Reference U-Net semantics (UnetModel / UnetNorm / Unet3D,
    networks/normalized_equilibrium_u_net_yaping.py:104-402), restated:
    down blocks (2x conv3x3-bias-free + LeakyReLU 0.2) with avg-pool,
    bottleneck block, transpose-conv ups with reflect-pad odd-size fix,
    skip concat, 1x1 head; optional clamp(-1,1). State-dict keys follow
    the reference module names so the converter sees real layouts."""

    def __init__(self, in_chans=1, out_chans=1, chans=8, num_pool_layers=3,
                 conv3d=False, final_clamp=True):
        super().__init__()
        self.num_pool_layers = num_pool_layers
        self.conv3d = conv3d
        self.final_clamp = final_clamp
        Conv = nn.Conv3d if conv3d else nn.Conv2d

        def block(cin, cout):
            return nn.Sequential(
                Conv(cin, cout, 3, padding=1, bias=False),
                nn.LeakyReLU(0.2),
                Conv(cout, cout, 3, padding=1, bias=False),
                nn.LeakyReLU(0.2))

        def upblock(cin, cout):
            if conv3d:
                t = nn.ConvTranspose3d(cin, cout, (3, 2, 2),
                                       stride=(1, 2, 2), padding=(1, 0, 0),
                                       bias=False)
            else:
                t = nn.ConvTranspose2d(cin, cout, 2, stride=2, bias=False)
            return nn.Sequential(t, nn.LeakyReLU(0.2))

        # wrap blocks in a container with a `layers` child so state-dict
        # keys match the reference's ConvBlock/TransposeConvBlock layout
        class _Block(nn.Module):
            def __init__(self, seq):
                super().__init__()
                self.layers = seq

            def forward(self, x):
                return self.layers(x)

        named = _Block

        self.down_sample_layers = nn.ModuleList(
            [named(block(in_chans, chans))])
        ch = chans
        for _ in range(num_pool_layers - 1):
            self.down_sample_layers.append(named(block(ch, ch * 2)))
            ch *= 2
        self.conv = named(block(ch, ch * 2))
        self.up_transpose_conv = nn.ModuleList()
        self.up_conv = nn.ModuleList()
        for _ in range(num_pool_layers - 1):
            self.up_transpose_conv.append(named(upblock(ch * 2, ch)))
            self.up_conv.append(named(block(ch * 2, ch)))
            ch //= 2
        self.up_transpose_conv.append(named(upblock(ch * 2, ch)))
        self.up_conv.append(nn.Sequential(
            named(block(ch * 2, ch)), Conv(ch, out_chans, 1)))

    def forward(self, x):
        stack = []
        out = x
        pool = (tF.avg_pool3d if self.conv3d else tF.avg_pool2d)
        ksz = (1, 2, 2) if self.conv3d else 2
        for down in self.down_sample_layers:
            out = down.layers(out)
            stack.append(out)
            out = pool(out, ksz)
        out = self.conv.layers(out)
        for t, c in zip(self.up_transpose_conv, self.up_conv):
            skip = stack.pop()
            out = (t.layers(out) if hasattr(t, "layers") else t(out))
            if self.conv3d:
                # the reference's Unet3D supports 2^n resolutions only
                assert out.shape[-2:] == skip.shape[-2:]
            else:
                pad = [0, 0, 0, 0]
                if out.shape[-1] != skip.shape[-1]:
                    pad[1] = 1
                if out.shape[-2] != skip.shape[-2]:
                    pad[3] = 1
                if sum(pad):
                    out = tF.pad(out, pad, "reflect")
            out = torch.cat([out, skip], dim=1)
            out = (c.layers(out) if hasattr(c, "layers") else c(out))
        if self.final_clamp:
            out = torch.clamp(out, -1, 1)
        return out


# ----------------------------------------------------------- iteration map

class GapSCIOracle:
    """EquilibriumProxGradSCI semantics, incl. the stateful sigma schedule."""

    def __init__(self, net, tag, sigma0=60.0 / 255.0, decay=0.971):
        self.net = net
        self.tag = tag
        self.sigma0 = sigma0
        self.decay = decay
        self._y_mean = None
        self._sigma = None

    def __call__(self, z, y, Phi, Phi_sum):
        bsz, h, w, c = z.shape
        fb = torch.sum(z * Phi, dim=3)
        z = z + ((y - fb) / Phi_sum).unsqueeze(3) * Phi
        x = z.permute(0, 3, 1, 2).contiguous().view(bsz * c, 1, h, w)
        if self.tag == "denoiser":
            noise = self.net(x)
            out = z - noise.view(bsz, c, h, w).permute(0, 2, 3, 1)
        elif self.tag == "conv2d":
            o = self.net(x)
            out = o.view(bsz, c, h, w).permute(0, 2, 3, 1)
        elif self.tag == "ffdnet":
            ym = y.mean()
            if self._y_mean is None or self._y_mean != ym:
                self._sigma = torch.full((bsz * c,), self.sigma0)
                self._y_mean = ym
            else:
                self._sigma = self._sigma * self.decay
            noise = self.net(x, self._sigma)
            out = z - noise.view(bsz, c, h, w).permute(0, 2, 3, 1)
        else:
            raise ValueError(self.tag)
        return out


# ------------------------------------------------------------ root finder

def anderson_oracle(f, x0, m=5, lam=1e-2, max_iter=100, tol=1e-5, beta=1.0):
    """Reference andersonexp semantics on CPU float32."""
    bsz = x0.shape[0]
    nf = x0[0].numel()
    X = torch.zeros(bsz, m, nf)
    F = torch.zeros(bsz, m, nf)
    X[:, 0] = x0.reshape(bsz, -1)
    F[:, 0] = f(x0).reshape(bsz, -1)
    X[:, 1] = F[:, 0]
    F[:, 1] = f(F[:, 0].reshape(x0.shape)).reshape(bsz, -1)

    current_k = 0
    res = float("inf")
    for k in range(2, max_iter):
        current_k = k
        n = min(k, m)
        G = F[:, :n] - X[:, :n]
        H = torch.zeros(bsz, n + 1, n + 1)
        H[:, 0, 1:] = 1.0
        H[:, 1:, 0] = 1.0
        H[:, 1:, 1:] = torch.bmm(G, G.transpose(1, 2)) + lam * torch.eye(n)
        y = torch.zeros(bsz, n + 1, 1)
        y[:, 0] = 1.0
        alpha = torch.linalg.solve(H, y)[:, 1:n + 1, 0]
        xk = beta * (alpha[:, None] @ F[:, :n])[:, 0] \
            + (1 - beta) * (alpha[:, None] @ X[:, :n])[:, 0]
        X[:, k % m] = xk
        F[:, k % m] = f(xk.reshape(x0.shape)).reshape(bsz, -1)
        res = ((F[:, k % m] - X[:, k % m]).norm()
               / (1e-5 + F[:, k % m].norm())).item()
        if res < tol:
            break
    return X[:, current_k % m].view_as(x0), res, current_k


def deq_infer_oracle(step, y, Phi, Phi_sum, x0, **solver_kw):
    """DEQFixedPoint.forward at inference: no-grad solve + one extra step."""
    with torch.no_grad():
        f = lambda z: step(z, y, Phi, Phi_sum)
        z, res, k = anderson_oracle(f, x0, **solver_kw)
        z = step(z, y, Phi, Phi_sum)
    return z, res, k


def reconstruct_clip_oracle(net, tag, data, max_iter=100, first_only=False,
                            frames=8):
    """Reference test_solver_sci protocol for one .mat file; returns
    (recons (S,H,W,T), psnrs list)."""
    mask = torch.from_numpy(np.float32(data["mask"]))[None]
    Phi_sum = torch.sum(mask, dim=3)
    Phi_sum[Phi_sum == 0] = 1
    meas = np.float32(data["meas"])
    if meas.ndim == 2:
        meas = meas[..., None]
    if first_only:
        meas = meas[..., :1]
    gt = np.float32(data["gt"])

    recs, psnrs = [], []
    step = GapSCIOracle(net, tag)
    for fi in range(meas.shape[-1]):
        y = torch.from_numpy(meas[..., fi])[None]
        x0 = y.unsqueeze(3) * mask
        rec, _, _ = deq_infer_oracle(step, y, mask, Phi_sum, x0,
                                     max_iter=max_iter)
        g = gt[..., fi * frames:(fi + 1) * frames]
        r = rec[0].numpy()
        mse = np.mean((np.clip(r, 0, 1) - g) ** 2)
        psnrs.append(10 * np.log10(1.0 / mse))
        recs.append(r)
    return np.stack(recs), psnrs
