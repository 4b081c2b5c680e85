"""Measures the reference's training throughput on this machine.

The reference (ashispati/ar-vae) is PyTorch on CPU/single-GPU; this host
has torch-CPU only, so the baseline is torch-CPU steps/sec for the same
workload bench.py measures: dSprites AR-VAE (conv VAE from
``imagevae/dsprites_vae.py``), full objective
recon + beta-KLD + 5-dim pairwise AR reg (``utils/trainer.py:354-403``),
Adam, batch 128. Writes BASELINE_MEASURED.json consumed by bench.py.
"""

import json
import os
import time

import numpy as np
import torch
from torch import nn
import torch.nn.functional as F

BATCH = 128
WARMUP = 3
ITERS = 20


class RefDspritesVAE(nn.Module):
    """Same architecture as reference imagevae/dsprites_vae.py:7-56."""

    def __init__(self, z_dim=10):
        super().__init__()
        self.z_dim = z_dim
        self.enc_conv = nn.Sequential(
            nn.Conv2d(1, 32, 4, 2, 1), nn.ReLU(True),
            nn.Conv2d(32, 32, 4, 2, 1), nn.ReLU(True),
            nn.Conv2d(32, 32, 4, 2, 1), nn.ReLU(True),
            nn.Conv2d(32, 32, 4, 2, 1), nn.ReLU(True),
        )
        self.enc_lin = nn.Sequential(
            nn.Linear(512, 256), nn.ReLU(True), nn.Linear(256, 256),
            nn.ReLU(True),
        )
        self.enc_mean = nn.Linear(256, z_dim)
        self.enc_log_std = nn.Linear(256, z_dim)
        self.dec_lin = nn.Sequential(
            nn.Linear(z_dim, 256), nn.ReLU(True),
            nn.Linear(256, 256), nn.ReLU(True),
            nn.Linear(256, 512), nn.ReLU(True),
        )
        self.dec_conv = nn.Sequential(
            nn.ConvTranspose2d(32, 32, 4, 2, 1), nn.ReLU(True),
            nn.ConvTranspose2d(32, 32, 4, 2, 1), nn.ReLU(True),
            nn.ConvTranspose2d(32, 32, 4, 2, 1), nn.ReLU(True),
            nn.ConvTranspose2d(32, 1, 4, 2, 1),
        )

    def forward(self, x):
        h = self.enc_conv(x).view(x.size(0), -1)
        h = self.enc_lin(h)
        mu, log_std = self.enc_mean(h), self.enc_log_std(h)
        std = torch.exp(log_std)
        z = mu + std * torch.randn_like(std)
        h = self.dec_lin(z).view(z.size(0), 32, 4, 4)
        return self.dec_conv(h), mu, log_std, z


def reg_loss_sign(latent_code, attribute, factor):
    """utils/trainer.py:378-403 semantics."""
    lc = latent_code.view(-1, 1).repeat(1, latent_code.shape[0])
    lc_dist = (lc - lc.transpose(1, 0)).view(-1, 1)
    at = attribute.view(-1, 1).repeat(1, attribute.shape[0])
    at_dist = (at - at.transpose(1, 0)).view(-1, 1)
    return F.l1_loss(torch.tanh(lc_dist * factor), torch.sign(at_dist).float())


def step_time():
    torch.manual_seed(0)
    model = RefDspritesVAE()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    rng = np.random.RandomState(0)
    x = torch.from_numpy((rng.rand(BATCH, 1, 64, 64) > 0.7).astype("float32"))
    labels = torch.from_numpy(rng.rand(BATCH, 6).astype("float32"))

    def one_step():
        opt.zero_grad()
        logits, mu, log_std, z = model(x)
        recon = F.binary_cross_entropy_with_logits(
            logits, x, reduction="sum"
        ).div(BATCH)
        kld = (-log_std + 0.5 * (torch.exp(2 * log_std) + mu**2) - 0.5).sum(1).mean()
        loss = recon + 1.0 * kld.abs()
        for d in (1, 2, 3, 4, 5):
            loss = loss + 10.0 * reg_loss_sign(z[:, d], labels[:, d], 1.0)
        loss.backward()
        opt.step()

    for _ in range(WARMUP):
        one_step()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        one_step()
    return ITERS / (time.perf_counter() - t0)


if __name__ == "__main__":
    sps = step_time()
    out = {
        "dsprites_arvae_steps_per_sec": round(sps, 3),
        "hardware": "torch-cpu (reference framework; no GPU on this host)",
        "batch": BATCH,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
