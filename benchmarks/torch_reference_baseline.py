"""CPU torch baseline with the reference's computational profile.

The reference repo publishes no benchmark numbers (BASELINE.md), so the
anchor is measured: this script reproduces the reference training step's
computational profile -- built from the SURVEY.md spec, not copied --
and times seconds/step on CPU:

  - embedding -> packed 2-layer bidirectional LSTM encoder (model.py:52-109)
  - per-latent (mu, logvar) heads, z = mu + eps*exp(tanh(logvar))
    (model.py:384-398)
  - Python per-timestep decode loop, 1-token LSTM call + multinomial
    sampling + per-step teacher-forcing coin (model.py:457-472)
  - masked CE (sum-over-time, mean-over-batch), KL, discriminator BCE,
    adversarial entropy, CLUB MI (losses.py)
  - total_loss.backward(retain_graph=True), per-adversary backward+Adam,
    main Adam step, per-CLUB backward+Adam (run.py:250-276)
  - a second full forward on token predictions (run.py:285-289)
  - torch.autograd.set_detect_anomaly(True) globally (run.py:22)

Writes benchmarks/BASELINE_MEASURED.json.

Usage: python benchmarks/torch_reference_baseline.py [--steps N]
"""

import argparse
import json
import os
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

torch.autograd.set_detect_anomaly(True)  # reference run.py:22

V, E, H, LAYERS, B, T = 20000, 256, 256, 2, 128, 17
LATENTS = {"polarity": 1, "uncertainty": 1, "content": 62}


class Encoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.emb = nn.Embedding(V, E)
        self.drop = nn.Dropout(0.5)
        self.lstm = nn.LSTM(E, H, num_layers=LAYERS, dropout=0.5,
                            batch_first=True, bidirectional=True)

    def forward(self, x, lengths):
        e = self.drop(self.emb(x))
        packed = nn.utils.rnn.pack_padded_sequence(
            e, lengths, batch_first=True, enforce_sorted=False)
        _, (h, _) = self.lstm(packed)
        return torch.cat([layer for layer in h], dim=1)


class Decoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.emb = nn.Embedding(V, E)
        self.drop = nn.Dropout(0.5)
        self.lstm = nn.LSTM(E, H, num_layers=LAYERS, dropout=0.5,
                            batch_first=True)
        self.out = nn.Linear(H, V)

    def step(self, tok, hidden):
        e = self.drop(self.emb(tok))
        o, hidden = self.lstm(e, hidden)
        return self.out(o).squeeze(1), hidden


class Model(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = Encoder()
        self.decoder = Decoder()
        ctx = H * LAYERS * 2
        self.c2p = nn.ModuleDict({k: nn.Linear(ctx, 2 * d)
                                  for k, d in LATENTS.items()})
        self.dsc = nn.ModuleDict({k: nn.Linear(LATENTS[k], 1)
                                  for k in ("polarity", "uncertainty")})
        self.adv = nn.ModuleDict()
        self.adv_opts = {}
        for ln in LATENTS:
            for lab in ("polarity", "uncertainty"):
                if ln == lab:
                    continue
                m = nn.Linear(LATENTS[ln], 1)
                self.adv[f"{ln}:{lab}"] = m
        self.z2h = nn.Linear(sum(LATENTS.values()), 2 * H * LAYERS)
        self.club = {}
        names = list(LATENTS)
        for i, a in enumerate(names):
            for b in names[i + 1:]:
                hid = max(LATENTS[a], LATENTS[b], 5)
                mu = nn.Sequential(nn.Linear(LATENTS[a], hid // 2),
                                   nn.ReLU(),
                                   nn.Linear(hid // 2, LATENTS[b]))
                lv = nn.Sequential(nn.Linear(LATENTS[a], hid // 2),
                                   nn.ReLU(),
                                   nn.Linear(hid // 2, LATENTS[b]),
                                   nn.Tanh())
                self.club[f"{a}:{b}"] = (mu, lv)

    def forward(self, x, lengths, tf_prob=0.5):
        ctx = self.encoder(x, lengths)
        lat = {}
        for k, layer in self.c2p.items():
            mu, logvar = layer(ctx).chunk(2, dim=1)
            logvar = torch.tanh(logvar)
            z = mu + torch.randn_like(logvar) * torch.exp(logvar)
            lat[k] = (z, mu, logvar)
        dsc_logits = {k: m(lat[k][0]) for k, m in self.dsc.items()}
        adv_logits = {k: m(lat[k.split(":")[0]][0])
                      for k, m in self.adv.items()}
        z = torch.cat([v[0] for v in lat.values()], dim=1)
        hid = torch.tanh(self.z2h(z))
        st, ce = hid.chunk(2, dim=1)
        hidden = (torch.stack(st.chunk(LAYERS, dim=-1), 0).contiguous(),
                  torch.stack(ce.chunk(LAYERS, dim=-1), 0).contiguous())
        logits_all = torch.zeros(B, T, V)
        preds = torch.zeros(B, T, dtype=torch.long)
        tok = torch.full((B, 1), 2, dtype=torch.long)
        import random
        for t in range(1, T):
            logits, hidden = self.decoder.step(tok, hidden)
            logits_all[:, t, :] = logits
            if random.random() < tf_prob:
                tok = x[:, t:t + 1]
            else:
                tok = torch.multinomial(torch.softmax(logits, -1), 1)
            preds[:, t] = tok.squeeze(1)
        return logits_all, lat, dsc_logits, adv_logits, preds


def masked_ce(targets, logits, lengths):
    logp = F.log_softmax(logits, dim=-1)
    ll = logp.gather(-1, targets.unsqueeze(-1).long()).squeeze(-1)
    mask = (torch.arange(T)[None, :] < lengths[:, None]).float()
    return (-(ll * mask).sum(1)).mean()


def main():
    global B
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--batch", type=int, default=B,
                    help="batch size (default 128 = the reference's "
                         "reproduction configs; 512 anchors the "
                         "batch-scaling knee's vs_baseline)")
    ap.add_argument("--out", default="BASELINE_MEASURED.json",
                    help="output filename under benchmarks/")
    args = ap.parse_args()
    B = args.batch
    torch.manual_seed(0)
    np.random.seed(0)

    model = Model()
    main_params = [p for n, p in model.named_parameters()
                   if not n.startswith("adv.")]
    opt = torch.optim.Adam(main_params, lr=3e-4)
    adv_opts = {k: torch.optim.Adam(m.parameters(), lr=3e-4)
                for k, m in model.adv.items()}
    club_opts = {k: torch.optim.Adam(
        list(mu.parameters()) + list(lv.parameters()), lr=5e-4)
        for k, (mu, lv) in model.club.items()}

    rng = np.random.default_rng(0)
    x = torch.tensor(rng.integers(4, V, size=(B, T)), dtype=torch.long)
    lengths = torch.tensor(rng.integers(5, T + 1, size=B))
    y = {k: torch.tensor(rng.integers(0, 2, size=(B, 1)),
                         dtype=torch.float32)
         for k in ("polarity", "uncertainty")}

    def one_step():
        logits, lat, dsc_logits, adv_logits, preds = model(x, lengths)
        recon = masked_ce(x, logits, lengths)
        kl = sum(0.5 * (torch.exp(lv) + mu ** 2 - 1 - lv).mean(0).sum()
                 for (_, mu, lv) in lat.values()) * 0.01
        dsc = sum(F.binary_cross_entropy_with_logits(lg, y[k])
                  for k, lg in dsc_logits.items())
        adv_dsc_losses = {}
        adv_total = 0.0
        for k, lg in adv_logits.items():
            p = torch.clamp(torch.sigmoid(lg), 1e-8, 1 - 1e-8)
            adv_total = adv_total + (p * torch.log(p)).sum(1).mean()
            lab = k.split(":")[1]
            detached = model.adv[k](lat[k.split(":")[0]][0].detach())
            adv_dsc_losses[k] = F.binary_cross_entropy_with_logits(
                detached, y[lab])
        mi_total = 0.0
        for k, (mu_n, lv_n) in model.club.items():
            a, b = k.split(":")
            za, zb = lat[a][0], lat[b][0]
            mu, lv = mu_n(za), lv_n(za)
            pos = -((mu - zb) ** 2) / 2 / lv.exp()
            neg = -((zb.unsqueeze(0) - mu.unsqueeze(1)) ** 2).mean(1) / 2 \
                / lv.exp()
            mi_total = mi_total + (pos.sum(-1) - neg.sum(-1)).mean() * 0.01
        total = recon + kl + dsc + adv_total + mi_total
        total.backward(retain_graph=True)
        torch.nn.utils.clip_grad_norm_(main_params, 5.0)
        for k, loss in adv_dsc_losses.items():
            loss.backward(retain_graph=True)
            adv_opts[k].step()
            adv_opts[k].zero_grad()
        opt.step()
        opt.zero_grad()
        for k, (mu_n, lv_n) in model.club.items():
            a, b = k.split(":")
            za, zb = lat[a][0].detach(), lat[b][0].detach()
            club_opts[k].zero_grad()
            mu, lv = mu_n(za), lv_n(za)
            ll = (-(mu - zb) ** 2 / lv.exp() - lv).sum(1).mean()
            (-ll).backward()
            torch.nn.utils.clip_grad_norm_(
                list(mu_n.parameters()) + list(lv_n.parameters()), 1.0)
            club_opts[k].step()
        # second forward for the AE metric (reference run.py:285-289)
        with torch.no_grad():
            pass
        model(preds, lengths)

    for _ in range(args.warmup):
        one_step()
    t0 = time.time()
    for _ in range(args.steps):
        one_step()
    per_step = (time.time() - t0) / args.steps
    out = {
        "torch_cpu_seconds_per_step": per_step,
        "batch_size": B, "seq_len": T, "vocab": V, "hidden": H,
        "steps_timed": args.steps,
        "torch_threads": torch.get_num_threads(),
        "note": "reference-profile reimplementation (SURVEY.md), CPU, "
                "anomaly detection on, 3 backward groups + double forward",
    }
    path = os.path.join(os.path.dirname(__file__), args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
