#!/usr/bin/env python
"""Measure the REFERENCE implementation's training throughput on this host.

Imports the reference's own model/loss code (read-only, not copied) from
/root/reference and drives its hot loop (forward -> triplet loss -> backward
-> AdamW step, as twotower/train.py:103-139 does) on synthetic char-id
batches. The resulting pairs/sec is recorded in BASELINE.md and used as
bench.py's vs_baseline denominator. torch in this image is CPU-only; the
reference has no TPU path, so CPU torch IS its achievable throughput here.
"""
import sys, time, types
sys.path.insert(0, "/root/reference")
# the reference package imports wandb at module top; stub it so its model
# code is importable in this offline image (tqdm is installed)
sys.modules.setdefault("wandb", types.ModuleType("wandb"))
import torch

from twotower.embeddings import build as build_embedding
from twotower.encoders import build_two_tower
from twotower.losses import build as build_loss

VOCAB, SEQ, BATCH, STEPS = 96, 64, 256, 12
torch.manual_seed(0)

embedding = build_embedding("lookup", vocab_size=VOCAB, embedding_dim=64)
model = build_two_tower("mean", embedding=embedding, hidden_dim=128, tied_weights=True)
loss_fn = build_loss("triplet", margin=0.2)
optim = torch.optim.AdamW(model.parameters(), lr=1e-3)

q = torch.randint(1, VOCAB, (BATCH, SEQ))
p = torch.randint(1, VOCAB, (BATCH, SEQ))
n = torch.randint(1, VOCAB, (BATCH, SEQ))

for _ in range(3):  # warmup
    qv, pv, nv = model(q, p, n)
    loss = loss_fn(qv, pv, nv)
    optim.zero_grad(); loss.backward(); optim.step()

start = time.perf_counter()
for _ in range(STEPS):
    qv, pv, nv = model(q, p, n)
    loss = loss_fn(qv, pv, nv)
    optim.zero_grad(); loss.backward(); optim.step()
elapsed = time.perf_counter() - start
print(f"reference torch-cpu: {STEPS*BATCH/elapsed:.1f} pairs/sec "
      f"(batch={BATCH}, seq={SEQ}, {elapsed/STEPS*1000:.1f} ms/step)")
