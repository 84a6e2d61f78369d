"""Cross-framework TRAINING-TRAJECTORY parity vs the torch reference.

The strongest available proxy for "training matches the reference"
without the released checkpoint (VERDICT.md missing #3): run the actual
production `Trainer` and the reference's torch train loop (Adam +
L1(mask*X, y), reference train.py:81-96) side by side from identical
weights on identical batches and require the per-step loss trajectories
to coincide.

Like test_grad_parity.py this runs in float64: single-step gradients
match to ~2e-6 relative in f64, and over several Adam steps the
compounding stays far below any behavioral divergence (a wrong BN stat
rule, a different Adam epsilon convention, a loss off by a constant all
blow past the tolerance immediately).
"""

import numpy as np
import pytest
import torch

import jax

from vocal_remover_tpu.models.cascaded import CascadedNet
from vocal_remover_tpu.nn import config as nn_config
from vocal_remover_tpu.train.step import Trainer

N_STEPS = 6
LR = 1e-3  # reference train.py default learning rate


@pytest.fixture
def float64_mode():
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    nn_config.set_compute_dtype(jnp.float64)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)
        nn_config.set_compute_dtype(jnp.float32)


@pytest.mark.reference
def test_training_trajectory_parity(reference_lib, rng, float64_mode):
    torch.manual_seed(0)
    tmod = reference_lib.nets.CascadedNet(256, 128, 8, 16).double()
    jmod = CascadedNet(256, 128, 8, 16)
    sd = {k: p.detach().numpy() for k, p in tmod.state_dict().items()}
    variables = jmod.from_torch(sd)

    # train mode (BN batch stats) but dropout off on both sides: the
    # trajectories must be deterministic to be comparable
    tmod.train()
    for m in tmod.modules():
        if isinstance(m, torch.nn.Dropout2d):
            m.eval()

    batches = [
        (
            np.abs(rng.standard_normal((2, 2, 129, 64))),
            None,
        )
        for _ in range(N_STEPS)
    ]
    batches = [(X, X * rng.uniform(0.0, 1.0, X.shape)) for X, _ in batches]

    # ---- reference torch loop (train.py:81-96 semantics) -------------
    opt = torch.optim.Adam(tmod.parameters(), lr=LR)
    ref_losses = []
    for X, y in batches:
        xt, yt = torch.from_numpy(X), torch.from_numpy(y)
        loss = torch.nn.functional.l1_loss(tmod(xt) * xt, yt)
        loss.backward()
        opt.step()
        tmod.zero_grad()
        ref_losses.append(float(loss.item()))

    # ---- our production Trainer --------------------------------------
    trainer = Trainer(jmod, variables, learning_rate=LR, dropout=False)
    our_losses = [trainer.train_epoch([b]) for b in batches]

    # step 0 is a pure forward: must match to f64 cross-framework noise
    np.testing.assert_allclose(our_losses[0], ref_losses[0], rtol=1e-8)
    # later steps: Adam normalizes by sqrt(v), so ~zero gradients take
    # full ±lr steps whose *sign* is the ~2e-6 cross-framework residue —
    # trajectories can only track within that envelope (measured ~0.2%
    # at step 5). A systematic bug (wrong optimizer constant, loss off
    # by a factor, BN rule) diverges 10-100x faster.
    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3)

    # the trajectory must actually be training, not flat
    assert our_losses[-1] < our_losses[0]

    # final parameters: per-step Adam updates are bounded by ~lr, so any
    # cross-framework drift is bounded by 2*lr*N_STEPS; systematic bugs
    # (double update, lr scale) break this. (On synthetic data most
    # gradients are noise-level, so Adam's normalized steps random-walk
    # at ~lr/step in both frameworks — per-param agreement tighter than
    # the envelope is not expected; the loss trajectory is the
    # discriminator.)
    final_sd = jmod.to_torch(trainer.variables)
    checked = 0
    deltas = []
    for k, p in tmod.state_dict().items():
        if not torch.is_floating_point(p):
            continue
        if "running_" in k:
            # BN running stats are activation EMAs, not Adam updates:
            # they inherit the (lr-sized) activation drift, unbounded by
            # the per-step envelope — covered by the loss check instead
            continue
        ours = np.asarray(final_sd[k], np.float64)
        ref = p.detach().numpy()
        d = np.abs(ours - ref)
        assert d.max() <= 2.05 * LR * N_STEPS, (k, d.max())
        deltas.append(np.median(d))
        checked += 1
    assert checked > 100
    assert float(np.median(deltas)) <= 1.05 * LR * N_STEPS
