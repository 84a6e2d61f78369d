"""Training subsystem: jitted steps, grad accumulation, plateau LR,
checkpoint round-trip, loss decreases on synthetic data."""

import numpy as np
import pytest
import jax

from vocal_remover_tpu.models.cascaded import CascadedNet
from vocal_remover_tpu.train.checkpoint import (
    load_train_state,
    save_train_state,
)
from vocal_remover_tpu.train.plateau import ReduceLROnPlateau
from vocal_remover_tpu.train.step import Trainer


class ArrayPairs:
    """In-memory (X, y) magnitude batches shaped like the loader output."""

    def __init__(self, X, y, batchsize):
        self.X, self.y, self.bs = X, y, batchsize

    def __iter__(self):
        for i in range(0, len(self.X), self.bs):
            yield self.X[i : i + self.bs], self.y[i : i + self.bs]


@pytest.fixture(scope="module")
def tiny_setup():
    model = CascadedNet(64, 32, 4, 8)
    variables = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    n, F, T = 8, 33, 160  # T must exceed 2*offset=128 for predict()
    y = np.abs(rng.standard_normal((n, 2, F, T))).astype(np.float32) * 0.5
    v = np.abs(rng.standard_normal((n, 2, F, T))).astype(np.float32) * 0.3
    X = y + v
    return model, variables, X, y


def test_loss_decreases(tiny_setup):
    model, variables, X, y = tiny_setup
    trainer = Trainer(model, variables, learning_rate=1e-3)
    loader = ArrayPairs(X, y, 4)
    first = trainer.train_epoch(loader)
    for _ in range(4):
        last = trainer.train_epoch(loader)
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first


def test_validate_epoch_runs(tiny_setup):
    model, variables, X, y = tiny_setup
    trainer = Trainer(model, variables, learning_rate=1e-3)
    val = trainer.validate_epoch(ArrayPairs(X, y, 4))
    assert np.isfinite(val) and val > 0


def test_grad_accumulation_matches_large_batch(tiny_setup):
    """Two identical microbatches under A=2 average to the same gradient
    as one microbatch under A=1 => identical Adam update (reference
    train.py:91-104 accumulate-then-step semantics)."""
    model, variables, X, y = tiny_setup
    t1 = Trainer(model, variables, learning_rate=1e-3, accumulation_steps=2,
                 dropout=False)
    t2 = Trainer(model, variables, learning_rate=1e-3, accumulation_steps=1,
                 dropout=False)
    batch = (X[:4], y[:4])
    t1.train_epoch([batch, batch])  # one apply of the averaged grads
    t2.train_epoch([batch])
    for a, b in zip(
        jax.tree_util.tree_leaves(t1.params),
        jax.tree_util.tree_leaves(t2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        )


def test_learning_rate_injection(tiny_setup):
    model, variables, X, y = tiny_setup
    trainer = Trainer(model, variables, learning_rate=1e-3)
    assert abs(trainer.learning_rate - 1e-3) < 1e-9
    trainer.set_learning_rate(5e-4)
    trainer.train_epoch(ArrayPairs(X[:4], y[:4], 4))
    assert abs(trainer.learning_rate - 5e-4) < 1e-9


def test_plateau_scheduler_torch_semantics():
    s = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=2, min_lr=0.1)
    assert s.step(1.0) == 1.0  # epoch 0: improvement (inf -> 1.0)
    assert s.step(0.5) == 1.0  # improvement
    assert s.step(0.5) == 1.0  # bad 1 (not < best*(1-eps))
    assert s.step(0.5) == 1.0  # bad 2
    assert s.step(0.5) == 0.5  # bad 3 > patience -> reduce
    assert s.step(0.4) == 0.5  # improvement again
    for _ in range(10):
        s.step(0.4)
    assert s.lr >= 0.1  # min_lr floor


def test_checkpoint_roundtrip(tmp_path, tiny_setup):
    model, variables, X, y = tiny_setup
    trainer = Trainer(model, variables, learning_rate=1e-3)
    sched = ReduceLROnPlateau(lr=1e-3)
    trainer.train_epoch(ArrayPairs(X[:4], y[:4], 4))
    path = str(tmp_path / "state.msgpack")
    save_train_state(path, trainer, sched, epoch=3, best_loss=0.25)

    trainer2 = Trainer(model, model.init(jax.random.PRNGKey(9)),
                       learning_rate=1e-3)
    sched2 = ReduceLROnPlateau(lr=1e-3)
    epoch, best = load_train_state(path, trainer2, sched2)
    assert epoch == 3 and abs(best - 0.25) < 1e-9
    for a, b in zip(
        jax.tree_util.tree_leaves(trainer.params),
        jax.tree_util.tree_leaves(trainer2.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored trainer can continue training
    loss = trainer2.train_epoch(ArrayPairs(X[:4], y[:4], 4))
    assert np.isfinite(loss)


def test_complex_mode_training(rng):
    """The complex-mask mode (dormant in the reference) trains: loss
    decreases with re/im-stacked channel batches."""
    model = CascadedNet(64, 32, 4, 8, is_complex=True)
    variables = model.init(jax.random.PRNGKey(2))
    n, F, T = 8, 33, 160
    yc = (rng.standard_normal((n, 2, F, T))
          + 1j * rng.standard_normal((n, 2, F, T))) * 0.4
    vc = (rng.standard_normal((n, 2, F, T))
          + 1j * rng.standard_normal((n, 2, F, T))) * 0.2
    Xc = yc + vc
    X = np.concatenate([Xc.real, Xc.imag], 1).astype(np.float32)
    y = np.concatenate([yc.real, yc.imag], 1).astype(np.float32)

    trainer = Trainer(model, variables, learning_rate=2e-3)
    first = trainer.train_epoch(ArrayPairs(X, y, 4))
    for _ in range(4):
        last = trainer.train_epoch(ArrayPairs(X, y, 4))
    assert np.isfinite(first) and last < first
    val = trainer.validate_epoch(ArrayPairs(X, y, 4))
    assert np.isfinite(val)


def test_native_model_checkpoint(tmp_path, tiny_setup):
    from vocal_remover_tpu.models import convert

    model, variables, X, y = tiny_setup
    trainer = Trainer(model, variables, learning_rate=1e-3)
    path = str(tmp_path / "model.vrt.npz")
    from vocal_remover_tpu.train.checkpoint import save_model

    save_model(path, model, trainer)
    loaded = convert.load_checkpoint(path, model)
    mask = model(loaded, np.transpose(X[:1], (0, 2, 3, 1)))
    assert mask.shape == (1, 33, 160, 2)


def test_aux_deep_supervision(tiny_setup):
    """aux_lambda > 0 trains THROUGH the aux head (reference ships it
    untrained, nets.py:80): its gradients become nonzero, the combined
    loss decreases, and aux_lambda=0 reproduces the reference loss."""
    model, variables, X, y = tiny_setup

    t0 = Trainer(model, variables, learning_rate=1e-3, dropout=False)
    ta = Trainer(model, variables, learning_rate=1e-3, dropout=False,
                 aux_lambda=0.5)

    loss0, grads0 = t0.compute_grads(X[:4], y[:4])
    lossa, grads_a = ta.compute_grads(X[:4], y[:4])
    # aux adds a nonnegative term
    assert lossa >= loss0 - 1e-7
    g0 = np.abs(grads0["aux_out"]["conv"]).max()
    ga = np.abs(grads_a["aux_out"]["conv"]).max()
    assert g0 == 0.0  # dead head without the flag (reference behavior)
    assert ga > 0.0

    losses_seq = [ta.train_epoch(ArrayPairs(X, y, 4)) for _ in range(8)]
    assert np.isfinite(losses_seq).all()
    assert losses_seq[-1] < losses_seq[0]


def test_int8_batch_staging(tiny_setup):
    """--transfer_dtype int8: per-batch uint8 quantization quarters link
    traffic; training still learns, and the dequantized loss sits within
    the quantization-noise envelope of the f32 loss."""
    model, variables, X, y = tiny_setup

    tf = Trainer(model, variables, learning_rate=1e-3, dropout=False)
    tq = Trainer(model, variables, learning_rate=1e-3, dropout=False,
                 transfer_dtype="int8")

    loss_f, _ = tf.compute_grads(X[:4], y[:4])
    loss_q, _ = tq.compute_grads(X[:4], y[:4])
    # expected |quantization error| is scale/4 per tensor of the L1 pair
    step = max(float(X.max()), float(y.max())) / 255.0
    assert abs(loss_q - loss_f) < step, (loss_f, loss_q)

    losses_seq = [tq.train_epoch(ArrayPairs(X, y, 4)) for _ in range(6)]
    assert np.isfinite(losses_seq).all()
    assert losses_seq[-1] < losses_seq[0]

    # complex mode carries signed channels: int8 staging must refuse
    cmodel = CascadedNet(64, 32, 4, 8, True)
    cvars = cmodel.init(jax.random.PRNGKey(0))
    tc = Trainer(cmodel, cvars, learning_rate=1e-3,
                 transfer_dtype="int8")
    with pytest.raises(ValueError):
        tc.compute_grads(
            np.abs(np.random.default_rng(0).standard_normal(
                (2, 4, 33, 160)
            )).astype(np.float32),
            np.abs(np.random.default_rng(1).standard_normal(
                (2, 4, 33, 160)
            )).astype(np.float32),
        )


def test_remat_gradients_match(tiny_setup):
    """jax.checkpoint staging recomputes the same ops: gradients (and
    losses) with remat must equal the plain backward."""
    model, variables, X, y = tiny_setup
    t_plain = Trainer(model, variables, learning_rate=1e-3, dropout=False)
    t_remat = Trainer(model, variables, learning_rate=1e-3, dropout=False,
                      remat=True)
    l0, g0 = t_plain.compute_grads(X[:4], y[:4])
    l1, g1 = t_remat.compute_grads(X[:4], y[:4])
    assert abs(l0 - l1) < 1e-6
    # not bitwise: the rematerialized backward is a different XLA
    # fusion of the same math (observed <=2e-7 absolute)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6), g0, g1
    )


def test_remat_with_dropout_and_aux(tiny_setup):
    """remat composes with dropout (same PRNG keys are replayed during
    recomputation) and the aux deep-supervision head."""
    model, variables, X, y = tiny_setup
    t = Trainer(model, variables, learning_rate=1e-3, dropout=True,
                aux_lambda=0.1, remat=True)
    loss = t.train_epoch(ArrayPairs(X, y, 4))
    assert np.isfinite(loss)
