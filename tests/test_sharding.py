"""Distributed tests on the virtual 8-device CPU mesh (SURVEY.md §4.4):
data-parallel step equivalence vs unsharded, mesh/sharding utilities,
and the driver-facing dryrun entry."""

import numpy as np
import pytest
import jax

from vocal_remover_tpu.models.cascaded import CascadedNet
from vocal_remover_tpu.parallel import mesh as mesh_lib
from vocal_remover_tpu.train.step import Trainer


@pytest.fixture(scope="module")
def tiny():
    model = CascadedNet(64, 32, 4, 8)
    variables = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    X = np.abs(rng.standard_normal((8, 2, 33, 32))).astype(np.float32)
    y = (X * 0.6).astype(np.float32)
    return model, variables, X, y


def test_mesh_construction():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = mesh_lib.make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = mesh_lib.make_mesh(n_data=4, n_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_shard_and_replicate(tiny):
    model, variables, X, y = tiny
    mesh = mesh_lib.make_mesh()
    Xs = mesh_lib.shard_batch(mesh, X)
    assert Xs.sharding.spec == jax.sharding.PartitionSpec("data")
    v = mesh_lib.replicate(mesh, variables)
    leaf = jax.tree_util.tree_leaves(v)[0]
    assert leaf.sharding.is_fully_replicated


def test_data_parallel_step_matches_single_device(tiny):
    """One fused dp step over 8 devices == the unsharded step (global
    batch-stat BN means the math is identical; only the layout differs)."""
    model, variables, X, y = tiny
    mesh = mesh_lib.make_mesh()

    t_dp = Trainer(model, variables, learning_rate=1e-3, mesh=mesh,
                   dropout=False)
    t_sd = Trainer(model, variables, learning_rate=1e-3, dropout=False)

    l_dp = t_dp.train_epoch([(X, y)])
    l_sd = t_sd.train_epoch([(X, y)])
    assert abs(l_dp - l_sd) < 1e-5

    # Adam normalizes by |g|, so elements with ~zero gradient get a
    # +-lr update whose *sign* depends on reduction order; allow a few
    # lr-sized deviations while requiring everything else to agree.
    lr = 1e-3
    n_big, n_total = 0, 0
    for a, b in zip(
        jax.tree_util.tree_leaves(t_dp.params),
        jax.tree_util.tree_leaves(t_sd.params),
    ):
        diff = np.abs(np.asarray(a) - np.asarray(b))
        assert diff.max() <= 2.5 * lr
        n_big += int((diff > 2e-5).sum())
        n_total += diff.size
    assert n_big / n_total < 0.02  # <2% of all params


def test_data_parallel_validation(tiny):
    model, variables, X, y = tiny
    mesh = mesh_lib.make_mesh()
    t_dp = Trainer(model, variables, learning_rate=1e-3, mesh=mesh)
    t_sd = Trainer(model, variables, learning_rate=1e-3)
    # validation needs T > 2*offset; tile time axis
    Xv = np.tile(X, (1, 1, 1, 5))
    yv = np.tile(y, (1, 1, 1, 5))
    a = t_dp.validate_epoch([(Xv, yv)])
    b = t_sd.validate_epoch([(Xv, yv)])
    assert abs(a - b) < 1e-6


def test_sequence_parallel_separation(tiny):
    """Patch-axis sharded whole-song separation == single-device."""
    from vocal_remover_tpu.separate.separator import Separator

    model, variables, _, _ = tiny
    rng = np.random.default_rng(7)
    wave = (rng.standard_normal((2, 32 * 4000)) * 0.3).astype(np.float32)

    sp1 = Separator(model, variables, batchsize=2, cropsize=256)
    y1, v1 = sp1.separate_wave(wave)

    mesh = mesh_lib.make_mesh()
    sp8 = Separator(model, variables, batchsize=2, cropsize=256, mesh=mesh)
    y8, v8 = sp8.separate_wave(wave)
    np.testing.assert_allclose(y8, y1, atol=2e-4)
    np.testing.assert_allclose(v8, v1, atol=2e-4)


def test_dryrun_multichip_entry():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
