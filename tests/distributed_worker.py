"""Worker for the 2-process jax.distributed test (test_distributed.py).

Each process initializes jax.distributed against a shared coordinator,
builds the GLOBAL data-parallel mesh (2 procs x 2 virtual CPU devices =
4), computes one batch's gradients through the Trainer, and process 0
also computes the single-device reference gradients in the same process
and writes PASS/FAIL. Runs in float64 so the comparison is tight
(see tests/test_sharding.py x64_mode for why f32 can't be).
"""

import os
import sys


def main():
    coord, pid, nproc, outpath = sys.argv[1:5]
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2"
        ).strip()

    import jax

    jax.config.update("jax_enable_x64", True)

    import numpy as np

    from vocal_remover_tpu.nn import config as nn_config
    import jax.numpy as jnp

    nn_config.set_compute_dtype(jnp.float64)

    from vocal_remover_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address=coord,
        num_processes=int(nproc),
        process_id=int(pid),
    )
    assert jax.process_count() == int(nproc), jax.process_count()
    assert len(jax.devices()) == 2 * int(nproc), len(jax.devices())

    from vocal_remover_tpu.models.cascaded import CascadedNet
    from vocal_remover_tpu.parallel import mesh as mesh_lib
    from vocal_remover_tpu.train.step import Trainer

    def to64(tree):
        return jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float64), tree
        )

    model = CascadedNet(64, 32, 4, 8)
    variables = to64(model.init(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(1)
    X = np.abs(rng.standard_normal((8, 2, 33, 32)))  # same on every proc
    y = X * 0.6

    mesh = mesh_lib.make_mesh()  # global mesh across both processes
    trainer = Trainer(model, variables, learning_rate=1e-3, mesh=mesh,
                      dropout=False)
    Xd, yd = trainer._put_batch(X, y)
    rngk = jax.random.fold_in(trainer.base_key, 0)
    (loss_mp, _), grads_mp = trainer._grad(
        trainer.params, trainer.stats, Xd, yd, rngk
    )

    # grads are replicated (params replicated) => every shard holds the
    # full value; read the process-local shard
    def local(a):
        return np.asarray(a.addressable_data(0))

    grads_mp = jax.tree_util.tree_map(local, grads_mp)
    loss_mp = float(local(loss_mp))

    # sanity: disjoint per-host file sharding
    files = [f"song{i}" for i in range(5)]
    mine = distributed.shard_filelist(files)
    assert len(mine) in (2, 3)
    assert set(mine).issubset(files)

    if int(pid) != 0:
        return

    # single-device reference in the SAME process (mesh=None uses
    # jax.device_put -> first local device)
    t_ref = Trainer(model, variables, learning_rate=1e-3, dropout=False)
    loss_ref, grads_ref = t_ref.compute_grads(X, y)

    la = jax.tree_util.tree_leaves(grads_mp)
    lb = jax.tree_util.tree_leaves(grads_ref)
    scale = max(np.abs(b).max() for b in lb)
    assert abs(loss_mp - loss_ref) < 1e-9 * max(1.0, abs(loss_ref))
    for a, b in zip(la, lb):
        np.testing.assert_allclose(a, b, atol=1e-9 * scale, rtol=1e-7)

    with open(outpath, "w") as f:
        f.write("PASS")


if __name__ == "__main__":
    main()
