"""`train.py` CLI — flag-compatible with the reference
(reference train.py:137-294), running jitted TPU training.

TPU-native extensions beyond the reference surface:
  --data_parallel N   shard the batch over an N-device mesh (0 = all
                      local devices); gradients psum over ICI
  --resume PATH       resume a full training state (params + optimizer +
                      scheduler + epoch; the reference can only
                      warm-start weights)
  --precision         f32-faithful vs fast MXU math
"""

from __future__ import annotations

import argparse
import json
import os
import random
from datetime import datetime

import numpy as np


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument('--gpu', '-g', type=int, default=-1)
    p.add_argument('--seed', '-s', type=int, default=2019)
    p.add_argument('--sr', '-r', type=int, default=44100)
    p.add_argument('--hop_length', '-H', type=int, default=1024)
    p.add_argument('--n_fft', '-f', type=int, default=2048)
    p.add_argument('--dataset', '-d', required=True)
    p.add_argument('--split_mode', '-S', type=str, default='random',
                   choices=['random', 'subdirs'])
    p.add_argument('--learning_rate', '-l', type=float, default=0.001)
    p.add_argument('--lr_min', type=float, default=0.0001)
    p.add_argument('--lr_decay_factor', type=float, default=0.9)
    p.add_argument('--lr_decay_patience', type=int, default=6)
    p.add_argument('--batchsize', '-B', type=int, default=4)
    p.add_argument('--accumulation_steps', '-A', type=int, default=1)
    p.add_argument('--cropsize', '-C', type=int, default=256)
    p.add_argument('--patches', '-p', type=int, default=16)
    p.add_argument('--val_rate', '-v', type=float, default=0.2)
    p.add_argument('--val_filelist', '-V', type=str, default=None)
    p.add_argument('--val_batchsize', '-b', type=int, default=4)
    p.add_argument('--val_cropsize', '-c', type=int, default=256)
    p.add_argument('--num_workers', '-w', type=int, default=4)
    p.add_argument('--epoch', '-E', type=int, default=200)
    p.add_argument('--reduction_rate', '-R', type=float, default=0.0)
    p.add_argument('--reduction_level', '-L', type=float, default=0.2)
    p.add_argument('--mixup_rate', '-M', type=float, default=0.0)
    p.add_argument('--mixup_alpha', '-a', type=float, default=1.0)
    p.add_argument('--mono_rate', type=float, default=0.0,
                   help='mono-mix augmentation probability (dormant in '
                        'the reference: lib/dataset.py:81-83)')
    p.add_argument('--pretrained_model', '-P', type=str, default=None)
    p.add_argument('--aux_lambda', type=float, default=0.0,
                   help='deep-supervision weight for the aux mask head '
                        '(the reference ships the head untrained, '
                        'nets.py:80; 0 disables = reference behavior)')
    p.add_argument('--is_complex', action='store_true',
                   help='complex-mask training: re/im channel pairs, '
                        'tanh-bounded complex masks (the reference '
                        'sketches this dormant at nets.py:83-84, '
                        'train.py:85-86; first-class here, end-to-end '
                        'through Separator)')
    p.add_argument('--wave_loss', type=str, default=None,
                   choices=['sdr', 'weighted_sdr'],
                   help='add a wave-domain SDR loss through the device '
                        'iSTFT (the reference defines these but leaves '
                        'them commented out, train.py:46-65, 83-88). '
                        'Requires --is_complex: magnitude batches carry '
                        'no phase to invert')
    p.add_argument('--wave_loss_weight', type=float, default=0.01,
                   help='weight of the wave-domain loss term (the '
                        "reference's commented-out factor, train.py:84)")
    p.add_argument('--debug', action='store_true')
    # TPU-native extensions
    p.add_argument('--data_parallel', type=int, default=1,
                   help='devices in the data-parallel mesh (0 = all)')
    p.add_argument('--resume', type=str, default=None,
                   help='full train-state checkpoint to resume from')
    p.add_argument('--precision', type=str, default='highest',
                   choices=['highest', 'default', 'bfloat16'],
                   help='highest = f32-faithful (parity with the '
                        'reference); default = bf16 MXU multiplies, '
                        'f32 activations; bfloat16 = bf16 activations '
                        'end-to-end (experimental mixed-precision '
                        'training, ~10%% faster steps)')
    p.add_argument('--transfer_dtype', type=str, default=None,
                   choices=['float32', 'bfloat16', 'int8'],
                   help='dtype for host->device batch staging (bf16 '
                        'halves link traffic; int8 quarters it via '
                        'per-batch linear quantization — a throughput/'
                        'quality trade, magnitudes only; loss is '
                        'computed in f32 after an on-device dequant). '
                        'Default: float32 under --precision highest '
                        '(f32-faithful mode must not truncate inputs), '
                        'bfloat16 otherwise.')
    p.add_argument('--remat', action='store_true',
                   help='rematerialize band-net stages in the backward '
                        'pass (jax.checkpoint): ~1 extra forward of '
                        'FLOPs for a large peak-activation-memory cut; '
                        'use for batch/cropsize configs that OOM')
    p.add_argument('--device_data_cache', action='store_true',
                   help='keep the whole dataset resident in device HBM '
                        '(bf16 magnitudes) and run crops + augmentation '
                        'inside the jitted step: ~100 bytes H2D per '
                        'step instead of megabytes. Needs the dataset '
                        'to fit on-chip; magnitude path only '
                        '(no --is_complex / mixup / mono).')
    p.add_argument('--output_dir', type=str, default='models')
    return p


def reduction_weight_ramp(n_fft: int, sr: int, reduction_level: float):
    """Frequency ramp for the vocal-reduction augmentation (reference
    train.py:197-205): 0->1 below 200 Hz, 1->0 up to 22050 Hz, 0 above,
    scaled by reduction_level. Shape (bins, 1)."""
    bins = n_fft // 2 + 1
    freq_to_bin = 2 * bins / sr
    # clamp to the spectrum: identity at the reference's 44.1k default
    # (stable == bins there), required for lower sample rates where
    # 22050 Hz exceeds Nyquist (the reference crashes then)
    unstable_bins = min(int(200 * freq_to_bin), bins)
    stable_bins = min(int(22050 * freq_to_bin), bins)
    arr = np.concatenate([
        np.linspace(0, 1, unstable_bins, dtype=np.float32)[:, None],
        np.linspace(1, 0, stable_bins - unstable_bins,
                    dtype=np.float32)[:, None],
        np.zeros((bins - stable_bins, 1), dtype=np.float32),
    ])
    return arr * reduction_level


def main(argv=None):
    args = build_parser().parse_args(argv)
    from vocal_remover_tpu import enable_compile_cache

    enable_compile_cache()
    timestamp = datetime.now().strftime('%Y%m%d%H%M%S')

    from vocal_remover_tpu.data import cache, dataset, pairing
    from vocal_remover_tpu.data.loader import Loader
    from vocal_remover_tpu.parallel import distributed
    from vocal_remover_tpu.models import CascadedNet, convert
    from vocal_remover_tpu.nn import config as nn_config
    from vocal_remover_tpu.parallel import mesh as mesh_lib
    from vocal_remover_tpu.train import checkpoint
    from vocal_remover_tpu.train.logging import setup_logger
    from vocal_remover_tpu.train.plateau import ReduceLROnPlateau
    from vocal_remover_tpu.train.step import Trainer
    import jax

    logger = setup_logger(__name__, f'train_{timestamp}.log')
    logger.debug(vars(args))
    nn_config.set_precision(args.precision)
    distributed.initialize()  # no-op single-host; TPU-VM auto multi-host

    random.seed(args.seed)
    np.random.seed(args.seed)

    val_filelist = []
    if args.val_filelist is not None:
        with open(args.val_filelist, encoding='utf8') as f:
            val_filelist = json.load(f)

    train_filelist, val_filelist = pairing.train_val_split(
        dataset_dir=args.dataset,
        split_mode=args.split_mode,
        val_rate=args.val_rate,
        val_filelist=val_filelist,
    )

    if args.debug:
        logger.info('### DEBUG MODE')
        train_filelist = train_filelist[:1]
        val_filelist = val_filelist[:1]
    elif args.val_filelist is None and args.split_mode == 'random':
        with open(f'val_{timestamp}.json', 'w', encoding='utf8') as f:
            json.dump(val_filelist, f, ensure_ascii=False)

    for i, (X_fname, y_fname) in enumerate(val_filelist):
        logger.info(
            '{} {} {}'.format(
                i + 1, os.path.basename(X_fname), os.path.basename(y_fname)
            )
        )

    reduction_weight = reduction_weight_ramp(
        args.n_fft, args.sr, args.reduction_level
    )

    model = CascadedNet(args.n_fft, args.hop_length, 32, 128,
                        is_complex=args.is_complex)
    if args.pretrained_model is not None:
        variables = convert.load_checkpoint(args.pretrained_model, model)
    else:
        variables = model.init(jax.random.PRNGKey(args.seed))

    mesh = None
    if args.data_parallel != 1:
        n = args.data_parallel if args.data_parallel > 0 else None
        mesh = mesh_lib.make_mesh(n_data=n)
        logger.info(f'data-parallel mesh: {mesh.shape}')

    import jax.numpy as jnp

    transfer_dtype = args.transfer_dtype
    if transfer_dtype is None:
        transfer_dtype = (
            'float32' if args.precision == 'highest' else 'bfloat16'
        )
    logger.info(f'batch staging dtype: {transfer_dtype}')

    trainer = Trainer(
        model,
        variables,
        learning_rate=args.learning_rate,
        accumulation_steps=args.accumulation_steps,
        mesh=mesh,
        seed=args.seed,
        transfer_dtype=(
            'int8' if transfer_dtype == 'int8'
            else jnp.bfloat16 if transfer_dtype == 'bfloat16'
            else None
        ),
        aux_lambda=args.aux_lambda,
        remat=args.remat,
        wave_loss=args.wave_loss,
        wave_loss_weight=args.wave_loss_weight,
    )
    scheduler = ReduceLROnPlateau(
        lr=args.learning_rate,
        factor=args.lr_decay_factor,
        patience=args.lr_decay_patience,
        threshold=1e-6,
        min_lr=args.lr_min,
    )

    # multi-host: each host caches/augments a disjoint stride of the
    # songs (decorrelated crops via host_seed); the global batch is
    # still mesh-sharded per step
    _, n_hosts = distributed.process_info()
    if n_hosts > 1:
        train_filelist = distributed.shard_filelist(train_filelist)
        logger.info(
            f'host shard: {len(train_filelist)} songs on this host'
        )

    training_set = cache.make_training_set(
        filelist=train_filelist,
        sr=args.sr,
        hop_length=args.hop_length,
        n_fft=args.n_fft,
    )
    loader_seed = (distributed.host_seed(args.seed) if n_hosts > 1
                   else args.seed)
    device_source = None
    if args.device_data_cache:
        if n_hosts > 1:
            # each host holds a different song shard, so the resident
            # arrays would differ per process while claiming a
            # replicated global-mesh sharding — a collective mismatch.
            # Per-host device caches need host-local meshes (future
            # work); the host data path handles multi-host today.
            raise SystemExit(
                '--device_data_cache is single-host only; multi-host '
                'runs use the host data path'
            )
        from vocal_remover_tpu.data.device_cache import (
            DeviceLoader,
            DeviceTrainingSource,
        )

        device_source = DeviceTrainingSource(
            training_set * args.patches,
            cropsize=args.cropsize,
            reduction_rate=args.reduction_rate,
            reduction_weight=reduction_weight,
            mixup_rate=args.mixup_rate,
            mono_rate=args.mono_rate,
            is_complex=args.is_complex,
            seed=args.seed,
            # resident dtype follows the staging mode: f32-faithful
            # under --precision highest, bf16 (half the HBM) otherwise
            dtype=(jnp.float32 if transfer_dtype == 'float32'
                   else jnp.bfloat16),
            mesh=mesh,
        )
        train_loader = DeviceLoader(
            device_source,
            batchsize=args.batchsize,
            shuffle=True,
            seed=loader_seed,
        )
        logger.info(
            'device-resident dataset: {} songs, {:.1f} MB HBM'.format(
                len(training_set), device_source.nbytes / 1e6
            )
        )
    else:
        train_dataset = dataset.TrainingSet(
            training_set * args.patches,
            cropsize=args.cropsize,
            reduction_rate=args.reduction_rate,
            reduction_weight=reduction_weight,
            mixup_rate=args.mixup_rate,
            mixup_alpha=args.mixup_alpha,
            seed=args.seed,
            mono_rate=args.mono_rate,
            is_complex=args.is_complex,
        )
        train_loader = Loader(
            train_dataset,
            batchsize=args.batchsize,
            shuffle=True,
            num_workers=args.num_workers,
            seed=loader_seed,
        )

    patch_list = dataset.make_validation_set(
        filelist=val_filelist,
        cropsize=args.val_cropsize,
        sr=args.sr,
        hop_length=args.hop_length,
        n_fft=args.n_fft,
        offset=model.offset,
    )
    val_source = None
    if device_source is not None:
        from vocal_remover_tpu.data.device_cache import (
            DeviceValidationSource,
        )

        val_source = DeviceValidationSource(
            patch_list,
            is_complex=args.is_complex,
            dtype=(jnp.float32 if transfer_dtype == 'float32'
                   else jnp.bfloat16),
            mesh=mesh,
        )
        val_loader = None
        logger.info(
            'device-resident validation: {} patches, {:.1f} MB HBM'
            .format(len(val_source), val_source.nbytes / 1e6)
        )
    else:
        val_dataset = dataset.ValidationSet(patch_list=patch_list,
                                            is_complex=args.is_complex)
        val_loader = Loader(
            val_dataset,
            batchsize=args.val_batchsize,
            shuffle=False,
            num_workers=args.num_workers,
        )

    start_epoch = 0
    best_loss = np.inf
    if args.resume is not None:
        start_epoch, best_loss = checkpoint.load_train_state(
            args.resume, trainer, scheduler
        )
        start_epoch += 1
        # continue the exact crop/augmentation stream an uninterrupted
        # run would have produced (shuffle + per-item draws are pure
        # functions of (seed, epoch))
        train_loader.set_epoch(start_epoch)
        logger.info(f'resumed from {args.resume} at epoch {start_epoch}')

    os.makedirs(args.output_dir, exist_ok=True)
    log = []
    for epoch in range(start_epoch, args.epoch):
        logger.info('# epoch {}'.format(epoch))
        if device_source is not None:
            train_loss = trainer.train_epoch_device(
                device_source, train_loader
            )
        else:
            train_loss = trainer.train_epoch(train_loader)
        if val_source is not None:
            val_loss = trainer.validate_epoch_device(
                val_source, args.val_batchsize
            )
        else:
            val_loss = trainer.validate_epoch(val_loader)

        logger.info(
            '  * training loss = {:.6f}, validation loss = {:.6f}'
            .format(train_loss, val_loss)
        )

        new_lr = scheduler.step(val_loss)
        trainer.set_learning_rate(new_lr)

        if val_loss < best_loss:
            best_loss = val_loss
            logger.info('  * best validation loss')
            model_path = os.path.join(
                args.output_dir, f'model_iter{epoch}.vrt.npz'
            )
            checkpoint.save_model(model_path, model, trainer)

        checkpoint.save_train_state(
            os.path.join(args.output_dir, 'train_state.msgpack'),
            trainer, scheduler, epoch, best_loss,
        )

        log.append([train_loss, val_loss])
        with open(f'loss_{timestamp}.json', 'w', encoding='utf8') as f:
            json.dump(log, f, ensure_ascii=False)


if __name__ == '__main__':
    main()
