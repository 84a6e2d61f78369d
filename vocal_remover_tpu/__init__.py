"""vocal_remover_tpu — TPU-native audio source-separation framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
tsurumeso/vocal-remover (spectrogram-masking vocal/instrumental
separation with a cascaded multi-band U-Net + BiLSTM model), designed
for TPU: NHWC/MXU-native layers, fully vectorized whole-song inference,
pjit/NamedSharding data-parallel training, and real-array-only device
boundaries.

Layering (bottom-up):
  ops/       device compute kernels: STFT/iSTFT, bilinear resize,
             window math, patch extraction
  nn/        functional layer library (+ torch-compatible init)
  models/    BaseNet / CascadedNet + checkpoint conversion
  data/      host data pipeline (cache, crops, augmentation)
  parallel/  mesh + sharding policies
  train/     jitted train/eval steps, LR plateau schedule, checkpoints
  separate/  whole-song separation engine
  utils/     audio/image I/O, host spectrogram helpers
  cli/       reference-compatible command-line surfaces
"""

__version__ = "0.1.0"


def enable_compile_cache(subdir: str = ".jax_cache"):
    """Point JAX's persistent compilation cache at <repo>/<subdir> so
    repeat CLI invocations skip recompiles (minutes per new graph shape
    on small hosts). Safe to call any time before the first compile;
    silently a no-op if the backend rejects the config."""
    import os

    import jax

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(root, subdir)
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
