#!/usr/bin/env python
"""Cross-check bench.py's cost-analysis FLOP count per song.

Round-2 bench reported flops_per_song=1.324e12 (B=8 serving path, model
chunked via `lax.map`); round-3 (B=24, single chunk, no `lax.map`)
reports ~3x that. Hypothesis: XLA's cost analysis counts a `lax.map`
(while-loop) body ONCE, so the round-2 number undercounted the model by
the chunk count (3). This script settles it by cost-analyzing a single
patch with no loops anywhere and scaling by the exact patch count.

Run on CPU (JAX_PLATFORMS=cpu) — cost analysis is backend-portable for
FLOP counting purposes.
"""

import json

import jax
import jax.numpy as jnp

from vocal_remover_tpu.models import CascadedNet
from vocal_remover_tpu.ops.windowing import make_padding, num_patches

SR = 44100
SECONDS = 60
N_FFT = 2048
HOP = 1024


def main():
    model = CascadedNet(N_FFT, HOP, 32, 128)
    variables = model.init(jax.random.PRNGKey(0))

    # exact patch geometry of a 60 s song (matches Separator._pad_spec
    # with the B=24 bucket)
    n_samples = SR * SECONDS
    n_frame = n_samples // HOP + 1
    pad_l, pad_r, roi = make_padding(n_frame, 256, model.offset)
    n = num_patches(pad_l + n_frame + pad_r, roi, model.offset)
    n_bucket = -(-n // 24) * 24

    x1 = jnp.zeros((1, model.output_bin, 256, 2), jnp.float32)
    f1 = jax.jit(lambda v, x: model.predict_mask(v, x))
    c1 = f1.lower(variables, x1).compile().cost_analysis()
    c1 = c1[0] if isinstance(c1, (list, tuple)) else c1
    per_patch = float(c1["flops"])

    print(json.dumps({
        "n_frame": n_frame,
        "roi": roi,
        "n_patches": n,
        "n_bucket": n_bucket,
        "flops_per_patch": per_patch,
        "model_flops_per_song": per_patch * n,
        "model_flops_per_bucketed_song": per_patch * n_bucket,
        "r2_bench_flops_per_song": 1.324e12,
        "r3_bench_flops_per_song_approx": 3.9e12,
    }))


if __name__ == "__main__":
    main()
