"""`inference.py` CLI — flag-compatible with the reference
(reference inference.py:107-189), running the TPU pipeline.

Differences by design:
  * --pretrained_model accepts either a native `.vrt.npz` checkpoint or
    a reference torch `.pth` (converted on the fly; needs torch).
  * --gpu is accepted for surface compatibility; device selection is
    JAX-platform-driven (TPU when available).
  * --precision {highest,default} picks f32-faithful vs fast-bf16 MXU
    math (default: highest, matching the reference's f32 numerics).
"""

from __future__ import annotations

import argparse
import contextlib
import os
import time

import numpy as np


@contextlib.contextmanager
def _stage(label: str):
    """Timed progress line per pipeline stage."""
    t0 = time.perf_counter()
    yield
    print(f"  {label}: {time.perf_counter() - t0:.2f}s", flush=True)


MODEL_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "models",
)
DEFAULT_MODEL_PATH = os.path.join(MODEL_DIR, "baseline.vrt.npz")


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument('--gpu', '-g', type=int, default=-1)
    p.add_argument('--pretrained_model', '-P', type=str,
                   default=DEFAULT_MODEL_PATH)
    group = p.add_mutually_exclusive_group(required=True)
    group.add_argument('--input', '-i')
    group.add_argument('--input_dir', type=str,
                       help='separate every audio file in a directory '
                            'through the pipelined serving path')
    p.add_argument('--sr', '-r', type=int, default=44100)
    p.add_argument('--n_fft', '-f', type=int, default=2048)
    p.add_argument('--hop_length', '-H', type=int, default=1024)
    p.add_argument('--batchsize', '-B', type=int, default=None,
                   help='model-call chunk size (default: 4, matching '
                        'the reference; directory mode defaults to 24)')
    p.add_argument('--cropsize', '-c', type=int, default=None,
                   help='patch width in frames (default: 256, matching '
                        'the reference; directory mode defaults to the '
                        'measured-fastest wide-crop 1024 — 1.6x less '
                        'overlap compute, ~90 dB output SNR vs 256)')
    p.add_argument('--output_image', '-I', action='store_true')
    p.add_argument('--tta', '-t', action='store_true')
    p.add_argument('--postprocess', '-p', action='store_true')
    p.add_argument('--output_dir', '-o', type=str, default="")
    p.add_argument('--precision', type=str, default=None,
                   choices=['highest', 'default', 'bfloat16', 'int8'],
                   help='highest = f32-faithful (single-file default); '
                        'default = bf16 MXU multiplies; bfloat16 = '
                        'serving mode (folded BatchNorm, bf16-resident '
                        'weights and activations; masks differ from f32 '
                        'at ~1e-4; directory-mode default); int8 = '
                        'EXPERIMENTAL quantized serving (per-channel '
                        'int8 conv weights; measured SLOWER than '
                        'bfloat16 on this model — see BENCH_NOTES)')
    p.add_argument('--lstm_impl', type=str, default='scan',
                   choices=['scan', 'pallas'],
                   help='pallas = fused TPU recurrence kernel')
    p.add_argument('--flat_conv', action='store_true',
                   help='run the band-net enc2..enc3 convs as pixel-'
                        'packed flat Pallas kernels (nn/conv_pack.py). '
                        'Exact parity with the XLA forward; measured '
                        'slower end-to-end on the flagship geometry '
                        '(boundary relayouts outweigh the kernel win, '
                        'BENCH_NOTES round 4) — opt-in for geometries '
                        'where the balance differs')
    p.add_argument('--profile', type=str, default=None, metavar='DIR',
                   help='capture a jax.profiler trace of the separation '
                        'into DIR (view with tensorboard/xprof)')
    p.add_argument('--stream', action='store_true',
                   help='segment-streamed separation: constant memory '
                        'and a single compile for any input length '
                        '(auto-enabled above 20 minutes of audio)')
    p.add_argument('--exact_length', action='store_true',
                   help='compile the device pipeline for the exact song '
                        'length instead of padding to 30 s buckets '
                        '(bit-faithful song tail, but each new length '
                        'pays a fresh multi-minute compile)')
    p.add_argument('--group', type=int, default=None,
                   help='directory mode: cross-song patch batching — '
                        'stack N equal-length (bucketed) songs into one '
                        'merged model stream per device dispatch; '
                        'raises device utilization at wide --cropsize '
                        'where one song has few patches (directory-mode '
                        'default: 8; pass 1 to disable). Leftover '
                        'partial groups run per-song, so ragged tails '
                        'cost no padding work')
    p.add_argument('--data_parallel', type=int, default=1,
                   help='shard the patch axis of each song over an '
                        'N-device mesh (0 = all local devices; '
                        'sequence parallelism — patches are halo-free '
                        'by the windowing contract)')
    return p


def _inference_mesh(n: int):
    if n == 1:
        return None
    from vocal_remover_tpu.parallel import mesh as mesh_lib

    return mesh_lib.make_mesh(n_data=n if n > 0 else None, n_model=1)


def _run_batch(args, model, variables):
    """Directory mode: pipelined serving over every audio file.

    Song lengths are zero-padded up to 30 s buckets so jitted pipeline
    shapes are shared across songs (bounded compiles); outputs are
    trimmed back before writing.
    """
    import numpy as np

    from vocal_remover_tpu.data.pairing import INPUT_EXTS
    from vocal_remover_tpu.separate.separator import Separator
    from vocal_remover_tpu.separate.service import SeparatorService
    from vocal_remover_tpu.utils import audio

    if args.postprocess or args.output_image:
        raise SystemExit(
            "--input_dir uses the pure-device serving path; "
            "--postprocess/--output_image require single-file mode"
        )

    files = sorted(
        os.path.join(args.input_dir, f)
        for f in os.listdir(args.input_dir)
        if os.path.splitext(f)[1].lower() in INPUT_EXTS
    )
    if not files:
        raise SystemExit(f"no audio files in {args.input_dir!r}")

    output_dir = args.output_dir
    if output_dir != "":
        output_dir = output_dir.rstrip('/') + '/'
        os.makedirs(output_dir, exist_ok=True)

    bucket = 30 * args.sr  # 30 s granularity
    lengths = []

    def gen():
        for path in files:
            X, _ = audio.load(path, sr=args.sr, mono=False)
            if X.ndim == 1:
                X = np.stack([X, X])
            n = X.shape[-1]
            lengths.append(n)
            padded = -(-n // bucket) * bucket
            yield np.pad(X, ((0, 0), (0, padded - n)))

    if args.group > 1 and args.data_parallel != 1:
        raise SystemExit(
            "--group batches songs on one chip; combine with "
            "--data_parallel is not supported (pick one axis)"
        )
    sp = Separator(model, variables, batchsize=args.batchsize,
                   cropsize=args.cropsize,
                   mesh=_inference_mesh(args.data_parallel))
    svc = SeparatorService(sp, pcm16_io=True, tta=args.tta,
                           vocals_residual=True, group=args.group)

    for i, (y, v) in enumerate(svc.map(gen())):
        basename = os.path.splitext(os.path.basename(files[i]))[0]
        n = lengths[i]
        audio.write_wav(
            f'{output_dir}{basename}_Instruments.wav',
            y[:, :n].astype(np.float32) / 32768.0, args.sr,
        )
        audio.write_wav(
            f'{output_dir}{basename}_Vocals.wav',
            v[:, :n].astype(np.float32) / 32768.0, args.sr,
        )
        print(basename, 'done')


def main(argv=None):
    args = build_parser().parse_args(argv)
    # Unset performance flags resolve per mode: single-file mode keeps
    # the reference's faithful defaults (crop 256 / batch 4 / f32);
    # directory mode is the serving path and defaults to the measured-
    # fastest configuration (wide crop + grouped patch batching + the
    # bf16 serving transform — BENCH_NOTES.md round 3/4).
    dir_mode = args.input_dir is not None
    if args.cropsize is None:
        args.cropsize = 1024 if dir_mode else 256
    if args.batchsize is None:
        args.batchsize = 24 if dir_mode else 4
    if args.group is None:
        args.group = 8 if (dir_mode and args.data_parallel == 1) else 1
    if args.precision is None:
        args.precision = 'bfloat16' if dir_mode else 'highest'
    from vocal_remover_tpu import enable_compile_cache

    enable_compile_cache()

    from vocal_remover_tpu.models import convert
    from vocal_remover_tpu.nn import config as nn_config
    from vocal_remover_tpu.ops import stft as stft_ops
    from vocal_remover_tpu.separate.separator import Separator
    from vocal_remover_tpu.utils import audio, image, spec

    # 'int8' is a serving-variables transform (quantized conv kernels
    # dispatched per-leaf by nn/functional.conv2d); the surrounding
    # activations run in bf16 compute mode
    nn_config.set_precision(
        'bfloat16' if args.precision == 'int8' else args.precision
    )
    nn_config.set_lstm_impl(args.lstm_impl)

    with _stage('load model'):
        if args.pretrained_model.endswith('.vrtx'):
            # AOT serving artifact: weights + serving transform are
            # baked into the exported computation (separate/artifact.py)
            from vocal_remover_tpu.separate.artifact import load_artifact

            model = load_artifact(args.pretrained_model)
            variables = {}
            if args.cropsize not in model.cropsizes:
                raise SystemExit(
                    f"artifact carries cropsizes {model.cropsizes}; "
                    f"pass --cropsize one of those (got {args.cropsize})"
                )
        else:
            model, variables = convert.load_model(
                args.pretrained_model, args.n_fft, args.hop_length, 32,
                128,
            )
            if args.precision in ('bfloat16', 'int8') or args.flat_conv:
                # serving transform: eval-BN folding + bf16-resident
                # weights (halves weight HBM traffic; pairs with bf16
                # activations); int8 additionally quantizes the conv
                # stack to per-channel int8 MXU kernels
                from vocal_remover_tpu.models import serving

                # only 'bfloat16'/'int8' are weight transforms —
                # 'highest'/'default' keep f32 weights (dtype=None)
                variables = serving.serving_variables(
                    variables,
                    args.precision
                    if args.precision in ('bfloat16', 'int8') else None,
                    model=model, flat=args.flat_conv,
                )

    if args.profile is not None:
        import jax

        jax.profiler.start_trace(args.profile)

    try:
        if args.input_dir is not None:
            return _run_batch(args, model, variables)
        _run_single(args, model, variables)
    finally:
        if args.profile is not None:
            jax.profiler.stop_trace()


def _run_single(args, model, variables):
    from vocal_remover_tpu.models import convert  # noqa: F401
    from vocal_remover_tpu.nn import config as nn_config  # noqa: F401
    from vocal_remover_tpu.ops import stft as stft_ops
    from vocal_remover_tpu.separate.separator import Separator
    from vocal_remover_tpu.utils import audio, image, spec

    with _stage('load audio'):
        X, sr = audio.load(args.input, sr=args.sr, mono=False)
    basename = os.path.splitext(os.path.basename(args.input))[0]

    if X.ndim == 1:
        X = np.asarray([X, X])  # mono to stereo

    sp = Separator(
        model=model,
        variables=variables,
        batchsize=args.batchsize,
        cropsize=args.cropsize,
        postprocess=args.postprocess,
        mesh=_inference_mesh(args.data_parallel),
    )

    output_dir = args.output_dir
    if output_dir != "":
        output_dir = output_dir.rstrip('/') + '/'
        os.makedirs(output_dir, exist_ok=True)

    inst_path = '{}{}_Instruments.wav'.format(output_dir, basename)
    vocal_path = '{}{}_Vocals.wav'.format(output_dir, basename)

    long_audio = X.shape[-1] > 20 * 60 * sr
    # the streamed path is magnitude-mask only; complex checkpoints
    # take the monolithic device pipeline regardless of length.
    # TTA runs inside the segment function; postprocess streams in two
    # phases (masks -> host artifact merge -> apply).
    if (args.stream or long_audio) and not args.output_image \
            and not model.is_complex:
        from vocal_remover_tpu.separate.streaming import StreamingSeparator

        with _stage('separate (streamed segments)'):
            stream = StreamingSeparator(model, variables,
                                        batchsize=args.batchsize,
                                        pcm16_io=True, vocals_residual=True,
                                        tta=args.tta,
                                        postprocess=args.postprocess)
            y_wave, v_wave = stream.separate_wave(X)
        audio.write_wav(inst_path, y_wave.astype(np.float32) / 32768.0, sr)
        audio.write_wav(vocal_path, v_wave.astype(np.float32) / 32768.0, sr)
        return

    if not args.postprocess and not args.output_image:
        # pure-device fast path: STFT -> model -> mask -> iSTFT in one
        # jitted call, PCM16 exchanged with the host; song lengths are
        # padded to 30 s buckets so executables are shared across songs
        # (same scheme as --input_dir serving)
        bucket = None if args.exact_length else 30 * sr
        with _stage('separate (device pipeline)'):
            y_wave, v_wave = sp.separate_wave(X, tta=args.tta, pcm16_io=True,
                                              bucket=bucket)
        audio.write_wav(inst_path, y_wave.astype(np.float32) / 32768.0, sr)
        audio.write_wav(vocal_path, v_wave.astype(np.float32) / 32768.0, sr)
        return

    with _stage('stft'):
        X_spec = stft_ops.stft_np(X, args.n_fft, args.hop_length)

    with _stage('separate'):
        if args.tta:
            y_spec, v_spec = sp.separate_tta(X_spec)
        else:
            y_spec, v_spec = sp.separate(X_spec)

    with _stage('istft + write instruments'):
        wave = stft_ops.istft_np(y_spec, args.n_fft, args.hop_length)
        audio.write_wav(inst_path, wave, sr)

    with _stage('istft + write vocals'):
        wave = stft_ops.istft_np(v_spec, args.n_fft, args.hop_length)
        audio.write_wav(vocal_path, wave, sr)

    if args.output_image:
        img = spec.spectrogram_to_image(y_spec)
        image.imwrite('{}{}_Instruments.jpg'.format(output_dir, basename), img)
        img = spec.spectrogram_to_image(v_spec)
        image.imwrite('{}{}_Vocals.jpg'.format(output_dir, basename), img)


if __name__ == '__main__':
    main()
