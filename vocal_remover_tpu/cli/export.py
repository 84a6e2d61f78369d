"""Export a checkpoint as a self-contained AOT serving artifact.

    python -m vocal_remover_tpu.cli.export model.vrt.npz model.vrtx

The output ``.vrtx`` file carries the exported StableHLO of the
patch->mask call (weights baked in, batch + crop-width symbolic) plus
the pipeline geometry — see ``separate/artifact.py``. ``--pretrained``
accepts native ``.vrt.npz`` checkpoints or reference ``.pth`` files
(converted on the fly). ``cli/inference.py -P model.vrtx`` serves it.
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(
        description="export an AOT serving artifact (.vrtx)"
    )
    p.add_argument('input', help='checkpoint (.vrt.npz or torch .pth)')
    p.add_argument('output', help='artifact path (.vrtx)')
    p.add_argument('--n_fft', '-f', type=int, default=2048)
    p.add_argument('--hop_length', '-H', type=int, default=1024)
    p.add_argument('--nout', type=int, default=32)
    p.add_argument('--nout_lstm', type=int, default=128)
    p.add_argument('--precision', default='bfloat16',
                   choices=['highest', 'default', 'bfloat16'],
                   help='numerics baked into the exported computation '
                        '(bfloat16 = the standard serving mode, '
                        '~103 dB output SNR vs strict f32)')
    p.add_argument('--no_serving_transform', action='store_true',
                   help='skip eval-BN folding + weight cast (export '
                        'the raw training-graph numerics)')
    p.add_argument('--platforms', default='tpu,cpu',
                   help='comma-separated lowering platforms')
    p.add_argument('--cropsizes', default='256,1024',
                   help='comma-separated crop geometries to export '
                        '(one exported entry each; batch is symbolic '
                        'within an entry). Default covers the '
                        'reference geometry and the wide-crop serving '
                        'geometry')
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from vocal_remover_tpu.models import convert
    from vocal_remover_tpu.nn import config as nn_config
    from vocal_remover_tpu.separate.artifact import export_artifact

    nn_config.set_precision(args.precision)
    model, variables = convert.load_model(
        args.input, args.n_fft, args.hop_length, args.nout,
        args.nout_lstm,
    )
    dtype = 'bfloat16' if args.precision == 'bfloat16' else None
    meta = export_artifact(
        model, variables, args.output,
        platforms=[s.strip() for s in args.platforms.split(',') if s],
        serving_transform=not args.no_serving_transform,
        dtype=None if args.no_serving_transform else dtype,
        cropsizes=[int(s) for s in args.cropsizes.split(',') if s],
    )
    import os

    print(
        f"wrote {args.output} ({os.path.getsize(args.output)} bytes): "
        f"{meta['model_config']['arch']} n_fft={meta['model_config']['n_fft']} "
        f"platforms={','.join(meta['platforms'])} "
        f"crops={meta['cropsizes']}"
    )


if __name__ == '__main__':
    main()
