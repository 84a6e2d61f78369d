"""Checkpoint converter CLI.

    python -m vocal_remover_tpu.cli.convert IN OUT [--n_fft ...]

Converts between the reference's torch `.pth` state_dicts
(reference train.py:286-290 output format) and this framework's native
`.vrt.npz` checkpoints, in either direction (by extension).
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument('input')
    p.add_argument('output')
    p.add_argument('--n_fft', '-f', type=int, default=2048)
    p.add_argument('--hop_length', '-H', type=int, default=1024)
    p.add_argument('--nout', type=int, default=32)
    p.add_argument('--nout_lstm', type=int, default=128)
    p.add_argument('--complex', action='store_true', dest='is_complex')
    p.add_argument('--quantize', choices=['int8'], default=None,
                   help='store conv/dense kernels as per-channel '
                        'symmetric int8 (~4x smaller file; dequantized '
                        'transparently on load)')
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from vocal_remover_tpu.models import CascadedNet, convert

    if args.output.endswith('.npz'):
        if args.input.endswith('.npz'):
            # native input carries its model config (e.g. re-encode
            # with --quantize); CLI flags only apply to torch inputs
            model, variables = convert.load_model(
                args.input, args.n_fft, args.hop_length, args.nout,
                args.nout_lstm,
            )
        else:
            model = CascadedNet(args.n_fft, args.hop_length, args.nout,
                                args.nout_lstm, args.is_complex)
            variables = convert.load_checkpoint(args.input, model)
        convert.save_native(args.output, variables,
                            convert.model_config(model),
                            quantize=args.quantize)
        tag = f' ({args.quantize} weights)' if args.quantize else ''
        print(f'wrote native checkpoint {args.output}{tag}')
    elif args.output.endswith('.pth'):
        model, variables = convert.load_model(
            args.input, args.n_fft, args.hop_length, args.nout,
            args.nout_lstm,
        )
        convert.export_torch(args.output, model, variables)
        print(f'wrote torch checkpoint {args.output}')
    else:
        raise SystemExit('output must end in .npz (native) or .pth (torch)')


if __name__ == '__main__':
    main()
