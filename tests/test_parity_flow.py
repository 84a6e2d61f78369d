"""The one-command checkpoint-parity flow (scripts/parity.py) must run
end-to-end: torch .pth -> converted native checkpoint -> reference vs
ours on the same fixture -> wave-delta verdict. Exercised with a tiny
model; the real invocation (`make parity CHECKPOINT=baseline.pth`) uses
the released flagship checkpoint when available (VERDICT.md missing #3).
"""

import os
import sys

import numpy as np
import pytest
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.reference
def test_parity_script_end_to_end(reference_lib, tmp_path, capsys):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import parity

    torch.manual_seed(3)
    tmod = reference_lib.nets.CascadedNet(256, 128, 8, 16)
    ckpt = str(tmp_path / "tiny.pth")
    torch.save(tmod.state_dict(), ckpt)

    # cropsize must exceed 2*offset=128 for any patch to survive the
    # offset trim (same constraint as the reference)
    rc = parity.main([
        "--checkpoint", ckpt,
        "--sr", "8000", "--n_fft", "256", "--hop_length", "128",
        "--nout", "8", "--nout_lstm", "16",
        "--batchsize", "2", "--cropsize", "192",
    ])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "PARITY OK" in out
    # the converted native checkpoint is produced and carries its config
    npz = str(tmp_path / "tiny.vrt.npz")
    assert os.path.exists(npz)
    from vocal_remover_tpu.models import convert

    _, config = convert.load_native(npz)
    assert config["n_fft"] == 256 and config["nout"] == 8

    # the gate itself: an impossible tolerance must return failure
    # (on this CPU backend the two frameworks can match bit-exactly, so
    # the negative case forces a tolerance below zero)
    rc = parity.main([
        "--checkpoint", ckpt,
        "--sr", "8000", "--n_fft", "256", "--hop_length", "128",
        "--nout", "8", "--nout_lstm", "16",
        "--batchsize", "2", "--cropsize", "192",
        "--tolerance", "-1",
    ])
    assert rc == 1
