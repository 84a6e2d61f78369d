"""Loss-curve plotting from `loss_{ts}.json`
(reference appendix/plot_log.py:8-28)."""

from __future__ import annotations

import json
import sys

import numpy as np


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    with open(argv[0], encoding="utf8") as f:
        log = np.asarray(json.load(f))
    print(np.min(log, axis=0))
    trn_loss = log[:, 0]
    val_loss = log[:, 1]

    import matplotlib

    if len(argv) > 1:  # non-interactive: save to file
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.rcParams["font.size"] = 12
    plt.rcParams["legend.fontsize"] = 12

    plt.plot(np.arange(len(val_loss)), val_loss, label="validation loss",
             c="r")
    plt.plot(np.arange(len(trn_loss)), trn_loss, label="training loss",
             c="b")
    plt.grid(which="both", color="gray", linestyle="--")
    plt.xlabel("Epoch")
    plt.ylabel("Loss")
    plt.legend(edgecolor="white")
    if len(argv) > 1:
        plt.savefig(argv[1], dpi=120, bbox_inches="tight")
    else:
        plt.show()


if __name__ == "__main__":
    main()
