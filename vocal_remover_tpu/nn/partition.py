"""Split/merge variables into trainable parameters vs batchnorm stats.

The variables pytree produced by the layer library holds both trainable
weights and BatchNorm running statistics ('mean'/'var' leaves). The
optimizer must only touch the former; the train step threads the latter
through as auxiliary state.
"""

from __future__ import annotations

STAT_KEYS = ("mean", "var")


def partition(variables):
    """-> (params, stats): two nested dicts partitioning the leaves."""
    params, stats = {}, {}
    for k, v in variables.items():
        if isinstance(v, dict):
            p, s = partition(v)
            if p:
                params[k] = p
            if s:
                stats[k] = s
        elif k in STAT_KEYS:
            stats[k] = v
        else:
            params[k] = v
    return params, stats


def merge(params, stats):
    """Inverse of `partition`."""
    out = dict(stats)
    for k, v in params.items():
        if isinstance(v, dict) and k in out:
            out[k] = merge(v, out[k])
        else:
            out[k] = v
    return out
