"""AOT serving artifacts: the model's hot call exported to StableHLO.

The reference deploys by shipping ``lib/nets.py`` plus a pickled
``.pth`` and re-building torch modules on the serving host (reference
inference.py:128-131). The TPU-native deployment contract here is one
self-contained file instead: the patch->mask function — the only thing
a serving host ever executes — is exported once per crop geometry with
``jax.export`` (weights baked in after the eval-BN-fold / bf16 serving
transform, batch dimension symbolic; the crop *width* is pinned per
entry because the decoder's align_corners interp matrices are built
from static widths, so one artifact carries a small set of geometries
— default 256 plus the wide-crop 1024) and serialized together with
the model's pipeline geometry. A serving host needs only this file: no
model code, no checkpoint, no pickle, no re-trace. ``ArtifactModel``
exposes the four attributes the pipeline reads (``n_fft``,
``hop_length``, ``offset``, ``is_complex``) plus ``__call__``, so a
loaded artifact slots into the full device serving stack —
``Separator`` / ``SeparatorService`` / the streamed path — unchanged.

File format (``.vrtx``): a zip holding
  meta.json          geometry + provenance (format version, model
                     config, serving transform, jax version, platforms)
  exported_<W>.bin   ``jax.export`` serialization of the patch->mask
                     call at crop width W (symbolic batch)

Artifacts are exported for ``("tpu", "cpu")`` by default so the same
file serves on TPU and runs in CPU CI.
"""

from __future__ import annotations

import json
import zipfile

import numpy as np

FORMAT_VERSION = 1
ARTIFACT_SUFFIX = ".vrtx"
DEFAULT_PLATFORMS = ("tpu", "cpu")


DEFAULT_CROPSIZES = (256, 1024)


def export_artifact(model, variables, path, *, platforms=None,
                    serving_transform=True, dtype=None,
                    cropsizes=DEFAULT_CROPSIZES):
    """Export ``model(variables, x)`` (x: [batch, bins, crop, C]) to
    ``path``, once per crop width in ``cropsizes``.

    ``variables`` are baked into the artifact as constants, after the
    standard serving transform (BN fold + optional weight cast to
    ``dtype``) unless ``serving_transform=False``. The batch dimension
    is symbolic in every entry (any ``--batchsize`` reuses one entry);
    crop widths are pinned per entry — the decoder's align_corners
    interpolation matrices (ops/resize.py) have width-dependent static
    shapes, so a width-symbolic export cannot lower. The default set
    covers the reference geometry (256) and the wide-crop serving
    geometry (1024).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from vocal_remover_tpu.models import convert as convert_lib

    cropsizes = sorted({int(c) for c in cropsizes})
    if not cropsizes:
        raise ValueError("need at least one cropsize")
    if serving_transform:
        from vocal_remover_tpu.models import serving

        variables = serving.serving_variables(variables, dtype)
    platforms = tuple(platforms or DEFAULT_PLATFORMS)
    channels = 4 if model.is_complex else 2

    def fn(x):
        return model(variables, x)

    blobs = {}
    for crop in cropsizes:
        if crop <= 2 * model.offset:
            raise ValueError(
                f"cropsize {crop} leaves no roi (offset {model.offset})"
            )
        (b,) = jexport.symbolic_shape("b")
        sds = jax.ShapeDtypeStruct(
            (b, model.output_bin, crop, channels), jnp.float32
        )
        exported = jexport.export(jax.jit(fn), platforms=platforms)(sds)
        blobs[crop] = exported.serialize()

    meta = {
        "format_version": FORMAT_VERSION,
        "kind": "patch_mask",
        "model_config": convert_lib.model_config(model),
        "offset": int(model.offset),
        "output_bin": int(model.output_bin),
        "channels": channels,
        "cropsizes": cropsizes,
        "serving_transform": bool(serving_transform),
        "weights_dtype": dtype or "float32",
        "platforms": list(platforms),
        "jax_version": jax.__version__,
    }
    tmp = f"{path}.tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=1))
        for crop, blob in blobs.items():
            # the MLIR payload is already dense — store uncompressed so
            # load cost is one read, not an inflate of ~weights bytes
            z.writestr(
                zipfile.ZipInfo(f"exported_{crop}.bin"), blob,
                compress_type=zipfile.ZIP_STORED,
            )
    import os

    os.replace(tmp, path)
    return meta


class ArtifactModel:
    """A loaded artifact, shaped like a model for the serving stack.

    Provides exactly the surface ``Separator``/``SeparatorService``/
    streaming read from a model: ``n_fft``, ``hop_length``, ``offset``,
    ``is_complex`` and ``__call__(variables, x)``. ``variables`` is
    accepted (and must be empty) purely so the artifact is a drop-in:
    the weights live inside the exported computation.
    """

    def __init__(self, exported_by_crop, meta):
        self._exported = dict(exported_by_crop)
        self.meta = meta
        cfg = meta["model_config"]
        self.n_fft = int(cfg["n_fft"])
        self.hop_length = int(cfg["hop_length"])
        self.is_complex = bool(cfg.get("is_complex", False))
        self.offset = int(meta["offset"])
        self.output_bin = int(meta["output_bin"])
        self.channels = int(meta["channels"])
        self.cropsizes = sorted(self._exported)

    def init(self, rng):  # Separator-compatible no-op
        return {}

    def __call__(self, variables, x):
        if variables:
            raise ValueError(
                "ArtifactModel bakes its weights into the exported "
                "computation; pass empty variables ({})"
            )
        if x.ndim != 4 or x.shape[1] != self.output_bin \
                or x.shape[3] != self.channels:
            raise ValueError(
                f"artifact expects (batch, {self.output_bin}, crop, "
                f"{self.channels}) patches, got {x.shape}"
            )
        crop = int(x.shape[2])
        exported = self._exported.get(crop)
        if exported is None:
            raise ValueError(
                f"artifact has no entry for cropsize {crop} (carries "
                f"{self.cropsizes}); re-export with --cropsizes "
                f"including {crop}"
            )
        return exported.call(x)


def load_artifact(path) -> ArtifactModel:
    from jax import export as jexport

    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json").decode())
        if meta.get("format_version", 0) > FORMAT_VERSION:
            raise ValueError(
                f"artifact {path} has format_version "
                f"{meta['format_version']}; this build reads <= "
                f"{FORMAT_VERSION}"
            )
        exported = {
            crop: jexport.deserialize(z.read(f"exported_{crop}.bin"))
            for crop in meta["cropsizes"]
        }
    return ArtifactModel(exported, meta)


def artifact_separator(path, *, batchsize=4, cropsize=None,
                       postprocess=False):
    """Load an artifact and wrap it in a ready ``Separator``."""
    from vocal_remover_tpu.separate.separator import Separator

    am = load_artifact(path)
    if cropsize is None:
        cropsize = am.cropsizes[0]
    return Separator(am, {}, batchsize=batchsize, cropsize=cropsize,
                     postprocess=postprocess)
