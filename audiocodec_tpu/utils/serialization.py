"""Checkpoint / serialization for codec pytrees and streaming state.

All codec state is a deterministic precompute from constructor arguments
(same property as the reference — SURVEY.md §5 "checkpointing = re-running
the constructor"), so a checkpoint is just the constructor arguments; the
arrays rebuild bit-identically. Streaming state is one carry block per
direction plus a block offset (streaming.py), captured verbatim.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from audiocodec_tpu.codec import Codec

_DTYPE_NAMES = {"float32": jnp.float32, "float64": jnp.float64,
                "bfloat16": jnp.bfloat16}


def codec_config(codec: Codec) -> dict:
    """The constructor arguments that fully determine a codec."""
    return {
        "sample_rate": codec.psycho.sample_rate,
        "filters_n": codec.mdct.filters_n,
        "bark_bands_n": codec.psycho.bark_bands_n,
        "alpha": codec.psycho.alpha,
        "window_type": codec.mdct.window_type,
        "compute_dtype": str(jnp.dtype(codec.mdct.compute_dtype)),
        "fast_bf16": codec.mdct.fast_bf16,
        "use_pallas": codec.mdct.use_pallas,
        "dct_precision": codec.mdct.dct_precision,
        "bark_precision": codec.psycho.bark_precision,
    }


def save_codec(path: str, codec: Codec) -> None:
    with open(path, "w") as f:
        json.dump(codec_config(codec), f, indent=2)


def load_codec(path: str) -> Codec:
    with open(path) as f:
        cfg = json.load(f)
    dtype = _DTYPE_NAMES[cfg.pop("compute_dtype")]
    cfg.setdefault("dct_precision", "highest")  # older checkpoints
    # Configs saved before bark_precision existed were written by codecs
    # that ALWAYS ran the Bark matmuls at HIGHEST regardless of
    # dct_precision; defaulting to None (follow dct_precision) would
    # rebuild a codec with different thresholds/step sizes than the one
    # that wrote the checkpoint and corrupt decode of its bitstreams.
    cfg.setdefault("bark_precision", "highest")
    # use_pallas is saved RESOLVED ("auto" became a concrete direction on
    # the machine that saved it); Mosaic kernels only run on a real TPU,
    # so loading that config elsewhere falls back to the XLA path. The
    # kernel choice is a perf knob, never quantization-affecting (step
    # sizes derive from thresholds + sidecars, not the transform lowering).
    import jax

    if cfg.get("use_pallas") and jax.default_backend() != "tpu":
        cfg["use_pallas"] = False
    try:
        return Codec.create(compute_dtype=dtype, **cfg)
    except ValueError:
        if not cfg.get("use_pallas"):
            raise
        # A checkpoint can carry a use_pallas choice the CURRENT
        # eligibility rules reject (round-2 configs allowed kernel sizes
        # that round 3's measured hardware ceilings exclude). The kernel
        # choice is a perf knob, never quantization-affecting, so degrade
        # to the XLA path instead of refusing the checkpoint.
        cfg["use_pallas"] = False
        return Codec.create(compute_dtype=dtype, **cfg)


def save_stream_state(path: str, enc_carry, dec_carry=None, offset=0) -> None:
    """Persist streaming carry state (see streaming.py: (carry, offset) is
    the entire resumable codec state at any chunk boundary)."""
    np.savez(
        path,
        enc_carry=np.asarray(enc_carry),
        dec_carry=(
            np.asarray(dec_carry)
            if dec_carry is not None
            else np.zeros(0, dtype=np.float32)
        ),
        offset=np.asarray([offset], dtype=np.int64),
    )


def load_stream_state(path: str):
    with np.load(path) as z:
        enc = jnp.asarray(z["enc_carry"])
        dec = jnp.asarray(z["dec_carry"]) if z["dec_carry"].size else None
        offset = int(z["offset"][0])
    return enc, dec, offset
