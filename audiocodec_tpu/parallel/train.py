"""Differentiable perceptual training step, sharded over a device mesh.

The reference's raison d'être is slotting the codec into neural pipelines
(differentiable @tf.function graphs) but it ships no training machinery.
This module provides the canonical training step for the framework: learn
per-band spectral gains through the full encode(quantize-STE)/decode chain
against a waveform + noise-to-mask perceptual loss, with the batch sharded
``dp`` and the sample axis sharded ``sp`` over a jax mesh. Gradients are
averaged across dp by GSPMD-inserted psums — no hand-written collectives.

Also the target of ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import optax

from audiocodec_tpu import quantize as _quantize
from audiocodec_tpu.codec import Codec
from audiocodec_tpu.parallel import mesh as _mesh


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["gains", "opt_state"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class TrainState:
    """Learnable per-band gains + optimizer state (a pytree)."""

    gains: jax.Array  # [filters_n]
    opt_state: object


def init_state(codec: Codec, optimizer) -> TrainState:
    gains = jnp.ones((codec.mdct.filters_n,), dtype=codec.mdct.compute_dtype)
    return TrainState(gains=gains, opt_state=optimizer.init(gains))


def perceptual_loss(codec: Codec, gains, x, nmr_weight=0.1):
    """Waveform MSE + noise-to-mask ratio through the quantize-STE chain.

    The gains scale the spectrum before quantization; the STE lets the
    gradient flow through the rounding (see quantize.quantize_ste).
    """
    spec = codec.mdct.transform(x)
    tonality = codec.psycho.tonality(spec)
    threshold = codec.psycho.global_masking_threshold(spec, tonality)
    shaped = spec * gains[None, None, :, None]
    coded = _quantize.quantize_ste(shaped, threshold)
    decoded = codec.mdct.inverse_transform(coded)
    n = codec.mdct.filters_n
    wave_mse = jnp.mean((decoded[:, n:-n] - x) ** 2)
    # noise-to-mask ratio: quantization error relative to what is inaudible
    nmr = jnp.mean(((coded - shaped) / threshold) ** 2)
    return wave_mse + nmr_weight * nmr


def make_train_step(codec: Codec, mesh, optimizer=None, remat: bool = False):
    """Build a jitted sharded train step: (state, batch) -> (state, loss).

    Input batches are expected sharded batch-over-dp / samples-over-sp
    (use parallel.mesh.waveform_sharding); params are replicated. XLA
    inserts the dp-mean psum for the gradient automatically.

    :param remat: rematerialize the forward pass during the backward pass
        (jax.checkpoint) — trades ~2x forward FLOPs for not keeping the
        spectrum/threshold intermediates alive, which matters for long
        clips (memory scales with blocks_n x filter_bands_n).
    """
    if optimizer is None:
        optimizer = optax.adam(1e-3)
    wave_sharding = _mesh.waveform_sharding(mesh)
    repl = _mesh.replicated(mesh)

    loss_fn = lambda g, x: perceptual_loss(codec, g, x)
    if remat:
        loss_fn = jax.checkpoint(loss_fn)

    @functools.partial(
        jax.jit,
        in_shardings=(repl, wave_sharding),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
    def train_step(state: TrainState, x):
        loss, grads = jax.value_and_grad(lambda g: loss_fn(g, x))(
            state.gains
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.gains
        )
        gains = optax.apply_updates(state.gains, updates)
        return TrainState(gains=gains, opt_state=opt_state), loss

    return train_step, optimizer
