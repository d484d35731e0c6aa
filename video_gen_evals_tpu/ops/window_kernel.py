"""Pallas window-gather kernel — the hot op of the scoring path.

Window assembly from the feature bank is a batched *contiguous* slice: with
the sentinel-padded bank layout (see ``data/features.py``), window ``i`` is
exactly rows ``offset_v + start .. + clip_len`` of the bank — tail-padding
semantics are baked into the data, and per-video offsets are 8-row aligned.

XLA lowers the equivalent ``jnp.take`` to a generic row gather that reaches
only ~40 GB/s on v5e; this kernel instead issues one straight HBM->VMEM block
DMA per window (scalar-prefetched row bases via ``PrefetchScalarGridSpec``,
bank resident in HBM via ``memory_space=ANY``), which runs at HBM stream
bandwidth.

Alignment contract: every ``offset + start`` must be a multiple of 8 (f32
sublane tile), and the bank's feature dim must be a multiple of 128 (lane
tile) — pad it once with :func:`pad_bank_lanes`. The bank builder aligns
offsets; the framework's canonical stride is 8, so enumerated window starts
qualify. ``aligned_starts`` checks a batch; callers fall back to
``data.features.gather_windows`` otherwise.
"""

from __future__ import annotations

import functools
import typing as T

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ALIGN = 8  # f32 sublane tiling: HBM slices must start at multiples of 8


def _gather_kernel(base_ref, bank_ref, out_ref, sem, *, clip_len: int):
    i = pl.program_id(0)
    base = pl.multiple_of(base_ref[i], _ALIGN)
    pltpu.make_async_copy(
        bank_ref.at[pl.ds(base, clip_len), :], out_ref.at[0], sem
    ).start()
    pltpu.make_async_copy(
        bank_ref.at[pl.ds(base, clip_len), :], out_ref.at[0], sem
    ).wait()


_LANE = 128  # lane tile: DMA'd slice widths must be multiples of 128


def pad_bank_lanes(bank: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad the feature dim to a multiple of 128 (do once, keep resident)."""
    D = bank.shape[1]
    pad = (-D) % _LANE
    if pad == 0:
        return bank
    return jnp.pad(bank, ((0, 0), (0, pad)))


def pallas_gather_windows(
    bank: jnp.ndarray,       # [N, D_pad] sentinel-padded, lane-padded bank
    offsets: jnp.ndarray,    # [V] (8-aligned)
    row_limit: jnp.ndarray,  # [V] unused (layout guarantees validity); kept
    z0_diff: jnp.ndarray,    # [D_diff]          # for signature parity
    one_pass_raw: int,
    video_idx: jnp.ndarray,  # [B]
    starts: jnp.ndarray,     # [B] (multiples of 8)
    clip_len: int,
    out_dim: T.Optional[int] = None,  # true feature dim (slices off lane pad)
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for ``data.features.gather_windows`` for batches
    whose starts are 8-aligned (the canonical stride-8 enumeration)."""
    del row_limit
    B = video_idx.shape[0]
    D_pad = bank.shape[1]
    if D_pad % _LANE != 0:
        raise ValueError(
            f"bank feature dim {D_pad} must be lane-padded (pad_bank_lanes)"
        )
    base = (offsets[video_idx] + starts).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, clip_len, D_pad), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    rows = pl.pallas_call(
        functools.partial(_gather_kernel, clip_len=clip_len),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, clip_len, D_pad), bank.dtype),
        interpret=interpret,
    )(base, bank)

    if out_dim is not None and out_dim != D_pad:
        rows = rows[:, :, :out_dim]
    # window row 0 always self-pairs -> diff block := normalized zero
    return rows.at[:, 0, one_pass_raw : one_pass_raw + z0_diff.shape[0]].set(
        z0_diff[None, :].astype(rows.dtype)
    )


def aligned_starts(starts) -> bool:
    """True if every start in the (host) array is a multiple of 8."""
    import numpy as np

    return bool(np.all(np.asarray(starts) % _ALIGN == 0))
