"""Pallas window-gather kernel — the hot op of the scoring path.

Window assembly from the feature bank is a batched *contiguous* slice: with
the sentinel-padded bank layout (see ``data/features.py``), window ``i`` is
exactly rows ``offset_v + start .. + clip_len`` of the bank — tail-padding
semantics are baked into the data, and per-video offsets are 8-row aligned.

Four implementations, fastest first on v5e (measured, 256x32x2596 batch,
serialized-dispatch timing so relative compute is what matters):

1. ``pallas_gather_windows_burst``: 8 whole-window block DMAs in flight per
   grid step (DMA latency amortized) — ~1.5x the sliced gather;
2. ``data.features.gather_windows_sliced``: one ``lax.gather`` of
   ``[clip_len, D]`` slices — pure XLA, no alignment constraints, the
   pipeline default;
3. ``pallas_gather_windows``: Mosaic-pipelined 8-row sub-block BlockSpecs;
4. ``data.features.gather_windows``: per-row ``jnp.take`` — slowest but
   exact for arbitrary (even out-of-range) starts.

Alignment contract for the kernel: ``offset + start`` multiples of 8 (f32
sublane tile — canonical stride-8 enumeration qualifies; ``aligned_starts``
checks) and a lane-padded bank (``pad_bank_lanes``, feature dim % 128 == 0).
"""

from __future__ import annotations

import typing as T

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ALIGN = 8    # f32 sublane tiling: block row starts must be multiples of 8
_LANE = 128   # lane tile: DMA'd slice widths must be multiples of 128


def pad_bank_lanes(bank: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad the feature dim to a multiple of 128 (do once, keep resident)."""
    D = bank.shape[1]
    pad = (-D) % _LANE
    if pad == 0:
        return bank
    return jnp.pad(bank, ((0, 0), (0, pad)))


def _copy_kernel(base_ref, in_ref, out_ref):
    del base_ref  # consumed by the index maps
    out_ref[0] = in_ref[:]


def pallas_gather_windows(
    bank: jnp.ndarray,       # [N, D_pad] sentinel-padded, lane-padded bank
    offsets: jnp.ndarray,    # [V] (8-aligned)
    row_limit: jnp.ndarray,  # [V] (clamps pathological starts like _sliced)
    z0_diff: jnp.ndarray,    # [D_diff]
    one_pass_raw: int,
    video_idx: jnp.ndarray,  # [B]
    starts: jnp.ndarray,     # [B] (multiples of 8)
    clip_len: int,
    out_dim: T.Optional[int] = None,  # true feature dim (slices off lane pad)
    interpret: bool = False,
) -> jnp.ndarray:
    """Pipelined block-DMA window gather (see module docstring)."""
    B = video_idx.shape[0]
    D_pad = bank.shape[1]
    if D_pad % _LANE != 0:
        raise ValueError(
            f"bank feature dim {D_pad} must be lane-padded (pad_bank_lanes)"
        )
    if clip_len % _ALIGN != 0:
        raise ValueError(f"clip_len {clip_len} must be a multiple of {_ALIGN}")
    sub_blocks = clip_len // _ALIGN

    rows_v = row_limit[video_idx] + 1
    start_c = jnp.clip(starts, 0, jnp.maximum(rows_v - clip_len, 0))
    base_blocks = ((offsets[video_idx] + start_c) // _ALIGN).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, sub_blocks),
        in_specs=[
            pl.BlockSpec(
                (_ALIGN, D_pad),
                lambda i, j, base: (base[i] + j, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, _ALIGN, D_pad),
            lambda i, j, base: (i * sub_blocks + j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _copy_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * sub_blocks, _ALIGN, D_pad), bank.dtype),
        interpret=interpret,
    )(base_blocks, bank)

    rows = out.reshape(B, clip_len, D_pad)
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


def _burst_kernel(base_ref, bank_ref, out_ref, sems, *, clip_len: int,
                  windows_per_step: int):
    """One grid step: issue ``windows_per_step`` block DMAs back-to-back
    (all in flight simultaneously), then wait — amortizes DMA latency."""
    i = pl.program_id(0)
    for j in range(windows_per_step):
        base = pl.multiple_of(base_ref[i * windows_per_step + j], _ALIGN)
        pltpu.make_async_copy(
            bank_ref.at[pl.ds(base, clip_len), :], out_ref.at[j], sems.at[j]
        ).start()
    for j in range(windows_per_step):
        base = pl.multiple_of(base_ref[i * windows_per_step + j], _ALIGN)
        pltpu.make_async_copy(
            bank_ref.at[pl.ds(base, clip_len), :], out_ref.at[j], sems.at[j]
        ).wait()


def pallas_gather_windows_burst(
    bank: jnp.ndarray,       # [N, D_pad] sentinel-padded, lane-padded bank
    offsets: jnp.ndarray,
    row_limit: jnp.ndarray,
    z0_diff: jnp.ndarray,
    one_pass_raw: int,
    video_idx: jnp.ndarray,
    starts: jnp.ndarray,
    clip_len: int,
    windows_per_step: int = 8,
    out_dim: T.Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Burst-DMA variant: ``windows_per_step`` whole-window DMAs in flight per
    grid step. Batch size must be divisible by ``windows_per_step``."""
    import functools

    B = video_idx.shape[0]
    D_pad = bank.shape[1]
    if D_pad % _LANE != 0:
        raise ValueError("bank feature dim must be lane-padded (pad_bank_lanes)")
    if B % windows_per_step != 0:
        raise ValueError(f"batch {B} not divisible by {windows_per_step}")

    rows_v = row_limit[video_idx] + 1
    start_c = jnp.clip(starts, 0, jnp.maximum(rows_v - clip_len, 0))
    base = (offsets[video_idx] + start_c).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // windows_per_step,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (windows_per_step, clip_len, D_pad),
            lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((windows_per_step,))],
    )
    rows = pl.pallas_call(
        functools.partial(
            _burst_kernel, clip_len=clip_len, windows_per_step=windows_per_step
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, clip_len, D_pad), bank.dtype),
        interpret=interpret,
    )(base, bank)

    if out_dim is not None and out_dim != D_pad:
        rows = rows[:, :, :out_dim]
    return rows.at[:, 0, one_pass_raw : one_pass_raw + z0_diff.shape[0]].set(
        z0_diff[None, :].astype(rows.dtype)
    )
