"""Rotary position embeddings.

Parity: /root/reference/src/tiny_llm_ref/positional_encoding.py:4-66 (readable
RoPE with slice offsets) and week2_kernels.py:22-53 (FastRoPE with per-row
int32 offsets). TPU-first design: cos/sin tables precomputed once in f32 and
gathered by a position matrix, so the whole rotation is a fused VPU
elementwise chain under jit — no custom kernel needed. Positions are plain
int32 arrays, which makes this directly usable inside a jitted decode step
with traced offsets (the reference needs Python-level slices instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _positions(
    batch: int,
    seq_len: int,
    offset: int | slice | list | jax.Array | None,
) -> jax.Array:
    """Build a [B, L] int32 position matrix from the offset contract.

    Accepted offsets (superset of both reference RoPE variants):
      - None: positions 0..L-1 for every row
      - int: positions offset..offset+L-1 for every row
      - slice(start, stop): like int start, with stop - start == L enforced
      - list of ints / list of slices: per-row starts (length B)
      - jax.Array of shape [B]: per-row starts (traced OK)
      - jax.Array of shape [B, L]: explicit positions (traced OK)
    """
    base = jnp.arange(seq_len, dtype=jnp.int32)[None, :]
    if offset is None:
        return jnp.broadcast_to(base, (batch, seq_len))
    if isinstance(offset, slice):
        assert offset.stop - offset.start == seq_len, (
            f"offset slice must span exactly {seq_len} positions"
        )
        offset = offset.start
    if isinstance(offset, int):
        return jnp.broadcast_to(base + offset, (batch, seq_len))
    if isinstance(offset, list):
        starts = []
        for o in offset:
            if isinstance(o, slice):
                assert o.stop - o.start == seq_len
                starts.append(o.start)
            else:
                starts.append(int(o))
        assert len(starts) == batch, f"need {batch} per-row offsets, got {len(starts)}"
        return jnp.asarray(starts, dtype=jnp.int32)[:, None] + base
    offset = jnp.asarray(offset, dtype=jnp.int32)
    if offset.ndim == 0:
        return jnp.broadcast_to(base + offset, (batch, seq_len))
    if offset.ndim == 1:
        return offset[:, None] + base
    assert offset.ndim == 2, f"positions array must be [B] or [B, L], got {offset.shape}"
    return offset


def rope_tables(
    dims: int, max_seq_len: int, base: float = 10000.0
) -> tuple[jax.Array, jax.Array]:
    """Precompute (cos, sin) tables [max_seq_len, dims // 2] in f32."""
    half = dims // 2
    inv_freq = jnp.power(
        jnp.float32(base), -(jnp.arange(0, half, dtype=jnp.float32) / half)
    )
    freqs = jnp.outer(jnp.arange(max_seq_len, dtype=jnp.float32), inv_freq)
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(
    x: jax.Array,  # [B, L, H, D]
    cos_table: jax.Array,
    sin_table: jax.Array,
    positions: jax.Array,  # [B, L] int32
    dims: int,
    traditional: bool = False,
) -> jax.Array:
    """Rotate the first `dims` features of x by the angles at `positions`."""
    B, L, H, D = x.shape
    half = dims // 2
    cos = jnp.take(cos_table, positions, axis=0)[:, :, None, :]
    sin = jnp.take(sin_table, positions, axis=0)[:, :, None, :]
    x32 = x.astype(jnp.float32)
    if traditional:
        xr = x32[..., :dims].reshape(B, L, H, half, 2)
        x1, x2 = xr[..., 0], xr[..., 1]
    else:
        x1 = x32[..., :half]
        x2 = x32[..., half:dims]
    real = x1 * cos - x2 * sin
    imag = x2 * cos + x1 * sin
    if traditional:
        rotated = jnp.stack([real, imag], axis=-1).reshape(B, L, H, dims)
    else:
        rotated = jnp.concatenate([real, imag], axis=-1)
    if dims < D:
        # Preserve tail dims beyond `dims` (week2_kernels.metal:50-105).
        rotated = jnp.concatenate([rotated, x32[..., dims:]], axis=-1)
    return rotated.astype(x.dtype)


class RoPE:
    """Precomputed-table RoPE over [B, L, H, D] activations."""

    def __init__(
        self,
        dims: int,
        max_seq_len: int,
        base: float = 10000.0,
        traditional: bool = False,
    ):
        assert dims % 2 == 0, "dims must be even"
        self.dims = dims
        self.half_dims = dims // 2
        self.max_seq_len = max_seq_len
        self.base = base
        self.traditional = traditional
        self.cos_table, self.sin_table = rope_tables(dims, max_seq_len, base)

    def __call__(
        self,
        x: jax.Array,
        offset: int | slice | list | jax.Array | None = None,
    ) -> jax.Array:
        B, L, H, D = x.shape
        pos = _positions(B, L, offset)  # [B, L]
        return apply_rope(
            x, self.cos_table, self.sin_table, pos, self.dims, self.traditional
        )
