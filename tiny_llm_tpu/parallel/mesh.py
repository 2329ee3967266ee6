"""Device mesh construction.

The reference has no distributed execution (SURVEY.md §2.8); this layer is
the genuinely new TPU-native component: `jax.sharding.Mesh` over ICI with
named axes, GSPMD propagation via NamedSharding on the params pytree, and
XLA collectives inserted automatically by jit. Axes:

  dp — data parallel: replicate weights, shard the request batch
  tp — tensor parallel: shard attention heads / MLP hidden dim; doubles as
       the expert-parallel axis for MoE layers (experts sharded over tp)
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_mesh(
    dp: int = 1, tp: int | None = None, ep: int = 1, devices=None
) -> Mesh:
    """Build a (dp[, ep], tp) mesh from the available devices.

    Axes are AUTO-typed: placement comes from NamedShardings on the params
    and GSPMD propagates everything else (jax 0.9's explicit
    sharding-in-types mode would instead demand out_sharding annotations
    on every contraction over a sharded axis).

    ep > 1 adds a dedicated expert-parallel axis (round-5 composed EP x TP,
    the north-star 30B-A3B pairing): experts shard over `ep` while each
    expert's matmul rows/cols shard over `tp`. The axis is only present
    when requested so (dp, tp) meshes keep their round-1 shape."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None:
        tp = n // (dp * ep)
    assert dp * ep * tp == n, f"dp({dp}) * ep({ep}) * tp({tp}) != devices({n})"
    auto = jax.sharding.AxisType.Auto
    if ep > 1:
        return jax.make_mesh(
            (dp, ep, tp), ("dp", "ep", "tp"), devices=devices,
            axis_types=(auto, auto, auto),
        )
    return jax.make_mesh(
        (dp, tp), ("dp", "tp"), devices=devices, axis_types=(auto, auto)
    )
