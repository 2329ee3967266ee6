"""Multi-host runtime bootstrap (the NCCL/MPI-launcher analog).

The reference is single-process / single-device — no distributed runtime
exists to port (SURVEY.md §5.8, reference README.md:44-46). On TPU pods
the framework instead (1) joins every host process into one JAX runtime
via `jax.distributed.initialize`, then (2) lays a mesh whose inner axes
ride ICI (intra-slice) and whose outer axes ride DCN (inter-slice), so
TP collectives stay on ICI and only DP/PP traffic crosses slices.

Single-process sessions (the dev chip, CPU test meshes) must work with
zero configuration: `initialize()` is a strict no-op unless a
coordinator is discoverable, and `make_multihost_mesh` degrades to the
plain single-slice `make_mesh`.
"""

from __future__ import annotations

import dataclasses
import os

import jax

from .mesh import make_mesh

# Env vars that signal a launcher-provisioned multi-process run. Cloud TPU
# pod slices auto-discover all of these through the metadata server, so
# `initialize()` with no args is correct there too.
_COORD_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
)

_initialized = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> bool:
    """Join the multi-host JAX runtime; no-op when single-process.

    Returns True if `jax.distributed.initialize` ran (now or earlier in
    this process), False for a single-process session. Safe to call
    unconditionally at every entry point: explicit args win, otherwise a
    coordinator is discovered from the environment, otherwise this is a
    no-op so single-chip / CPU runs need no flags.
    """
    global _initialized
    if _initialized:
        return True

    if coordinator_address is None:
        for var in _COORD_ENV_VARS:
            if os.environ.get(var):
                coordinator_address = os.environ[var]
                break

    explicit = coordinator_address is not None
    # On Cloud TPU pod slices jax.distributed.initialize() discovers the
    # coordinator via the metadata server even with no env vars; gate on
    # the TPU pod hints so plain single-host runs never try to rendezvous.
    pod_hints = any(
        os.environ.get(v)
        for v in ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not explicit and not pod_hints:
        return False

    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return True


@dataclasses.dataclass(frozen=True)
class Topology:
    """What the runtime actually looks like after initialize()."""

    num_processes: int
    process_index: int
    num_devices: int
    num_local_devices: int
    num_slices: int

    @property
    def devices_per_slice(self) -> int:
        return self.num_devices // self.num_slices


def runtime_topology(devices=None) -> Topology:
    devices = devices if devices is not None else jax.devices()
    slice_ids = {getattr(d, "slice_index", 0) or 0 for d in devices}
    return Topology(
        num_processes=jax.process_count(),
        process_index=jax.process_index(),
        num_devices=len(devices),
        num_local_devices=len(jax.local_devices()),
        num_slices=len(slice_ids),
    )


def make_multihost_mesh(dp: int = 1, tp: int | None = None, devices=None):
    """(dp, tp) mesh that keeps TP on ICI when the run spans slices.

    Single-slice (including every single-process and CPU-virtual-device
    session): identical to `make_mesh`. Multi-slice: the dp axis is laid
    out so that it decomposes as (slices × intra-slice dp) — i.e. dp must
    be a multiple of the slice count, tp must fit within one slice — and
    device order comes from `create_hybrid_device_mesh`, which places
    slice-crossing hops only on the dp axis.
    """
    devices = devices if devices is not None else jax.devices()
    topo = runtime_topology(devices)
    n = len(devices)
    if tp is None:
        tp = n // dp
    if dp * tp != n:
        raise ValueError(f"dp({dp}) * tp({tp}) != devices({n})")

    if topo.num_slices <= 1:
        return make_mesh(dp=dp, tp=tp, devices=devices)

    if dp % topo.num_slices != 0:
        raise ValueError(
            f"dp({dp}) must be a multiple of the slice count "
            f"({topo.num_slices}) so only dp traffic crosses DCN"
        )
    if tp > topo.devices_per_slice:
        raise ValueError(
            f"tp({tp}) exceeds devices per slice ({topo.devices_per_slice}); "
            "TP collectives must stay on ICI"
        )
    from jax.experimental import mesh_utils

    dp_ici = dp // topo.num_slices
    device_grid = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(dp_ici, tp),
        dcn_mesh_shape=(topo.num_slices, 1),
        devices=devices,
    )
    auto = jax.sharding.AxisType.Auto
    return jax.sharding.Mesh(
        device_grid.reshape(dp, tp), ("dp", "tp"), axis_types=(auto, auto)
    )


def host_local_requests(requests: list, topo: Topology | None = None) -> list:
    """Scheduler-level DP across hosts: each host serves its stride of the
    request list (reference `batch_generate` admission order is preserved
    per host; cf. reference batch.py:139-148)."""
    topo = topo or runtime_topology()
    if topo.num_processes <= 1:
        return list(requests)
    return list(requests[topo.process_index :: topo.num_processes])


def barrier(name: str = "tiny_llm_tpu_barrier") -> None:
    """Cross-host sync point (no-op single-process)."""
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
