"""Multi-host bootstrap + collective-matmul overlap tests (8-dev CPU mesh).

Single-process analogs of the multi-host paths (SURVEY.md §4: virtual
device meshes stand in for pod slices); the overlap kernels are checked
for exactness against the unsharded matmul.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tiny_llm_tpu.parallel import make_mesh
from tiny_llm_tpu.parallel.distributed import (
    Topology,
    barrier,
    host_local_requests,
    initialize,
    make_multihost_mesh,
    runtime_topology,
)
from tiny_llm_tpu.parallel.overlap import (
    allgather_matmul,
    matmul_reducescatter,
    overlapped_tp_matmuls,
)
from .utils import assert_allclose

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_initialize_is_noop_single_process(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert initialize() is False


def test_runtime_topology_single_process():
    topo = runtime_topology()
    assert topo.num_processes == 1
    assert topo.process_index == 0
    assert topo.num_devices == len(jax.devices())
    assert topo.num_slices == 1
    assert topo.devices_per_slice == topo.num_devices


def test_make_multihost_mesh_single_slice_matches_make_mesh():
    mesh = make_multihost_mesh(dp=2, tp=4)
    assert mesh.shape == {"dp": 2, "tp": 4}
    with pytest.raises(ValueError):
        make_multihost_mesh(dp=3, tp=4)


def test_multislice_constraints_enforced():
    # Fake a 2-slice topology to exercise the DCN-placement guards.
    devs = jax.devices()
    topo = Topology(
        num_processes=2,
        process_index=0,
        num_devices=8,
        num_local_devices=4,
        num_slices=2,
    )
    import tiny_llm_tpu.parallel.distributed as dist

    orig = dist.runtime_topology
    dist.runtime_topology = lambda devices=None: topo
    try:
        with pytest.raises(ValueError, match="multiple of the slice count"):
            make_multihost_mesh(dp=1, tp=8, devices=devs)
        with pytest.raises(ValueError, match="stay on ICI"):
            make_multihost_mesh(dp=2, tp=8, devices=list(devs) * 2)
    finally:
        dist.runtime_topology = orig


def test_host_local_requests_strides():
    reqs = list(range(10))
    topo1 = Topology(1, 0, 8, 8, 1)
    assert host_local_requests(reqs, topo1) == reqs
    topo_a = Topology(2, 0, 8, 4, 2)
    topo_b = Topology(2, 1, 8, 4, 2)
    a = host_local_requests(reqs, topo_a)
    b = host_local_requests(reqs, topo_b)
    assert sorted(a + b) == reqs
    assert a == [0, 2, 4, 6, 8]


def test_barrier_noop_single_process():
    barrier("test")  # must not raise or hang


@pytest.mark.parametrize("b,k,n", [(4, 64, 32), (1, 128, 256)])
def test_allgather_matmul_exact(b, k, n):
    mesh = make_mesh(dp=1, tp=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    qkv_style, _ = overlapped_tp_matmuls(mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "tp")))
    ws = jax.device_put(w, NamedSharding(mesh, P(None, "tp")))
    got = jax.jit(qkv_style)(xs, ws)
    assert_allclose(np.asarray(got), np.asarray(x @ w), atol=1e-4)


@pytest.mark.parametrize("b,k,n", [(4, 64, 32), (2, 256, 128)])
def test_matmul_reducescatter_exact(b, k, n):
    mesh = make_mesh(dp=1, tp=8)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    _, oproj_style = overlapped_tp_matmuls(mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "tp")))
    ws = jax.device_put(w, NamedSharding(mesh, P("tp", None)))
    got = jax.jit(oproj_style)(xs, ws)
    assert_allclose(np.asarray(got), np.asarray(x @ w), atol=1e-4)


def test_overlap_chain_composes():
    """qkv_style into oproj_style reproduces x @ W1 @ W2 without any
    resharding between them (output of the first is the input sharding of
    the second) — the per-layer TP decode dataflow."""
    mesh = make_mesh(dp=1, tp=8)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 64)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((128, 64)), jnp.float32)
    qkv_style, oproj_style = overlapped_tp_matmuls(mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "tp")))
    w1s = jax.device_put(w1, NamedSharding(mesh, P(None, "tp")))
    w2s = jax.device_put(w2, NamedSharding(mesh, P("tp", None)))

    @jax.jit
    def f(xs, w1s, w2s):
        return oproj_style(qkv_style(xs, w1s), w2s)

    got = f(xs, w1s, w2s)
    want = (x @ w1) @ w2
    assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
