"""Anti-cheat source inspection (reference pattern:
tests_refsol/test_week_2_day_3.py:54-61, test_week_3_day_4.py:21-27 —
`inspect.getsource` asserts the optimized path does not secretly call
the easy oracle it is graded against)."""

import inspect

from tiny_llm_tpu.kernels import (
    flash_attention_pallas as fap,
    moe_matmul,
    paged_attention_pallas as pap,
    quant_matmul,
)


def test_pallas_flash_kernels_do_not_call_xla_twin():
    """The kernel bodies must be real online-softmax schedules, not
    wrappers over the XLA oracle."""
    for fn in (fap._decode_kernel, fap._decode_kernel_masked,
               fap._prefill_kernel, fap._prefill_kernel_masked):
        src = inspect.getsource(fn)
        assert "scaled_dot_product" not in src
        assert "flash_attention(" not in src


def test_paged_kernels_do_not_gather_dense():
    """Paged attention must walk/gather pages, never materialize the
    dense KV via the compatibility gather (the reference forbids
    gather_dense in the same spot, test_week_3_day_4.py:21-27)."""
    for fn in (pap.paged_flash_decode, pap.paged_flash_decode_gather,
               pap.paged_flash_prefill):
        src = inspect.getsource(fn)
        assert "gather_pages_dense" not in src


def test_quant_matmul_kernel_dequantizes_in_kernel():
    """The fused kernel must not call the pure-Python dequantize and a
    dense dot — that is the oracle, not the product."""
    src = inspect.getsource(quant_matmul)
    kernel_srcs = [
        inspect.getsource(f)
        for name, f in vars(quant_matmul).items()
        if name.startswith("_") and callable(f) and "kernel" in name
    ]
    assert kernel_srcs, "expected kernel bodies in quant_matmul"
    for s in kernel_srcs:
        assert "dequantize(" not in s


def test_moe_kernels_do_not_call_ragged_dot():
    for fn in (moe_matmul._gqmm_gather_kernel, moe_matmul._gqmm_kernel,
               moe_matmul._gqmm_magic_kernel):
        src = inspect.getsource(fn)
        assert "ragged_dot" not in src
        assert "dequantize(" not in src


def test_paged_dispatch_defaults_to_pallas_on_tpu():
    """The dispatcher's TPU default must be the Pallas path — mirrors
    the reference's checkpoint-wiring tests (which class is actually
    instantiated at each stage)."""
    from tiny_llm_tpu.kernels import dispatch

    src = inspect.getsource(dispatch.default_impl)
    assert "tpu" in src and "pallas" in src
