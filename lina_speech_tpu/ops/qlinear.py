"""Native int8 weight-streaming linear for the decode loop.

Batch-1 decode is weights-read-bound (BASELINE.md: 718 MB/token bf16 at
~819 GB/s). Round 2 streamed int8 weights by tracing ``q.astype(bf16)*s``
into the loop and letting XLA fuse the dequant into the GEMV; that
captured +13% of a ~2x promise — the dequant rides the same fusion as the
reduction and stalls it. This kernel makes the int8 stream explicit:

  * the weight tile is DMA'd to VMEM as int8 (half the HBM bytes — the
    only traffic that matters at b1),
  * converted int8->bf16 *in VMEM* (VPU, ~0.05 ms for the whole model —
    fully overlapped with the next tile's DMA by the Pallas pipeline),
  * contracted on the MXU with f32 accumulation,
  * per-output-channel scales applied in the epilogue.

Modes:
  * ``wonly``  — weight-only int8 (default; same numerics class as the
    round-2 path: bf16 activations, f32 accumulate, exact scales).
  * ``w8a8``   — additionally quantizes activations per row (dynamic,
    symmetric) and contracts int8 x int8 -> int32 natively on the MXU;
    zero convert work on the weight bytes. Opt-in quality knob.

:class:`QDense` is a drop-in ``nn.Dense`` (identical param names, shapes
and init) whose kernel leaf may be *replaced in the params tree* by the
``{int8_q, int8_s}`` pair from :mod:`lina_speech_tpu.utils.quantize`; it
then routes through this kernel. Reference parity: the reference has no
quantized path at all — this is a capability beyond
`/root/reference/model/modeling_lina.py` decode.
"""
from __future__ import annotations

import functools
import os
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lina_speech_tpu.utils.quantize import QKEY, SKEY

Array = jnp.ndarray


def is_quantized_leaf(node) -> bool:
    from collections.abc import Mapping  # flax may hand back FrozenDict

    return isinstance(node, Mapping) and QKEY in node


# ------------------------------------------------------------------ kernel
def _qlin_kernel(x_ref, w_ref, s_ref, o_ref, *, out_dtype):
    """One (M, K) x (K, BN) tile: int8 W converted in VMEM, MXU contract."""
    w = w_ref[:].astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(out_dtype)


def _qlin_kernel_i8(x_ref, w_ref, s_ref, sx_ref, o_ref, *, out_dtype):
    """w8a8 tile: int8 x int8 -> int32 on the MXU, rescale epilogue."""
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scale = sx_ref[:].astype(jnp.float32) * s_ref[:].astype(jnp.float32)
    o_ref[:] = (acc.astype(jnp.float32) * scale).astype(out_dtype)


def _block_n(n: int) -> int:
    for bn in (512, 256, 128):
        if n % bn == 0 or n > bn:
            return min(bn, n)
    return n


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "mode", "interpret"),
)
def _int8_linear_2d(
    x: Array, q: Array, s: Array, out_dtype, mode: str, interpret: bool
) -> Array:
    m, k = x.shape
    _, n = q.shape
    bn = _block_n(n)
    grid = (pl.cdiv(n, bn),)
    s2 = s.reshape(1, n).astype(jnp.float32)

    if mode == "w8a8":
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-12)
        sx = sx / 127.0
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        return pl.pallas_call(
            functools.partial(_qlin_kernel_i8, out_dtype=out_dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((m, k), lambda i: (0, 0)),
                pl.BlockSpec((k, bn), lambda i: (0, i)),
                pl.BlockSpec((1, bn), lambda i: (0, i)),
                pl.BlockSpec((m, 1), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((m, bn), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
            interpret=interpret,
        )(xq, q, s2, sx)

    return pl.pallas_call(
        functools.partial(_qlin_kernel, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0)),
            pl.BlockSpec((k, bn), lambda i: (0, i)),
            pl.BlockSpec((1, bn), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), q, s2)


def int8_linear(
    x: Array,
    q: Array,
    s: Array,
    *,
    out_dtype=jnp.bfloat16,
    mode: str = "wonly",
    interpret: Optional[bool] = None,
) -> Array:
    """``x @ dequant(q, s)`` with the int8 representation streamed from HBM.

    Args:
        x: (..., K) activations (any float dtype).
        q: (K, N) int8 weights.
        s: per-output-channel scales, broadcastable to (1, N).
        mode: "wonly" (bf16 MXU, exact scales) or "w8a8" (dynamic per-row
            activation quant, int8 MXU).
    Returns (..., N) in ``out_dtype``.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    out = _int8_linear_2d(x2, q, s.reshape(-1), out_dtype, mode, interpret)
    return out.reshape(*lead, q.shape[1])


# ------------------------------------------------------- fused SwiGLU FFN
def _ffn_kernel(x_ref, qg_ref, sg_ref, bg_ref, qh_ref, sh_ref, bh_ref,
                qo_ref, o_ref, *, h_total, block_c):
    """One hidden-chunk of a SwiGLU FFN GEMV: g/h slices of W_in are
    contracted, silu(g)*h is formed in VMEM and immediately folded into the
    W_out partial contraction — the hidden activation never reaches HBM and
    all three weight streams ride one DMA pipeline (one launch per FFN
    instead of two, the b1 decode cost is weight-stream bandwidth)."""
    i = pl.program_id(0)
    x = x_ref[:]
    dot = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    g = dot(x, qg_ref[:].astype(jnp.bfloat16))
    g = g * sg_ref[:].astype(jnp.float32) + bg_ref[:].astype(jnp.float32)
    h = dot(x, qh_ref[:].astype(jnp.bfloat16))
    h = h * sh_ref[:].astype(jnp.float32) + bh_ref[:].astype(jnp.float32)
    # match the unfused path's numerics: gx is rounded to bf16 first (QDense
    # out_dtype), then silu is computed in f32 and rounded back — exactly
    # XLA's bf16 elementwise semantics. Mosaic cannot lower `logistic` on
    # bf16 vectors (f32 scalar broadcast into a bf16 vector fails MLIR
    # verification — measured on v5e), so the transcendental stays f32.
    g_bf = g.astype(jnp.bfloat16).astype(jnp.float32)
    u = (g_bf * (1.0 / (1.0 + jnp.exp(-g_bf)))).astype(jnp.bfloat16) \
        * h.astype(jnp.bfloat16)
    col = jax.lax.broadcasted_iota(jnp.int32, u.shape, 1) + i * block_c
    u = jnp.where(col < h_total, u, jnp.bfloat16(0))  # mask edge-pad chunk
    part = dot(u, qo_ref[:].astype(jnp.bfloat16))

    @pl.when(i == 0)
    def _init():
        o_ref[:] = part

    @pl.when(i > 0)
    def _acc():
        o_ref[:] = o_ref[:] + part


def _ffn_block_c(hdim: int) -> int:
    if hdim < 128:
        return hdim  # single full-width block (block == array dim is legal)
    for bc in (512, 256, 128):
        if hdim % bc == 0:
            return bc
    return 512  # masked edge chunk (kernel zeroes columns >= hdim)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "interpret"))
def _fused_ffn_2d(x, qin, sin, bin_, qout, sout, bout, out_dtype, interpret):
    m, d = x.shape
    two_h = qin.shape[1]
    hdim = two_h // 2
    bc = _ffn_block_c(hdim)
    # gate-first split (reference base_blocks.py:42-50). The slices are
    # loop-invariant in a decode scan -> XLA hoists the copies out.
    sin2 = sin.reshape(1, two_h).astype(jnp.float32)
    bin2 = (jnp.zeros((1, two_h), jnp.float32) if bin_ is None
            else bin_.reshape(1, two_h).astype(jnp.float32))
    qg, qh = qin[:, :hdim], qin[:, hdim:]
    sg, sh = sin2[:, :hdim], sin2[:, hdim:]
    bg, bh = bin2[:, :hdim], bin2[:, hdim:]
    o = pl.pallas_call(
        functools.partial(_ffn_kernel, h_total=hdim, block_c=bc),
        grid=(pl.cdiv(hdim, bc),),
        in_specs=[
            pl.BlockSpec((m, d), lambda i: (0, 0)),
            pl.BlockSpec((d, bc), lambda i: (0, i)),
            pl.BlockSpec((1, bc), lambda i: (0, i)),
            pl.BlockSpec((1, bc), lambda i: (0, i)),
            pl.BlockSpec((d, bc), lambda i: (0, i)),
            pl.BlockSpec((1, bc), lambda i: (0, i)),
            pl.BlockSpec((1, bc), lambda i: (0, i)),
            pl.BlockSpec((bc, d), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((m, d), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), qg, sg, bg, qh, sh, bh, qout)
    y = o * sout.reshape(1, d).astype(jnp.float32)
    if bout is not None:
        y = y + bout.reshape(1, d).astype(jnp.float32)
    return y.astype(out_dtype)


def fused_ffn_int8(
    x: Array,
    q_in: Array, s_in: Array, b_in: Optional[Array],
    q_out: Array, s_out: Array, b_out: Optional[Array],
    *,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
) -> Array:
    """SwiGLU FFN over int8 weights in ONE kernel launch.

    Computes ``silu(gate) * h @ dequant(q_out)`` where ``gate, h = split(
    x @ dequant(q_in) + b_in, 2)`` — the W_in chunk dots, the activation
    and the W_out partial accumulation all happen per hidden chunk inside
    VMEM (reference base_blocks.py:42-50 semantics; the reference has no
    quantized path). x: (..., d); q_in: (d, 2H) int8; q_out: (H, d) int8.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    lead = x.shape[:-1]
    d = x.shape[-1]
    y = _fused_ffn_2d(x.reshape(-1, d), q_in, s_in, b_in, q_out, s_out,
                      b_out, out_dtype, interpret)
    return y.reshape(*lead, q_out.shape[1])


def int8_linear_ref(x, q, s, *, out_dtype=jnp.bfloat16, mode="wonly"):
    """XLA oracle used by tests and non-TPU fallbacks (same math)."""
    s2 = s.reshape(1, -1).astype(jnp.float32)
    if mode == "w8a8":
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12)
        sx = sx / 127.0
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, q, (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc.astype(jnp.float32) * sx * s2).astype(out_dtype)
    acc = jax.lax.dot_general(
        x.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (acc * s2).astype(out_dtype)


# ------------------------------------------------------------- flax module
class QDense(nn.Module):
    """Drop-in ``nn.Dense``: same param names ("kernel"/"bias"), shapes and
    initializers, so checkpoints and init trees are unchanged. If the
    kernel leaf in the params tree has been replaced by the
    ``{int8_q, int8_s}`` pair (utils/quantize.py), the matmul streams int8
    through :func:`int8_linear`; otherwise it is exactly ``nn.Dense``.

    The quantized swap happens *in the tree* (generate.py decode loop), so
    training / prefill / non-quantized paths pay zero overhead.
    """

    features: int
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    # "" -> read QLINEAR_MODE at call time (benches A/B the kernel mode
    # without re-plumbing; read lazily so setting the env var after import
    # still takes effect)
    quant_mode: str = ""

    @nn.compact
    def __call__(self, x: Array, *, return_params: bool = False):
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features),
            self.param_dtype,
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,),
                       self.param_dtype)
            if self.use_bias else None
        )
        if return_params:
            # fusion hook (SwiGLU fused FFN): hand the (possibly
            # tree-swapped int8) leaves to the caller; x is shape-only
            return kernel, bias
        if is_quantized_leaf(kernel):
            # dtype=None falls back to nn.Dense's promote_dtype result
            # (result_type of activation and param dtypes), so a module
            # that omits dtype keeps its output dtype when its kernel is
            # tree-swapped to int8
            out_dtype = self.dtype or jnp.result_type(x.dtype,
                                                      self.param_dtype)
            mode = self.quant_mode or os.environ.get("QLINEAR_MODE", "wonly")
            # XLA's fused dequant-dot WINS on v5e for decode GEMVs
            # (probe_qlinear: 297 us vs 348 pallas / 323 native-int8-dot
            # for a 25-layer b1 chain — kernel-launch + M=1 pipeline
            # overheads outweigh explicit streaming). The Pallas kernel
            # stays behind QLINEAR_MODE=pallas-wonly / pallas-w8a8.
            base_mode = mode.split("-", 1)[1] if mode.startswith("pallas") \
                else mode
            if mode.startswith("pallas") and jax.default_backend() != "cpu":
                y = int8_linear(x, kernel[QKEY], kernel[SKEY],
                                out_dtype=out_dtype, mode=base_mode)
            else:
                # CPU / non-pallas: the XLA oracle with the SAME numerics
                # class (w8a8 keeps activation quantization) so CPU parity
                # runs reflect what the TPU kernel actually computes.
                y = int8_linear_ref(x, kernel[QKEY], kernel[SKEY],
                                    out_dtype=out_dtype, mode=base_mode)
            if bias is not None:
                y = y + jnp.asarray(bias, out_dtype)
            return y
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        y = jax.lax.dot_general(
            x, kernel, (((x.ndim - 1,), (0,)), ((), ())),
        )
        if bias is not None:
            y = y + bias
        return y
