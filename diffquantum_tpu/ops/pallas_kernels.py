"""Pallas TPU kernels for the propagation hot path.

The hot op of the dense propagator is the truncated-Taylor ``exp(z H) psi``
recurrence (:func:`..ops.expm.cexpm_apply_taylor`): per Taylor term, one
complex matvec/matmul plus a complex scale-accumulate. As plain XLA this is
``order x substeps`` separate fusions, each round-tripping the [B, d] state
through HBM. This kernel fuses the WHOLE recurrence: H is loaded to VMEM
once, the term/accumulator blocks live in VMEM scratch across all
``substeps * order`` iterations, and the three Gauss-product matmuls per
term hit the MXU back-to-back.

Complex arithmetic is the real-pair (CP) form with the 3-multiplication
Gauss trick (re = t1 - t2, im = t3 - t1 - t2) — 25% fewer MXU FLOPs than
the naive 4-matmul complex product.

Applicability: d <= 1024 (H must fit VMEM: 2 * d^2 * 4B = 8 MiB at d=1024),
f32 pairs. The public wrapper pads B to sublane and d to lane multiples and
falls back to the plain jnp implementation off-TPU or out of range.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cpx import CP

_LANE = 128
_SUBLANE = 8
_MAX_D = 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _taylor_apply_kernel(order: int, substeps: int, zs_ref, h_re_ref,
                         h_im_ref, p_re_ref, p_im_ref, o_re_ref, o_im_ref,
                         t_re, t_im, a_re, a_im):
    """Fused substeps x order Taylor recurrence.

    zs: SMEM (1, 2) = (z_re, z_im) / substeps. scratch: term (t_*) and
    accumulator (a_*) blocks [B, d] in VMEM.
    """
    zr = zs_ref[0, 0]
    zi = zs_ref[0, 1]

    # y[b, i] = sum_j x[b, j] H[i, j]: contract dim 1 of x with dim 1 of H —
    # no materialized transpose (a d x d transpose buffer blew the VMEM
    # budget at d = 1024)
    def mm_t(x, h):
        return jax.lax.dot_general(
            x, h, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    a_re[:] = p_re_ref[:]
    a_im[:] = p_im_ref[:]

    for _ in range(substeps):
        t_re[:] = a_re[:]
        t_im[:] = a_im[:]
        for k in range(1, order + 1):
            # complex matvec (batched): y = term @ H^T via 3 Gauss products
            t1 = mm_t(t_re[:], h_re_ref[:])
            t2 = mm_t(t_im[:], h_im_ref[:])
            t3 = mm_t(t_re[:] + t_im[:], h_re_ref[:] + h_im_ref[:])
            y_re = t1 - t2
            y_im = t3 - t1 - t2
            # term = (z/(r k)) * y  (complex scale), acc += term
            f_re = zr / k
            f_im = zi / k
            t_re[:] = f_re * y_re - f_im * y_im
            t_im[:] = f_re * y_im + f_im * y_re
            a_re[:] = a_re[:] + t_re[:]
            a_im[:] = a_im[:] + t_im[:]

    o_re_ref[:] = a_re[:]
    o_im_ref[:] = a_im[:]


@functools.partial(jax.jit, static_argnames=("order", "substeps",
                                             "interpret"))
def taylor_apply_fused(h: CP, psi: CP, z_re, z_im, order: int, substeps: int,
                       interpret: bool = False) -> CP:
    """Fused Pallas ``exp(z H) @ psi`` for psi [B, d], H [d, d], f32 pairs.

    ``order``/``substeps`` static (choose with
    :func:`..ops.expm.taylor_params`). Pads B, d to hardware tiles.
    """
    b, d = psi.shape
    dp = _round_up(d, _LANE)
    bp = _round_up(b, _SUBLANE)

    def pad2(x, s0, s1):
        return jnp.pad(x, ((0, s0 - x.shape[0]), (0, s1 - x.shape[1])))

    h_re = pad2(h.re.astype(jnp.float32), dp, dp)
    h_im = pad2(h.im.astype(jnp.float32), dp, dp)
    p_re = pad2(psi.re.astype(jnp.float32), bp, dp)
    p_im = pad2(psi.im.astype(jnp.float32), bp, dp)
    zs = jnp.stack([jnp.asarray(z_re, jnp.float32) / substeps,
                    jnp.asarray(z_im, jnp.float32) / substeps]).reshape(1, 2)

    kernel = functools.partial(_taylor_apply_kernel, order, substeps)
    flops_per_mm = 2 * bp * dp * dp
    out_re, out_im = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((bp, dp), jnp.float32),
                   jax.ShapeDtypeStruct((bp, dp), jnp.float32)),
        in_specs=[
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((bp, dp), jnp.float32),
            pltpu.VMEM((bp, dp), jnp.float32),
            pltpu.VMEM((bp, dp), jnp.float32),
            pltpu.VMEM((bp, dp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * flops_per_mm * order * substeps,
            bytes_accessed=(2 * dp * dp + 4 * bp * dp) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(zs, h_re, h_im, p_re, p_im)
    return CP(out_re[:b, :d], out_im[:b, :d])


def pallas_ok(d: int, dtype) -> bool:
    """Whether the fused kernel applies (TPU platform, f32, VMEM budget)."""
    if dtype != jnp.float32:
        return False
    if d > _MAX_D:
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
