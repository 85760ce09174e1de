"""Ballistic dose backprojection: per-angle interpolation matmuls.

Consumes the per-angle 2D transport fields (ops/transport2d.py) and the
z-resampled pattern stack Pz (A, Zf, U):

    forward:  dose(Zf, YX)   = sum_a  Pz_a @ B_a
    adjoint:  Pz_bar(A,Zf,U) = dL @ B_a^T        (exact transpose)

where B_a(U, YX) is the sparse-2 linear-interpolation matrix defined by
(W_a, u_map_a): B[i, j] = W_j * max(0, 1 - |u_j - i|). Two
implementations with identical math:

  * `xla`   — angle-scan with take-based gathers; runs anywhere,
              reference for tests;
  * `pallas` — TPU kernel: the B tile is built on the fly in VMEM from
              the field tile (VPU iota compare) and contracted on the
              MXU; the dose/pattern-grad tile stays resident across the
              innermost grid dimension. No scatters anywhere — this
              replaces the reference's per-voxel atomic scatter_reduce
              (film.py:41) with dense matmuls.

The forward/adjoint pair is registered as a custom_vjp so the dose is
differentiable w.r.t. the pattern stack; everything upstream (sparse
active_data -> dense patterns -> Sz resample) is plain differentiable
jnp, giving pattern gradients end to end.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return -(-x // m) * m


# --------------------------------------------------------------------------
# XLA implementation (reference / CPU)


def _fwd_xla(Pz, W, Umap):
    A, Zf, U = Pz.shape
    _, Y, X = W.shape
    Wf = W.reshape(A, Y * X)
    Uf = Umap.reshape(A, Y * X)
    i0 = jnp.floor(Uf).astype(jnp.int32)
    f = Uf - i0
    w0 = Wf * (1.0 - f) * ((i0 >= 0) & (i0 < U))
    w1 = Wf * f * ((i0 + 1 >= 0) & (i0 + 1 < U))
    i0c = jnp.clip(i0, 0, U - 1)
    i1c = jnp.clip(i0 + 1, 0, U - 1)

    def body(dose, inp):
        Pa, i0a, i1a, w0a, w1a = inp
        g = jnp.take(Pa, i0a, axis=1) * w0a + \
            jnp.take(Pa, i1a, axis=1) * w1a
        return dose + g, None

    dose0 = jnp.zeros((Zf, Y * X), jnp.float32)
    dose, _ = jax.lax.scan(body, dose0, (Pz, i0c, i1c, w0, w1))
    return dose


def _bwd_xla(dL, W, Umap, U):
    A, Y, X = W.shape
    Zf = dL.shape[0]
    Wf = W.reshape(A, Y * X)
    Uf = Umap.reshape(A, Y * X)
    i0 = jnp.floor(Uf).astype(jnp.int32)
    f = Uf - i0
    w0 = Wf * (1.0 - f) * ((i0 >= 0) & (i0 < U))
    w1 = Wf * f * ((i0 + 1 >= 0) & (i0 + 1 < U))
    i0c = jnp.clip(i0, 0, U - 1)
    i1c = jnp.clip(i0 + 1, 0, U - 1)

    def body(_, inp):
        i0a, i1a, w0a, w1a = inp
        Pa = jnp.zeros((Zf, U), jnp.float32)
        Pa = Pa.at[:, i0a].add(dL * w0a)
        Pa = Pa.at[:, i1a].add(dL * w1a)
        return None, Pa

    _, Pbar = jax.lax.scan(body, None, (i0c, i1c, w0, w1))
    return Pbar


# --------------------------------------------------------------------------
# Pallas TPU kernels

TILE = 2048          # YX columns per dose tile (forward)
TILE_BWD = 2048       # YX columns per backward tile (bounds VMEM: the
                     # on-the-fly B^T tile is (TILE_BWD, Upad))
ABLK = 1             # angles per backward block


def _make_fwd_kernel(bf16):
    def _fwd_kernel(P_ref, F_ref, out_ref):
        a = pl.program_id(1)

        @pl.when(a == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        Upad, T = P_ref.shape[2], F_ref.shape[2]
        acc = out_ref[:]
        for k in range(P_ref.shape[0]):
            W = F_ref[k, 0, :].reshape(1, T)
            u = F_ref[k, 1, :].reshape(1, T)
            rows = jax.lax.broadcasted_iota(jnp.int32, (Upad, T), 0)
            rows = rows.astype(jnp.float32)
            B = W * jnp.maximum(0.0, 1.0 - jnp.abs(u - rows))
            P = P_ref[k]
            if bf16:
                # single-pass bf16 operands, f32 accumulation: the
                # B tile's own bf16 rounding (~2^-9 on interpolation
                # weights) dominates the error either way, so paying a
                # second (split-precision) pass buys nothing
                acc = acc + jnp.dot(P.astype(jnp.bfloat16),
                                    B.astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
            else:
                acc = acc + jnp.dot(P, B,
                                    preferred_element_type=jnp.float32)
        out_ref[:] = acc

    return _fwd_kernel


def _make_bwd_kernel(bf16):
    def _bwd_kernel(dL_ref, F_ref, out_ref):
        """out (Zp, Upad) += dL(Zp, T) @ B_a^T(T, Upad), one angle per
        outer grid step, accumulating over the inner YX-tile dimension.
        The on-the-fly-built interpolation tile sits on the RHS of the
        matmul exactly like the forward kernel -- with it on the LHS,
        Mosaic spends tens of minutes in relayout during compilation."""
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        T = F_ref.shape[2]
        Upad = out_ref.shape[1]
        W = F_ref[0, 0, :].reshape(T, 1)
        u = F_ref[0, 1, :].reshape(T, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (T, Upad), 1)
        Bt = W * jnp.maximum(0.0,
                             1.0 - jnp.abs(u - cols.astype(jnp.float32)))
        dL = dL_ref[:]
        if bf16:
            out_ref[:] += jnp.dot(dL.astype(jnp.bfloat16),
                                  Bt.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)
        else:
            out_ref[:] += jnp.dot(dL, Bt,
                                  preferred_element_type=jnp.float32)

    return _bwd_kernel


def _pack_fields(W, Umap, U, tile):
    """(A, Y, X) pair -> (A, 2, YXpad) with empty cells pushed outside
    the interpolation support so they contribute nothing."""
    A, Y, X = W.shape
    YX = Y * X
    YXp = _round_up(YX, tile)
    Wf = W.reshape(A, YX)
    Uf = jnp.where(Wf > 0, Umap.reshape(A, YX), jnp.float32(-2.0))
    F = jnp.stack([Wf, Uf], axis=1)
    if YXp != YX:
        F = jnp.pad(F, ((0, 0), (0, 0), (0, YXp - YX)),
                    constant_values=0.0)
        # padded cells: u=-2 keeps B columns identically zero
        F = F.at[:, 1, YX:].set(-2.0)
    return F


def _fwd_pallas(Pz, W, Umap, bf16=False):
    A, Zf, U = Pz.shape
    _, Y, X = W.shape
    YX = Y * X
    Upad = _round_up(U, 128)
    Zp = _round_up(Zf, 8)
    Pp = jnp.pad(Pz, ((0, 0), (0, Zp - Zf), (0, Upad - U)))
    F = _pack_fields(W, Umap, U, TILE)
    YXp = F.shape[2]
    n_tiles = YXp // TILE

    out = pl.pallas_call(
        _make_fwd_kernel(bf16),
        grid=(n_tiles, A),
        in_specs=[
            pl.BlockSpec((1, Zp, Upad), lambda t, a: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, TILE), lambda t, a: (a, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Zp, TILE), lambda t, a: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Zp, YXp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * A * Zp * Upad * TILE,
            bytes_accessed=n_tiles * A * (Zp * Upad * 4 + 2 * TILE * 4)
            + Zp * YXp * 4,
            transcendentals=0),
    )(Pp, F)
    return out[:Zf, :YX]


def _bwd_pallas(dL, W, Umap, U, bf16=False):
    A, Y, X = W.shape
    Zf = dL.shape[0]
    YX = Y * X
    Upad = _round_up(U, 128)
    Zp = _round_up(Zf, 8)
    F = _pack_fields(W, Umap, U, TILE_BWD)
    YXp = F.shape[2]
    n_tiles = YXp // TILE_BWD
    dLp = jnp.pad(dL.reshape(Zf, YX), ((0, Zp - Zf), (0, YXp - YX)))

    out = pl.pallas_call(
        _make_bwd_kernel(bf16),
        grid=(A, n_tiles),
        in_specs=[
            pl.BlockSpec((Zp, TILE_BWD), lambda a, t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, TILE_BWD), lambda a, t: (a, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Zp, Upad), lambda a, t: (a, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A * Zp, Upad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * A * Zp * Upad * TILE_BWD,
            bytes_accessed=A * n_tiles *
            (Zp * TILE_BWD * 4 + 2 * TILE_BWD * 4) + A * Zp * Upad * 4,
            transcendentals=0),
    )(dLp, F)
    return out.reshape(A, Zp, Upad)[:, :Zf, :U]


# --------------------------------------------------------------------------
# differentiable entry


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def backproject(impl, Pz, W, Umap):
    """dose(Zf, Y*X) = sum_a Pz_a @ B_a(W_a, u_map_a).

    impl: 'xla' | 'pallas' | 'pallas_bf16' (split-precision bf16
    operands on the MXU, f32 accumulation)."""
    if impl == "pallas":
        return _fwd_pallas(Pz, W, Umap)
    if impl == "pallas_bf16":
        return _fwd_pallas(Pz, W, Umap, bf16=True)
    return _fwd_xla(Pz, W, Umap)


def _bp_fwd(impl, Pz, W, Umap):
    return backproject(impl, Pz, W, Umap), (W, Umap, Pz.shape[2])


def _bp_bwd(impl, res, dL):
    W, Umap, U = res
    if impl == "pallas":
        Pbar = _bwd_pallas(dL, W, Umap, U)
    elif impl == "pallas_bf16":
        Pbar = _bwd_pallas(dL, W, Umap, U, bf16=True)
    else:
        Pbar = _bwd_xla(dL, W, Umap, U)
    return (Pbar, jnp.zeros_like(W), jnp.zeros_like(Umap))


backproject.defvjp(_bp_fwd, _bp_bwd)


def get_impls(impl):
    """(fwd(Pz, W, Umap), bwd(dL, W, Umap, U)) pair for an impl name."""
    if impl == "pallas":
        return _fwd_pallas, _bwd_pallas
    if impl == "pallas_bf16":
        return (partial(_fwd_pallas, bf16=True),
                lambda dL, W, Um, U: _bwd_pallas(dL, W, Um, U, bf16=True))
    return _fwd_xla, _bwd_xla
