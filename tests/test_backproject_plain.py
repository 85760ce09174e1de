"""Plain (non-banded) Pallas backprojection kernels == XLA reference.

The non-banded kernels (ops/backproject.py _fwd_pallas/_bwd_pallas) are
the fallback whenever banded eligibility fails — film not divisible
into 32x64 blocks, or a refraction fan whose per-block u-span exceeds
the band. They build the full (Upad, TILE) interpolation tile in VMEM;
on synthetic fields with arbitrary (non-banded) u-maps they must
reproduce the take-based XLA reference (interpret mode on CPU).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from drtvam_tpu.ops import backproject as bp


def _fields(seed=0, A=4, Y=48, X=80, U=100, Zf=24):
    """Random fields with a deliberately WIDE u-map (scattered u per
    cell, no per-block banding) so the plain kernels' full-height B
    tile is genuinely exercised — these fields would fail
    band_span_ok."""
    rng = np.random.default_rng(seed)
    W = rng.uniform(0.0, 1.0, (A, Y, X)).astype(np.float32)
    W[W < 0.3] = 0.0
    Umap = rng.uniform(-1.5, U + 0.5, (A, Y, X)).astype(np.float32)
    Pz = rng.uniform(0.0, 1.0, (A, Zf, U)).astype(np.float32)
    dL = rng.uniform(0.0, 1.0, (Zf, Y * X)).astype(np.float32)
    return (jnp.asarray(Pz), jnp.asarray(W), jnp.asarray(Umap),
            jnp.asarray(dL), U)


@pytest.mark.parametrize("bf16", [False, True])
def test_fwd_pallas_matches_xla(monkeypatch, bf16):
    orig = bp.pl.pallas_call
    monkeypatch.setattr(bp.pl, "pallas_call",
                        lambda *a, **k: orig(*a, interpret=True, **k))
    Pz, W, Umap, dL, U = _fields()
    ref = np.asarray(bp._fwd_xla(Pz, W, Umap))
    out = np.asarray(bp._fwd_pallas(Pz, W, Umap, bf16=bf16))
    tol = 6e-3 if bf16 else 1e-5
    np.testing.assert_allclose(out, ref, rtol=tol,
                               atol=tol * ref.max())


@pytest.mark.parametrize("bf16", [False, True])
def test_bwd_pallas_matches_xla(monkeypatch, bf16):
    orig = bp.pl.pallas_call
    monkeypatch.setattr(bp.pl, "pallas_call",
                        lambda *a, **k: orig(*a, interpret=True, **k))
    Pz, W, Umap, dL, U = _fields(seed=7)
    ref = np.asarray(bp._bwd_xla(dL, W, Umap, U))
    out = np.asarray(bp._bwd_pallas(dL, W, Umap, U, bf16=bf16))
    tol = 6e-3 if bf16 else 1e-5
    np.testing.assert_allclose(out, ref, rtol=tol,
                               atol=tol * ref.max())
