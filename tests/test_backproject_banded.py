"""Banded backprojection kernels == dense reference implementation.

The banded kernels (ops/backproject.py _fwd_banded/_bwd_banded) move
only a BANDW-row slice of each angle's pattern block, selected by a
scalar-prefetched band-start table. On synthetic fields whose u-span
obeys the block bound they must reproduce the take-based XLA reference
exactly (f32 path) on any backend (interpret mode on CPU).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from drtvam_tpu.ops import backproject as bp


def _fields(seed=0, A=5, Y=64, X=128, U=140, Zf=24):
    """Random fields with the u-map geometry the banded path assumes:
    u is an affine projection of (x, y) per angle, like the real
    transport, so each 32x64 block spans a narrow u-band."""
    rng = np.random.default_rng(seed)
    W = rng.uniform(0.0, 1.0, (A, Y, X)).astype(np.float32)
    W[W < 0.3] = 0.0  # holes: exercise the empty-cell sentinel
    ys, xs = np.meshgrid(np.arange(Y), np.arange(X), indexing="ij")
    scale = (U - 8) / np.hypot(Y, X)
    Umap = np.zeros((A, Y, X), np.float32)
    for a in range(A):
        th = 2 * np.pi * a / A
        proj = np.cos(th) * xs + np.sin(th) * ys
        Umap[a] = (proj - proj.min()) * scale + 3.0 + \
            rng.uniform(-0.4, 0.4, (Y, X))
    Pz = rng.uniform(0.0, 1.0, (A, Zf, U)).astype(np.float32)
    dL = rng.uniform(0.0, 1.0, (Zf, Y * X)).astype(np.float32)
    return (jnp.asarray(Pz), jnp.asarray(W), jnp.asarray(Umap),
            jnp.asarray(dL), U)


def test_span_ok_on_projected_fields():
    Pz, W, Umap, dL, U = _fields()
    assert bp.banded_eligible(W.shape, U)
    assert bool(bp.band_span_ok(W, Umap, U))


def test_block_permute_roundtrip():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(7, 64, 128)).astype(np.float32))
    per = bp.block_permute(x, 64, 128)
    back = bp.block_unpermute(per.reshape(7, -1), 64, 128)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("bf16", [False, True])
def test_fwd_banded_matches_xla(monkeypatch, bf16):
    orig = bp.pl.pallas_call
    monkeypatch.setattr(bp.pl, "pallas_call",
                        lambda *a, **k: orig(*a, interpret=True, **k))
    Pz, W, Umap, dL, U = _fields()
    ref = np.asarray(bp._fwd_xla(Pz, W, Umap))
    out = np.asarray(bp._fwd_banded(Pz, W, Umap, bf16=bf16))
    tol = 6e-3 if bf16 else 1e-5
    np.testing.assert_allclose(out, ref, rtol=tol,
                               atol=tol * ref.max())


@pytest.mark.parametrize("bf16", [False, True])
def test_bwd_banded_matches_xla(monkeypatch, bf16):
    orig = bp.pl.pallas_call
    monkeypatch.setattr(bp.pl, "pallas_call",
                        lambda *a, **k: orig(*a, interpret=True, **k))
    Pz, W, Umap, dL, U = _fields(seed=5)
    ref = np.asarray(bp._bwd_xla(dL, W, Umap, U))
    out = np.asarray(bp._bwd_banded(dL, W, Umap, U, bf16=bf16))
    tol = 6e-3 if bf16 else 1e-5
    np.testing.assert_allclose(out, ref, rtol=tol,
                               atol=tol * ref.max())
