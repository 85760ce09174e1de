"""Projector ray generation: crop windows confine ray origins
(mirrors reference tests/test_projector.py), plus collimated geometry
sanity and sparse pattern round-trips."""
import numpy as np
import jax.numpy as jnp

from drtvam_tpu.core.rng import Sampler
from drtvam_tpu.models.projector import Projector, sample_rays


def make_projector(**kw):
    props = {
        "type": "collimated",
        "n_patterns": 4,
        "resx": 16,
        "resy": 16,
        "pixel_size": 0.5,
        "motion": "circular",
        "distance": 10.0,
    }
    props.update(kw)
    return Projector(props)


def gen_rays(p, spp=1, seed=0, regular=False):
    static = p.static()
    arr = p.arrays()
    n = p.active_size() * spp
    lane = jnp.arange(n, dtype=jnp.uint32)
    sampler = Sampler(seed)
    ctr = sampler.init(n)
    o, d, aidx, _ = sample_rays(static, arr, arr["active_pixels"], lane,
                                spp, sampler, ctr, regular, False,
                                p.motion.clockwise)
    return np.asarray(o), np.asarray(d), np.asarray(aidx)


def test_crop_window_confines_origins():
    # Collimated projector with a crop window: the decoded pixel indices
    # and the world-space ray origins must stay inside the cropped
    # region (reference tests/test_projector.py:7-38).
    p = make_projector(n_patterns=1, cropx=4, cropy=8,
                       crop_offset_x=2, crop_offset_y=4)
    assert p.active_size() == 4 * 8

    pix = np.asarray(p.active_pixels) % (16 * 16)
    px, py = pix % 16, pix // 16
    assert px.min() == 2 and px.max() == 5
    assert py.min() == 4 and py.max() == 11

    # at time=0 the projector sits at (distance, 0, 0) looking at the
    # origin with +z up; camera x maps to world -y, camera y to world +z.
    # cam_x = (0.5 - (px+u)/16) * 8 for px in [2,6) -> (1, 3]
    o, d, _ = gen_rays(p)
    cam_x = -o[:, 1]
    cam_y = o[:, 2]
    assert cam_x.min() >= 1.0 - 1e-5 and cam_x.max() <= 3.0 + 1e-5
    assert cam_y.min() >= -2.0 - 1e-5 and cam_y.max() <= 2.0 + 1e-5


def test_collimated_directions_at_time_zero():
    p = make_projector(n_patterns=1)
    o, d, _ = gen_rays(p, regular=True)
    # time = 0 -> projector at (distance, 0, 0), rays along -x
    assert np.allclose(d, [[-1.0, 0.0, 0.0]] * d.shape[0], atol=1e-6)
    assert np.allclose(o[:, 0], 10.0, atol=1e-6)


def test_pattern_roundtrip():
    pat = np.random.default_rng(0).random((4, 16, 16)).astype(np.float32)
    p = Projector({
        "type": "collimated", "patterns": pat, "pixel_size": 0.5,
        "motion": "circular", "distance": 10.0,
    })
    dense = np.asarray(p.patterns())
    assert np.allclose(dense, pat)

    # filter_nonzero keeps only positive entries
    pat2 = pat.copy()
    pat2[pat2 < 0.5] = 0.0
    p2 = Projector({
        "type": "collimated", "patterns": pat2, "pixel_size": 0.5,
        "filter_nonzero": True, "motion": "circular", "distance": 10.0,
    })
    assert p2.active_size() == np.count_nonzero(pat2)
    assert np.allclose(np.asarray(p2.patterns()), pat2)
