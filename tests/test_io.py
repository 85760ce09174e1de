"""EXR codec round-trips + mosaic tiling."""
import numpy as np

from drtvam_tpu.utils.io import write_exr, read_exr, reshape_grid


def test_exr_roundtrip_single_channel(tmp_path):
    img = np.random.default_rng(0).random((17, 23)).astype(np.float32)
    p = str(tmp_path / "x.exr")
    write_exr(p, img)
    back = read_exr(p)
    assert back.shape == (17, 23)
    assert np.array_equal(back, img)


def test_exr_roundtrip_rgb(tmp_path):
    img = np.random.default_rng(1).random((8, 9, 3)).astype(np.float32)
    p = str(tmp_path / "rgb.exr")
    write_exr(p, img)
    back = read_exr(p)
    assert back.shape == (8, 9, 3)
    assert np.array_equal(back, img)


def test_reshape_grid():
    vol = np.arange(5 * 2 * 3, dtype=np.float32).reshape(5, 2, 3)
    mosaic = reshape_grid(vol)
    # 5 slices -> 3x3 grid of 2x3 tiles
    assert mosaic.shape == (6, 9, 1)
    assert np.array_equal(mosaic[0:2, 0:3, 0], vol[0])
    assert np.array_equal(mosaic[0:2, 3:6, 0], vol[1])
    assert np.array_equal(mosaic[2:4, 0:3, 0], vol[3])
    assert mosaic[4:, 3:].max() == 0
