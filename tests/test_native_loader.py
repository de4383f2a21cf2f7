"""Native C++ prefetching image loader vs the PIL fallback.

The native path must deliver bit-identical grayscale pixels in order
(native/loader.cpp decode_png mirrors PIL convert("L") for gray PNGs)
and actually prefetch (decode happens ahead of consumption)."""

import numpy as np
import pytest

from tpuslam.datasets import native_loader


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    from PIL import Image
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    h, w = 48, 64
    paths, truth = [], []
    for i in range(20):
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        p = d / f"{i:04d}.png"
        Image.fromarray(img, mode="L").save(p)
        paths.append(str(p))
        truth.append(img.astype(np.float32))
    return paths, truth, w, h


def test_fallback_matches_truth(png_dir):
    paths, truth, w, h = png_dir
    with native_loader.PrefetchingLoader(paths, w, h,
                                         force_fallback=True) as ld:
        for i in range(len(paths)):
            np.testing.assert_array_equal(ld[i], truth[i])


def test_native_build_and_bitexact(png_dir):
    paths, truth, w, h = png_dir
    if not native_loader.native_available():
        assert native_loader.build_native(), "native build failed"
    with native_loader.PrefetchingLoader(paths, w, h, workers=3,
                                         depth=4) as ld:
        assert ld._handle, "native path not engaged"
        for i in range(len(paths)):
            np.testing.assert_array_equal(
                ld[i], truth[i],
                err_msg=f"frame {i} differs from PIL decode")


def test_native_size_mismatch_raises(png_dir):
    paths, truth, w, h = png_dir
    if not native_loader.native_available():
        pytest.skip("native lib not built")
    with native_loader.PrefetchingLoader(paths, w + 2, h) as ld:
        with pytest.raises(ValueError):
            ld[0]
