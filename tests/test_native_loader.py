"""Native C++ TUM loader: build, decode parity vs PIL, prefetch ordering."""

import os

import numpy as np
import pytest
from PIL import Image

from orb_slam2_ssd_semantic_tpu.io.tum import TumSequence


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    """Synthesize a tiny on-disk TUM sequence (PNG rgb + 16-bit depth)."""
    root = tmp_path_factory.mktemp("tum_seq")
    os.makedirs(root / "rgb")
    os.makedirs(root / "depth")
    rng = np.random.default_rng(0)
    lines = []
    n = 6
    for i in range(n):
        t = 100.0 + i / 30.0
        rgb = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        depth = rng.integers(500, 20000, (480, 640), dtype=np.uint16)
        Image.fromarray(rgb).save(root / "rgb" / f"{t:.6f}.png")
        Image.fromarray(depth, mode="I;16").save(root / "depth" / f"{t:.6f}.png")
        lines.append(f"{t:.6f} rgb/{t:.6f}.png {t:.6f} depth/{t:.6f}.png")
    (root / "associate.txt").write_text("\n".join(lines) + "\n")
    return str(root)


def test_native_loader_builds_and_matches_pil(tum_dir):
    from orb_slam2_ssd_semantic_tpu.io.native_loader import NativeTumSequence

    ref = TumSequence.open(tum_dir)
    native = NativeTumSequence(tum_dir, as_float=True)
    assert len(native) == len(ref) == 6
    for i, (stamp, rgb, depth) in enumerate(native):
        stamp_ref, rgb_ref, depth_ref = ref[i]
        assert abs(stamp - stamp_ref) < 1e-6
        np.testing.assert_array_equal(rgb, rgb_ref)
        np.testing.assert_allclose(depth, depth_ref, atol=1e-6)
    native.close()


def test_native_loader_uint16_path(tum_dir):
    from orb_slam2_ssd_semantic_tpu.io.native_loader import NativeTumSequence

    native = NativeTumSequence(tum_dir, depth_factor=5000.0)
    _, _, d = next(native)
    assert d.dtype == np.uint16
    # 5000 units/m -> mm conversion: value/5.
    ref = TumSequence.open(tum_dir)
    _, _, dref = ref[0]
    np.testing.assert_allclose(d.astype(np.float32) / 1000.0, dref, atol=2e-3)
    native.close()


def test_native_loader_missing_association(tum_dir):
    from orb_slam2_ssd_semantic_tpu.io.native_loader import NativeTumSequence

    with pytest.raises(FileNotFoundError):
        NativeTumSequence(tum_dir, association="/nonexistent/assoc.txt")
