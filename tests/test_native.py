"""Native (C++) component tests: LZF codec, kd-tree oracle, and the
cross-check of the TPU NN path against the kd-tree."""

import numpy as np
import pytest

from rspc_tpu.io import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native library unavailable (no toolchain)")


def test_native_lzf_roundtrip(lib_available):
    rng = np.random.default_rng(0)
    blobs = [
        b"aaaaaaaaaabbbbbbbbbb" * 500,
        rng.integers(0, 256, 10000, dtype=np.uint8).tobytes(),
        (b"0123456789" * 1000)[:7777],
        rng.integers(0, 4, 100000, dtype=np.uint8).tobytes(),  # compressible
    ]
    for blob in blobs:
        comp = native.lzf_compress(blob)
        assert comp is not None
        out = native.lzf_decompress(comp, len(blob))
        assert out == blob


def test_native_lzf_interop_with_python(lib_available):
    """Native-compressed data must decompress with the Python fallback and
    vice versa (same on-disk format)."""
    from rspc_tpu.io import pcd as pcd_mod

    rng = np.random.default_rng(1)
    blob = rng.integers(0, 16, 5000, dtype=np.uint8).tobytes()
    comp_native = native.lzf_compress(blob)

    # Force the python decompressor by bypassing the native shortcut:
    i, o, n = 0, 0, len(comp_native)
    out = bytearray(len(blob))
    data = comp_native
    while i < n:
        ctrl = data[i]
        i += 1
        if ctrl < 32:
            cnt = ctrl + 1
            out[o : o + cnt] = data[i : i + cnt]
            i += cnt
            o += cnt
        else:
            length = ctrl >> 5
            if length == 7:
                length += data[i]
                i += 1
            ref = o - ((ctrl & 0x1F) << 8) - data[i] - 1
            i += 1
            for _ in range(length + 2):
                out[o] = out[ref]
                o += 1
                ref += 1
    assert bytes(out) == blob


def test_kdtree_matches_bruteforce(lib_available):
    rng = np.random.default_rng(2)
    pts = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    queries = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    tree = native.KDTree(pts)
    d2, idx = tree.query(queries)
    full = ((queries[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(idx, full.argmin(1))
    np.testing.assert_allclose(d2, full.min(1), rtol=1e-5)


def test_kdtree_validates_tpu_nn(lib_available):
    """The kd-tree oracle agrees with the tiled XLA NN op."""
    import jax.numpy as jnp

    from rspc_tpu.ops.nn import nearest_neighbors

    rng = np.random.default_rng(3)
    tgt = rng.uniform(-2, 2, (800, 3)).astype(np.float32)
    src = rng.uniform(-2, 2, (200, 3)).astype(np.float32)
    tree = native.KDTree(tgt)
    d2_o, idx_o = tree.query(src)
    d2, idx = nearest_neighbors(
        jnp.asarray(src), jnp.ones(200, bool), jnp.asarray(tgt),
        jnp.ones(800, bool), chunk=256,
    )
    np.testing.assert_array_equal(np.asarray(idx), idx_o)
    np.testing.assert_allclose(np.asarray(d2), d2_o, rtol=1e-4, atol=1e-7)


def test_native_threaded_dataset_loader_matches_python(tmp_path):
    """native/loader.cpp must reproduce the Python reader on all three
    DATA modes, organized and unorganized, including invalid points."""
    import numpy as np

    from rspc_tpu.cloud import Cloud, OrganizedCloud
    from rspc_tpu.io import native
    from rspc_tpu.io.dataset import load_dataset_clouds, dataset_path
    from rspc_tpu.io.pcd import load_pcd, save_pcd

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(0)
    h, w = 12, 16
    modes = ["ascii", "binary", "binary_compressed"]
    ddir = tmp_path / "dataset"
    ddir.mkdir()
    for i, mode in enumerate(modes):
        xyz = rng.uniform(-2, 2, (h, w, 3)).astype(np.float32)
        rgb = rng.integers(0, 255, (h, w, 3)).astype(np.float32)
        xyz[0, 0] = np.nan  # invalid point
        xyz[3, 3, 2] = 0.0  # z == 0 -> invalid
        oc = OrganizedCloud.from_numpy(xyz, rgb)
        save_pcd(str(ddir / f"mix-{i}.pcd"), oc, mode=mode)

    clouds = load_dataset_clouds("mix", 3, str(ddir))
    for i in range(3):
        ref = load_pcd(dataset_path("mix", i, str(ddir)))
        got = clouds[i]
        assert isinstance(got, OrganizedCloud) and got.height == h
        np.testing.assert_array_equal(
            np.asarray(got.valid), np.asarray(ref.valid)
        )
        np.testing.assert_allclose(
            np.asarray(got.xyz), np.asarray(ref.xyz), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got.rgb), np.asarray(ref.rgb), atol=0.5
        )


def test_native_loader_falls_back_on_foreign_layout(tmp_path):
    """A file the fast path cannot parse (the reference's own sample with
    a different field layout) must come through the Python reader."""
    import shutil

    import numpy as np

    from rspc_tpu.io.dataset import load_dataset_clouds
    from rspc_tpu.io.pcd import load_pcd, save_pcd
    from rspc_tpu.capture.synthetic import SyntheticSequence  # noqa: F401

    ddir = tmp_path / "dataset"
    ddir.mkdir()
    src = "/root/reference/examples/visualizer/example.pcd"
    shutil.copy(src, ddir / "ref-0.pcd")
    clouds = load_dataset_clouds("ref", 1, str(ddir))
    ref = load_pcd(src)
    np.testing.assert_allclose(
        np.asarray(clouds[0].xyz), np.asarray(ref.xyz), atol=1e-6
    )
