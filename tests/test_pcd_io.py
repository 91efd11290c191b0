"""PCD I/O tests: round trips + parity with the reference's sample files."""

import jax.numpy as jnp
import numpy as np
import pytest

from rspc_tpu.cloud import Cloud, OrganizedCloud
from rspc_tpu.io.pcd import _lzf_compress, _lzf_decompress, load_pcd, save_pcd

REF_EXAMPLE = "/root/reference/examples/visualizer/example.pcd"
REF_EXAMPLE_TMP = "/root/reference/examples/visualizer/exampleTemp.pcd"


def _random_cloud(rng, n=200):
    xyz = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    xyz[:, 2] += 3.0  # keep z != 0
    rgb = rng.integers(0, 256, (n, 3)).astype(np.float32)
    return Cloud.from_numpy(xyz, rgb)


def test_load_reference_example_ascii_float_rgb():
    # Old-convention ascii file: rgb stored as packed int in the float value.
    c = load_pcd(REF_EXAMPLE)
    assert isinstance(c, Cloud)
    # All points in this sample have z == 0, so they are masked invalid
    # under our convention; data still lives at full capacity.
    assert c.capacity == 213
    np.testing.assert_allclose(
        np.asarray(c.xyz)[0], [0.93773, 0.33763, 0.0], atol=1e-6
    )
    # 4.2108e+06 -> 4210800 = 0x404070 -> r=64 g=64 b=112
    first_rgb = np.asarray(c.rgb)[0]
    assert first_rgb[0] == 64 and first_rgb[1] == 64


def test_load_reference_example_uint_rgb():
    c = load_pcd(REF_EXAMPLE_TMP)
    assert c.capacity == 10
    # 4281353262 = 0xFF30442E -> r=0x30 g=0x44 b=0x2E (alpha dropped)
    rgb = np.asarray(c.rgb)[0]
    assert tuple(rgb.astype(int)) == (0x30, 0x44, 0x2E)


@pytest.mark.parametrize("mode", ["ascii", "binary", "binary_compressed"])
def test_roundtrip_reference_sample_verbatim(tmp_path, mode):
    # The reference sample's points all have z == 0 (invalid under our
    # load convention), but keep_invalid=True must still write the stored
    # rows verbatim — PCL round-trips this file losslessly.
    c = load_pcd(REF_EXAMPLE)
    p = tmp_path / f"ref_{mode}.pcd"
    save_pcd(p, c, mode=mode)
    c2 = load_pcd(p)
    np.testing.assert_allclose(
        np.asarray(c.xyz), np.asarray(c2.xyz), rtol=0, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(c.rgb), np.asarray(c2.rgb))


@pytest.mark.parametrize("mode", ["ascii", "binary", "binary_compressed"])
def test_roundtrip_unorganized(tmp_path, mode):
    rng = np.random.default_rng(0)
    c = _random_cloud(rng)
    p = tmp_path / f"c_{mode}.pcd"
    save_pcd(p, c, mode=mode)
    c2 = load_pcd(p)
    xyz1, rgb1 = c.to_numpy()
    xyz2, rgb2 = c2.to_numpy()
    np.testing.assert_allclose(xyz1, xyz2, rtol=0, atol=1e-6)
    np.testing.assert_array_equal(rgb1, rgb2)


@pytest.mark.parametrize("mode", ["binary", "binary_compressed"])
def test_roundtrip_organized(tmp_path, mode):
    rng = np.random.default_rng(1)
    h, w = 12, 16
    xyz = rng.uniform(-1, 1, (h, w, 3)).astype(np.float32)
    xyz[..., 2] += 2.0
    rgb = rng.integers(0, 256, (h, w, 3)).astype(np.float32)
    oc = OrganizedCloud.from_numpy(xyz, rgb)
    # knock out some validity
    valid = np.asarray(oc.valid).copy()
    valid[3, 4] = False
    oc = OrganizedCloud(oc.xyz, oc.rgb, np.asarray(valid))
    p = tmp_path / f"o_{mode}.pcd"
    save_pcd(p, oc, mode=mode)
    oc2 = load_pcd(p)
    assert isinstance(oc2, OrganizedCloud)
    assert oc2.height == h and oc2.width == w
    v1, v2 = np.asarray(oc.valid), np.asarray(oc2.valid)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_allclose(
        np.asarray(oc.xyz)[v1], np.asarray(oc2.xyz)[v2], atol=1e-6
    )


def test_lzf_roundtrip():
    rng = np.random.default_rng(2)
    # compressible + incompressible mixes
    for blob in [
        b"aaaaaaaaaabbbbbbbbbb" * 50,
        rng.integers(0, 256, 1000, dtype=np.uint8).tobytes(),
        b"",
        b"x",
        (b"0123456789" * 100)[:777],
    ]:
        comp = _lzf_compress(blob)
        assert _lzf_decompress(comp, len(blob)) == blob


def test_binary_matches_pcl_layout(tmp_path):
    """The binary writer must produce PCL-compatible packed-float rgb."""
    c = Cloud.from_numpy(
        np.array([[1.0, 2.0, 3.0]], np.float32),
        np.array([[255, 128, 1]], np.float32),
    )
    p = tmp_path / "one.pcd"
    save_pcd(p, c, mode="binary")
    raw = p.read_bytes()
    body = raw.split(b"DATA binary\n", 1)[1]
    rec = np.frombuffer(body, np.float32)
    assert rec[:3].tolist() == [1.0, 2.0, 3.0]
    packed = rec[3:4].view(np.uint32)[0]
    assert packed == (255 << 16) | (128 << 8) | 1


def test_save_invalid_rows_round_trip_invariant(tmp_path):
    # the round-trip invariance contract (ADVICE r1): an invalid row is
    # written verbatim only if load_pcd would mark it invalid again
    # (z == 0 or non-finite); invalid rows carrying real off-origin
    # geometry (edge-compaction padding, masked non-converged frames)
    # become NaN so they cannot resurrect as valid points
    xyz = np.array(
        [
            [1.0, 2.0, 3.0],   # valid
            [0.5, -0.5, 0.0],  # invalid, z==0 -> verbatim (reloads invalid)
            [0.0, 0.0, 0.0],   # invalid origin padding -> verbatim
            [7.0, 8.0, 1.5],   # invalid with real z!=0 geometry -> NaN
        ],
        np.float32,
    )
    c = Cloud(
        jnp.asarray(xyz),
        jnp.zeros((4, 3), jnp.float32),
        jnp.asarray([True, False, False, False]),
    )
    p = tmp_path / "pad.pcd"
    save_pcd(p, c, mode="ascii")
    raw = p.read_text().splitlines()[-1].split()
    assert raw[0] == "nan"  # resurrectable row -> NaN
    c2 = load_pcd(p)
    got = np.asarray(c2.xyz)
    np.testing.assert_allclose(got[0], xyz[0])
    np.testing.assert_allclose(got[1], xyz[1])  # z==0 row kept verbatim
    np.testing.assert_allclose(got[2], xyz[2])  # origin padding verbatim
    # the validity mask survives the round trip EXACTLY
    np.testing.assert_array_equal(
        np.asarray(c2.valid), [True, False, False, False]
    )
