"""LMDB scene store (data/reader.py LMDBReader/LMDBWriter).

The `lmdb` package is not in the base image, so the roundtrip test skips
there; the gating contract (clear ImportError, reference reader.py:11-170
parity surface) is always checked.
"""
import numpy as np
import pytest


def _has_lmdb():
    try:
        import lmdb  # noqa: F401
        return True
    except ImportError:
        return False


def test_gating_error_is_clear(tmp_path):
    from nerfloc_tpu.data.reader import LMDBReader, LMDBWriter

    if _has_lmdb():
        pytest.skip("lmdb installed; gating path not reachable")
    with pytest.raises(ImportError, match="lmdb"):
        LMDBWriter(str(tmp_path / "db"))
    with pytest.raises(ImportError, match="lmdb"):
        LMDBReader(str(tmp_path / "db"))


@pytest.mark.skipif(not _has_lmdb(), reason="lmdb not installed")
def test_write_read_roundtrip(tmp_path):
    from nerfloc_tpu.data.reader import LMDBReader, LMDBWriter

    path = str(tmp_path / "db")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
    arr = rng.standard_normal(100).astype(np.float32)
    with LMDBWriter(path, map_size=1 << 20) as w:
        w.write_str("meta", b"hello")
        w.write_array("arr", arr)
        w.write_image("img", img, ext=".png")  # png: lossless roundtrip

    r = LMDBReader(path)
    assert r.get("meta") == b"hello"
    np.testing.assert_array_equal(
        np.frombuffer(r.get("arr"), np.float32), arr)
    np.testing.assert_array_equal(r.get_image("img"), img)
    with pytest.raises(KeyError):
        r.get("missing")


@pytest.mark.skipif(not _has_lmdb(), reason="lmdb not installed")
def test_map_growth(tmp_path):
    """Writes past the initial map_size must grow the map, not raise
    (reference hardcodes 1 TB, reader.py:136)."""
    from nerfloc_tpu.data.reader import LMDBReader, LMDBWriter

    payload = np.zeros(1 << 16, np.uint8)  # 64 KB
    with LMDBWriter(str(tmp_path / "db"), map_size=1 << 17) as w:
        for i in range(16):  # ~1 MB total >> 128 KB initial map
            w.write_array(f"k{i}", payload)
    r = LMDBReader(str(tmp_path / "db"))
    assert len(r.get("k15")) == len(payload)
