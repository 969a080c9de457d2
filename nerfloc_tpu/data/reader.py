"""Frame IO: RGB images + depth maps.

Rebuild of the reference reader (reference: nerf_loc/datasets/video/
reader.py:260-308): 16-bit depth PNGs are millimetres (65535 = invalid),
COLMAP `.geometric.bin` arrays are metres, depth is nearest-resized to the
RGB resolution, and sub-millimetre values are zeroed.
"""
from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False
    from PIL import Image


def read_colmap_array(path: str) -> np.ndarray:
    """COLMAP dense array format (width&height&channels& header + f32 data),
    equivalent of the reference's read_array (reader.py:173-189)."""
    with open(path, "rb") as f:
        header = b""
        count = 0
        while count < 3:
            c = f.read(1)
            header += c
            if c == b"&":
                count += 1
        w, h, c = (int(x) for x in header[:-1].decode("ascii").split("&"))
        data = np.fromfile(f, dtype=np.float32, count=w * h * c)
    return data.reshape(h, w, c).squeeze()


def load_image(path: str) -> np.ndarray:
    """RGB uint8 [H, W, 3]."""
    if _HAS_CV2:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return np.asarray(Image.open(path).convert("RGB"))


def read_pfm(path: str) -> np.ndarray:
    """Portable float map (casMVSNet depth output; reference
    reader.py:191-230)."""
    with open(path, "rb") as f:
        header = f.readline().strip()
        if header not in (b"PF", b"Pf"):
            raise ValueError(f"{path}: not a PFM file")
        channels = 3 if header == b"PF" else 1
        dims = f.readline().split()
        w, h = int(dims[0]), int(dims[1])
        scale = float(f.readline().strip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, dtype=endian + "f4", count=w * h * channels)
    img = data.reshape(h, w, channels) if channels > 1 else data.reshape(h, w)
    return np.flipud(img).copy()  # PFM rows are bottom-up


def load_depth(path: str) -> np.ndarray:
    """Depth in metres, float32; invalid pixels = 0."""
    if path.endswith(".geometric.bin"):
        depth = read_colmap_array(path).astype(np.float32)
    elif path.endswith(".pfm"):
        depth = read_pfm(path).astype(np.float32)
        # casMVSNet layout keeps a photometric-consistency mask next to the
        # depth (reference colmap_dataset.py:150-156)
        mask_path = path.replace("depth_est", "mask").replace(
            ".pfm", "_final.png")
        if os.path.exists(mask_path) and _HAS_CV2:
            m = cv2.imread(mask_path, cv2.IMREAD_ANYDEPTH)
            if m is not None and m.shape == depth.shape:
                depth = depth * (m > 0).astype(np.float32)
    elif path.endswith(".npy"):
        depth = np.load(path).astype(np.float32)
    else:
        if _HAS_CV2:
            raw = cv2.imread(path, cv2.IMREAD_ANYDEPTH)
            if raw is None:
                raise FileNotFoundError(path)
        else:
            raw = np.asarray(Image.open(path))
        raw = raw.astype(np.float32)
        raw[raw == 65535] = 0  # 7Scenes invalid marker
        depth = raw / 1000.0  # mm -> m
    depth[depth < 1e-5] = 0.0
    return depth


def resize_nearest_np(x: np.ndarray, H: int, W: int) -> np.ndarray:
    if _HAS_CV2:
        return cv2.resize(x, (W, H), interpolation=cv2.INTER_NEAREST)
    iy = (np.arange(H) * x.shape[0] / H).astype(np.int64)
    ix = (np.arange(W) * x.shape[1] / W).astype(np.int64)
    return x[iy][:, ix]


class LMDBReader:
    """Read-only LMDB image store (reference reader.py:11-170 packs scenes
    into LMDB for cluster filesystems). Gated: the `lmdb` package is not in
    the base image, so construction raises a clear error when missing."""

    def __init__(self, path: str):
        try:
            import lmdb
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "LMDB-packed scenes need the 'lmdb' package (not in this "
                "image); repack with plain files or install lmdb") from e
        self._env = lmdb.open(path, readonly=True, lock=False,
                              readahead=False)

    def get(self, key: str) -> bytes:
        with self._env.begin(write=False) as txn:
            data = txn.get(key.encode("utf-8"))
        if data is None:
            raise KeyError(key)
        return data

    def get_image(self, key: str) -> np.ndarray:
        import cv2

        buf = np.frombuffer(self.get(key), np.uint8)
        return cv2.cvtColor(cv2.imdecode(buf, cv2.IMREAD_COLOR),
                            cv2.COLOR_BGR2RGB)


class LMDBWriter:
    """LMDB image-store writer (reference reader.py:96-170: delete-and-
    recreate the database, buffered transactions committed every
    `commit_every` puts, string/ndarray payloads). Same gating as
    LMDBReader — the `lmdb` package is not in the base image.

    Unlike the reference's 1 TB fixed map_size, the map grows on demand
    (MapFullError -> double map_size and retry) so packs work on small
    filesystems too.
    """

    def __init__(self, path: str, map_size: int = 1 << 30,
                 commit_every: int = 10000):
        try:
            import lmdb
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "packing scenes to LMDB needs the 'lmdb' package (not in "
                "this image)") from e
        import shutil

        if os.path.exists(path):
            shutil.rmtree(path)
        os.makedirs(path)
        self._lmdb = lmdb
        self._env = lmdb.Environment(path, map_size=map_size)
        self._txn = self._env.begin(write=True)
        self._count = 0
        self._commit_every = commit_every

    def _put(self, key: str, value: bytes) -> None:
        for _ in range(32):  # grow map until the put fits
            try:
                self._txn.put(key.encode("utf-8"), value)
                break
            except self._lmdb.MapFullError:
                self._txn.abort()
                self._env.set_mapsize(self._env.info()["map_size"] * 2)
                self._txn = self._env.begin(write=True)
        self._count += 1
        if self._count % self._commit_every == 0:
            self._txn.commit()
            self._txn = self._env.begin(write=True)

    def write_str(self, key: str, value: bytes) -> None:
        self._put(key, value)

    def write_array(self, key: str, array: np.ndarray) -> None:
        self._put(key, np.ascontiguousarray(array).tobytes())

    def write_image(self, key: str, rgb: np.ndarray, ext: str = ".jpg") -> None:
        """Encode an RGB uint8 image (LMDBReader.get_image decodes)."""
        import cv2

        ok, buf = cv2.imencode(ext, cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        if not ok:
            raise ValueError(f"cv2.imencode failed for {key}")
        self._put(key, buf.tobytes())

    def close(self) -> None:
        if self._env is not None:
            self._txn.commit()
            self._env.close()
            self._env = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def load_frame(base_dir: str, meta: Dict) -> Tuple[np.ndarray, np.ndarray,
                                                   np.ndarray, np.ndarray]:
    """(rgb uint8, depth m float32 at rgb res, Tcw [3,4], K [3,3]).

    meta keys follow the preprocessors' info pkl contract: file_name,
    depth_file_name, extrinsic_Tcw, camera_intrinsic (reference
    reader.py:273-308).
    """
    img = load_image(os.path.join(base_dir, meta["file_name"]))
    H, W = img.shape[:2]
    dpath = os.path.join(base_dir, meta["depth_file_name"])
    if os.path.exists(dpath):
        depth = load_depth(dpath)
        if depth.shape[:2] != (H, W):
            depth = resize_nearest_np(depth, H, W)
    else:
        depth = np.zeros((H, W), dtype=np.float32)
    Tcw = np.asarray(meta["extrinsic_Tcw"], dtype=np.float64)[:3]
    K = intrinsic_to_K(meta["camera_intrinsic"])
    return img, depth.astype(np.float32), Tcw, K


def intrinsic_to_K(intr) -> np.ndarray:
    """Accept both encodings: a 3x3 matrix, or the reference preprocessors'
    [fx, fy, cx, cy, ...] parameter vector (reference reader.py:238-247)."""
    intr = np.asarray(intr, dtype=np.float64)
    if intr.ndim == 2:
        return intr
    K = np.eye(3)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = intr[0], intr[1], intr[2], intr[3]
    return K
