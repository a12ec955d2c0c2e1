"""Minimal ``rasterio`` stand-in backed by npy-format band files.

Lets the UNMODIFIED reference ``Patch.py`` (and s1s2's real-rasterio branch
in ``s1s2/data/patchify.py``) run on this box, where rasterio is not
installed: the reference only uses ``rasterio.open(path)`` as a context
manager with ``.read(1)``, ``.transform.to_gdal()`` and
``.crs.to_string()`` (`/root/reference/Patch.py:12-24`), so a ~40-line
shim covers the whole API surface. Band files live at their reference
names (``B2.img`` etc.) but contain npy bytes (``np.save`` to an open
file handle keeps the exact path).

Usage (before anything imports rasterio):
    import rasterio_shim; rasterio_shim.install()
"""

import sys
import types

import numpy as np

# deterministic fake geo-referencing, shared by both sides of the diff
GDAL_TRANSFORM = (500000.0, 10.0, 0.0, 4000000.0, 0.0, -10.0)
CRS_STRING = "EPSG:32633"


class _Transform:
    def to_gdal(self):
        return GDAL_TRANSFORM


class _CRS:
    def to_string(self):
        return CRS_STRING

    def __bool__(self):
        return True


class _Dataset:
    def __init__(self, path):
        self._path = path
        self.transform = _Transform()
        self.crs = _CRS()

    def read(self, index):
        if index != 1:
            raise ValueError("shim rasters are single-band")
        return np.load(self._path)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def install(force: bool = False):
    if "rasterio" in sys.modules:  # idempotent; never shadow the real one
        return sys.modules["rasterio"]
    if not force:
        # a REAL rasterio installation (installed but not yet imported)
        # must also win: shimming it would read .img files as npy (ADVICE r4)
        import importlib.util

        if importlib.util.find_spec("rasterio") is not None:
            raise RuntimeError(
                "a real rasterio installation exists; refusing to shadow "
                "it with the npy shim (pass force=True to override)")
    mod = types.ModuleType("rasterio")
    mod.open = _Dataset
    mod.__shim__ = True
    sys.modules["rasterio"] = mod
    return mod
