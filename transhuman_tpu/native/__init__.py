"""Native (C++) components, loaded via ctypes.

Build all: `python -m transhuman_tpu.native.build` (or `make -C
transhuman_tpu/native`).  Every native backend has an always-available
Python/numpy fallback; the loaders degrade gracefully when the .so is
missing.
"""

from .build import lib_path, load_library  # noqa: F401
