"""Native host runtime bindings (ctypes over liblpcnet_runtime.so)."""

from .bindings import native_available, runtime  # noqa: F401
