"""Weight container I/O: DNNw blobs, sparse/int8 encodings, model mapping."""

from . import blob, lpcnet_arrays  # noqa: F401
from .lpcnet_arrays import load_lpcnet_blob, save_lpcnet_blob  # noqa: F401
