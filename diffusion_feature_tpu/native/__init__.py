"""Native (C++) runtime components.

The reference ships no native code of its own (SURVEY §2: pure Python over
torch wheels); this package holds the TPU build's native runtime pieces —
currently the async feature-dump writer that overlaps disk IO with device
compute.  Libraries compile on demand with g++ and cache under
~/.cache/diffusion_feature_tpu; every consumer has a pure-Python fallback,
so the framework works without a toolchain.
"""

from .build import load_library
from .dump_writer import AsyncDumpWriter, native_available
from .npy_reader import AsyncNpyReader, native_reader_available
