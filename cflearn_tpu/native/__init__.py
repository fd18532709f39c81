"""Native (C++) runtime components.

`rcache` — mmap'd packed record store: the native data-loader core replacing
the reference's LMDB dependency (SURVEY.md §2.9). Compiled on first use with
the system toolchain; a pure-NumPy fallback keeps everything working when no
compiler is available.
"""

from .rcache import RecordCache, has_native, write_records
