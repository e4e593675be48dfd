"""Native (C++) engines, loaded via ctypes.

Built on demand with g++ (no pip deps): the shared library is compiled next
to the sources on first use and cached.
"""

from pantas_tpu.native.gafcov import (  # noqa: F401
    NativeCoverage,
    augment_gfa_native,
    build_library,
    clip_sites_native,
    kidx_pack,
    kidx_sort,
    native_available,
)
