"""Distance/search kernels with reference-parity semantics.

``from triple_accel_ray.kernels import *`` exposes the same entry-point names
as the reference library's public API (see api.py for citations).
"""

from .api import *  # noqa: F401,F403
from .api import __all__  # noqa: F401
