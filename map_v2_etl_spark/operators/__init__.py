from .pivot import pivot_long_to_wide  # noqa: F401
from .extents import column_extents  # noqa: F401
