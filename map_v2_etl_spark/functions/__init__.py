from .scalars import yy_from_year, falsy_fill  # noqa: F401
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
