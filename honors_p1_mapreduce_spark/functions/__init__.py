from .numeric import dsum_col, dsum_expr  # noqa: F401
from .text import TOKEN_SPLIT_RE, tokens_col  # noqa: F401
from .vectors import cosine_sim, dot, l2_norm  # noqa: F401
