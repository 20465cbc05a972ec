from .tables import TABLES, load_table, register_views  # noqa: F401
from .text import read_text_lines, write_tsv  # noqa: F401
