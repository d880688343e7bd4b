from .tables import load_table, register_views
from .corpus import read_corpus_dir

__all__ = ["load_table", "register_views", "read_corpus_dir"]
