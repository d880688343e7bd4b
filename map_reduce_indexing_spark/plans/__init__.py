from .registry import register, all_queries, all_oracles, get

__all__ = ["register", "all_queries", "all_oracles", "get"]
