from . import events  # noqa: F401  (registers streaming queries)
