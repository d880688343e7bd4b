# Importing these modules registers their queries in plans.registry.
from . import indexing  # noqa: F401
from . import search  # noqa: F401
from . import relational  # noqa: F401
from . import relational_extra  # noqa: F401
from . import asof  # noqa: F401
from . import dedup  # noqa: F401
from . import similarity  # noqa: F401
from . import textstats  # noqa: F401
from . import multimodal  # noqa: F401
from . import cdc  # noqa: F401
from . import heavyhitters  # noqa: F401
from . import eventflow  # noqa: F401
from . import profiling  # noqa: F401
from . import bpe  # noqa: F401
from . import graph  # noqa: F401
from . import classifier  # noqa: F401
from . import curation  # noqa: F401
