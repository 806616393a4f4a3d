from .manifest import CommitConflictError, Manifest  # noqa: F401
from .engine import CdcLake  # noqa: F401
