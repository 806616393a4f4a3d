from .manifest import Manifest  # noqa: F401
from .engine import CdcLake  # noqa: F401
