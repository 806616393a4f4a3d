from .lww import lww_latest, drop_tombstones  # noqa: F401
