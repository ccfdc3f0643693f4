from .table import LakeTable, PartitionField, CommitConflict  # noqa: F401
